"""Unit checks for the accuracy harness's independent scorer
(accuracy_run.py) — the numbers that judge allele recovery must
themselves be trustworthy."""

import os
import random
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from accuracy_run import edit_distance, identity  # noqa: E402


def _oracle(a, b):
    n, m = len(a), len(b)
    D = list(range(m + 1))
    for i in range(1, n + 1):
        prev = D[0]
        D[0] = i
        for j in range(1, m + 1):
            cur = min(
                D[j] + 1, D[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
            prev, D[j] = D[j], cur
    return D[m]


def test_edit_distance_fuzz_matches_oracle():
    rng = random.Random(0)
    for _ in range(300):
        a = "".join(
            rng.choice("ACGT") for _ in range(rng.randint(0, 40))
        )
        b = "".join(
            rng.choice("ACGT") for _ in range(rng.randint(0, 40))
        )
        assert edit_distance(a, b) == _oracle(a, b)


def test_identity_bounds():
    assert identity("ACGT", "ACGT") == 1.0
    assert identity("", "ACGT") == 0.0
    assert identity("ACGT", "") == 0.0
    assert 0.0 < identity("ACGTACGT", "ACGTACGA") < 1.0
