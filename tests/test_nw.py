"""Needleman-Wunsch gene alignment: the vectorized DP matches a direct
transcription of the reference recurrence (construct_graph.py:1433-1480)."""

from itertools import product

import numpy as np
import pytest

from amira_tpu.correct import needleman_wunsch


def _scalar_nw(x, y):
    """Independent cell-by-cell DP with the same scoring spec (match 1,
    mismatch 0, gap -1; ties resolved UP > LEFT > DIAG) for cross-checking
    the vectorized implementation."""
    n, m = len(x), len(y)
    score = np.zeros((n + 1, m + 1), dtype=int)
    move = np.zeros((n + 1, m + 1), dtype=int)  # 0 diag, 1 left, 2 up
    score[0, :] = -np.arange(m + 1)
    score[:, 0] = -np.arange(n + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            best = score[i - 1, j - 1] + (1 if x[i - 1] == y[j - 1] else 0)
            which = 0
            cand = score[i - 1, j] - 1  # consume x (gap in y)
            if cand >= best:
                best, which = cand, 1
            cand = score[i, j - 1] - 1  # consume y (gap in x)
            if cand >= best:
                best, which = cand, 2
            score[i, j] = best
            move[i, j] = which
    out = []
    i, j = n, m
    while i > 0 and j > 0:
        if move[i, j] == 0:
            out.append((x[i - 1], y[j - 1]))
            i, j = i - 1, j - 1
        elif move[i, j] == 1:
            out.append((x[i - 1], "*"))
            i -= 1
        else:
            out.append(("*", y[j - 1]))
            j -= 1
    while i > 0:
        out.append((x[i - 1], "*"))
        i -= 1
    while j > 0:
        out.append(("*", y[j - 1]))
        j -= 1
    return out[::-1]


@pytest.mark.parametrize("seed", range(8))
def test_nw_matches_reference_recurrence(seed):
    rng = np.random.RandomState(seed)
    alphabet = [f"+g{i}" for i in range(6)] + [f"-g{i}" for i in range(6)]
    n, m = rng.randint(1, 14, size=2)
    x = [alphabet[i] for i in rng.randint(0, len(alphabet), n)]
    y = [alphabet[i] for i in rng.randint(0, len(alphabet), m)]
    assert needleman_wunsch(x, y) == _scalar_nw(x, y)


def test_nw_identical():
    x = ["+a", "-b", "+c"]
    assert needleman_wunsch(x, x) == [(g, g) for g in x]


def test_nw_empty():
    assert needleman_wunsch([], ["+a"]) == [("*", "+a")]
    assert needleman_wunsch(["+a"], []) == [("+a", "*")]
