"""Pallas banded-SW kernel matches the XLA scan kernel bit-for-bit."""

import os

import numpy as np
import pytest

from amira_tpu.ops.align import Aligner, _batched_sw
from amira_tpu.ops.pallas_sw import pallas_banded_sw
from amira_tpu.sketch import encode_dna


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def test_pallas_matches_xla_kernel():
    rng = np.random.RandomState(3)
    W, Lq, rlen = 128, 256, 2048
    P = W + Lq
    qs, rs, qlens, dlos = [], [], [], []
    for case in range(4):
        ref = _random_seq(rng, 400)
        if case == 0:
            q = ref[:200]
            dlo = -W // 2
        elif case == 1:
            q = _random_seq(rng, 50) + ref[100:250]
            dlo = 50 - W // 2
        elif case == 2:  # noisy
            q = "".join(
                c if rng.rand() > 0.1 else rng.choice(list("ACGT"))
                for c in ref[:220]
            )
            dlo = -W // 2
        else:  # unrelated
            q = _random_seq(rng, 180)
            dlo = 0
        qc = encode_dna(q)
        rc = encode_dna(ref)
        qpad = np.full(Lq, 4, np.uint8)
        qpad[: len(qc)] = qc
        rpad = np.full(rlen, 4, np.uint8)
        rpad[P : P + len(rc)] = rc
        qs.append(qpad)
        rs.append(rpad)
        qlens.append(len(qc))
        dlos.append(dlo)
    args = (
        np.stack(qs),
        np.stack(rs),
        np.asarray(qlens, np.int32),
        np.asarray(dlos, np.int32),
    )
    tb1, b1, i1, w1, s1 = _batched_sw(*args, W)
    tb2, b2, i2, w2, s2 = pallas_banded_sw(*args, W, True)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(tb1), np.asarray(tb2))


def test_aligner_with_pallas_engine(monkeypatch):
    monkeypatch.setenv("AMIRA_TPU_SW_ENGINE", "pallas-interpret")
    rng = np.random.RandomState(5)
    ref = _random_seq(rng, 600)
    aligner = Aligner({"r": ref}, band_width=64)
    hits = aligner.map_sequence(ref)
    _, aln = hits["r"]
    assert aln.cigar == [("=", 600)]
