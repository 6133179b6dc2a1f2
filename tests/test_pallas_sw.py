"""The batch-parallel Pallas SW engine (ops/pallas_sw_batch) matches the
XLA scan kernel bit-for-bit — scores, endpoints, and decoded CIGARs — and
the Aligner returns identical alignments under either engine.

Runs the Pallas kernel in interpreter mode (the test suite is forced-CPU);
the compiled kernel was validated bit-exact on one real v5e at
(512, 2048, W=256), where its DP runs ~3x the XLA scan (see module
docstring of ops/pallas_sw_batch.py).
"""

import numpy as np
import pytest

from amira_tpu.ops.align import (
    Aligner,
    _batched_sw_cigar,
    _bucket,
    _unpack_cigar,
)
from amira_tpu.ops.pallas_sw_batch import pallas_sw_cigar


def _mutated_pair(rng, n, sub=0.05, del_p=0.03, ins_p=0.03):
    q = rng.randint(0, 4, size=n).astype(np.uint8)
    r = []
    for ch in q:
        x = rng.rand()
        if x < sub:
            r.append(rng.randint(0, 4))
        elif x < sub + del_p:
            continue
        elif x < sub + del_p + ins_p:
            r.extend([ch, rng.randint(0, 4)])
        else:
            r.append(ch)
    return q, np.array(r, dtype=np.uint8)


@pytest.mark.parametrize("W,lq,B", [(64, 128, 24), (128, 256, 9)])
def test_pallas_batch_matches_xla_cigar(W, lq, B):
    """Random noisy pairs at varied lengths and band placements (including
    strongly negative diagonals and unrelated pairs)."""
    rng = np.random.RandomState(7)
    P = W + lq
    rlen = _bucket(2 * lq + 2 * W + 2 * lq)
    qs, rs, qlens, dlos = [], [], [], []
    for b in range(B):
        n = rng.randint(8, lq)
        if b % 5 == 4:  # unrelated pair: likely unmapped
            q = rng.randint(0, 4, size=n).astype(np.uint8)
            r = rng.randint(0, 4, size=n).astype(np.uint8)
        else:
            q, r = _mutated_pair(rng, n)
        qpad = np.full(lq, 4, np.uint8)
        qpad[: len(q)] = q
        rpad = np.full(rlen, 4, np.uint8)
        rpad[P : P + len(r)] = r
        qs.append(qpad)
        rs.append(rpad)
        qlens.append(len(q))
        dlos.append(int(rng.randint(-(lq - 1), max(len(r) - 1, 1))))
    qs = np.stack(qs)
    rs = np.stack(rs)
    qlens = np.asarray(qlens, np.int32)
    dlos = np.asarray(dlos, np.int32)
    ref = [np.asarray(x) for x in _batched_sw_cigar(qs, rs, qlens, dlos, W)]
    got = [
        np.asarray(x)
        for x in pallas_sw_cigar(qs, rs, qlens, dlos, W, interpret=True)
    ]
    for i, name in enumerate(
        ("packed", "n_steps", "q0", "r0", "best", "bi", "bw")
    ):
        if name == "packed":
            continue  # padding layouts differ; decoded cigars compared below
        np.testing.assert_array_equal(got[i], ref[i], err_msg=name)
    n_checked = 0
    for b in range(B):
        if ref[5][b] < 0 or ref[4][b] <= 0:
            continue
        assert _unpack_cigar(got[0][b], int(got[1][b])) == _unpack_cigar(
            ref[0][b], int(ref[1][b])
        ), b
        n_checked += 1
    assert n_checked >= B // 2


def test_aligner_identical_under_pallas_engine(monkeypatch):
    rng = np.random.RandomState(3)
    bases = np.array(list("ACGT"))
    ref = "".join(rng.choice(bases, size=700))
    reads = {}
    for i in range(12):
        s = rng.randint(0, 200)
        e = rng.randint(s + 300, min(s + 650, 700))
        seq = list(ref[s:e])
        for j in range(0, len(seq), 17):
            seq[j] = str(rng.choice(bases))
        reads[f"r{i}"] = "".join(seq)
    aligner = Aligner({"ref": ref}, band_width=64)

    monkeypatch.setenv("AMIRA_TPU_SW_ENGINE", "xla")
    xla = aligner.map_reads(dict(reads))
    monkeypatch.setenv("AMIRA_TPU_SW_ENGINE", "pallas-interpret")
    pls = aligner.map_reads(dict(reads))

    assert pls.keys() == xla.keys()
    for rid in pls:
        assert pls[rid].keys() == xla[rid].keys()
        for name in pls[rid]:
            sp, ap = pls[rid][name]
            sx, ax = xla[rid][name]
            assert sp == sx
            assert ap.cigar == ax.cigar
            assert (ap.q_start, ap.q_end, ap.r_start, ap.r_end) == (
                ax.q_start, ax.q_end, ax.r_start, ax.r_end,
            )
            assert ap.score == ax.score
