"""Device traceback parity: the fused DP+traceback scan
(`ops/align._batched_sw_cigar`) must reproduce the host band-matrix walk
(`ops/align._traceback`) bit-for-bit — same CIGARs, same endpoints — and the
Aligner must return identical alignments under either mode.

The reference's equivalent surface is minimap2's --eqx CIGAR output
(result_utils.py:259-276); here both tracebacks decode the same packed
direction bytes, so equality is exact, not approximate.
"""

import numpy as np
import pytest

from amira_tpu.ops.align import (
    Aligner,
    _batched_sw,
    _batched_sw_cigar,
    _bucket,
    _traceback,
    _unpack_cigar,
)


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


@pytest.mark.parametrize("W,lq", [(64, 128), (128, 256)])
def test_device_traceback_matches_host(W, lq):
    rng = np.random.RandomState(7)
    B = 24
    P = W + lq
    rlen = _bucket(2 * lq + 2 * W + 2 * lq)
    qs, rs, qlens, dlos, refs = [], [], [], [], []
    for b in range(B):
        n = rng.randint(lq // 4, lq)
        q, r = _mutated_pair(rng, n)
        refs.append(r)
        qpad = np.full(lq, 4, np.uint8)
        qpad[: len(q)] = q
        rpad = np.full(rlen, 4, np.uint8)
        rpad[P : P + len(r)] = r
        qs.append(qpad)
        rs.append(rpad)
        qlens.append(len(q))
        dlos.append(int(np.clip(-W // 2, -(lq - 1), max(len(r) - 1, 0))))
    qs = np.stack(qs)
    rs = np.stack(rs)
    qlens = np.asarray(qlens, np.int32)
    dlos = np.asarray(dlos, np.int32)

    tb, best, bi, bw, bs = map(np.asarray, _batched_sw(qs, rs, qlens, dlos, W))
    packed, nst, q0s, r0s, best2, bi2, bw2 = map(
        np.asarray, _batched_sw_cigar(qs, rs, qlens, dlos, W)
    )
    np.testing.assert_array_equal(best, best2)
    np.testing.assert_array_equal(bi, bi2)
    np.testing.assert_array_equal(bw, bw2)
    n_checked = 0
    for b in range(B):
        if bi[b] < 0 or best[b] <= 0:
            continue
        cig_h, q0, r0, q1, r1 = _traceback(
            tb[b],
            qs[b],
            np.concatenate([refs[b], np.full(W + lq, 4, np.uint8)]),
            bi[b], bw[b], bs[b], dlos[b],
        )
        cig_d = _unpack_cigar(packed[b], int(nst[b]))
        assert cig_d == cig_h
        assert int(q0s[b]) == q0
        assert int(r0s[b]) == r0
        assert int(bi[b]) + 1 == q1
        assert int(bi[b]) + int(dlos[b]) + int(bw[b]) + 1 == r1
        n_checked += 1
    assert n_checked >= B - 2  # nearly every pair must align


def test_batch_major_dp_matches_single_job_kernel():
    """The batch-major DP (`_banded_sw_batch_core` via `_batched_sw`) must be
    bit-identical to vmapping the original single-job kernel
    (`_banded_sw_kernel`) — scores, argmax cell, AND every traceback byte —
    across varied query lengths and band placements."""
    import jax

    from amira_tpu.ops.align import _banded_sw_kernel

    rng = np.random.RandomState(11)
    W, lq = 64, 128
    B = 16
    P = W + lq
    rlen = _bucket(2 * lq + 2 * W + 2 * lq)
    qs, rs, qlens, dlos = [], [], [], []
    for b in range(B):
        n = rng.randint(8, lq)
        q, r = _mutated_pair(rng, n)
        qpad = np.full(lq, 4, np.uint8)
        qpad[: len(q)] = q
        rpad = np.full(rlen, 4, np.uint8)
        rpad[P : P + len(r)] = r
        qs.append(qpad)
        rs.append(rpad)
        qlens.append(len(q))
        # vary the band placement, including strongly negative diagonals
        dlos.append(int(rng.randint(-(lq - 1), max(len(r) - 1, 1))))
    qs = np.stack(qs)
    rs = np.stack(rs)
    qlens = np.asarray(qlens, np.int32)
    dlos = np.asarray(dlos, np.int32)
    got = map(np.asarray, _batched_sw(qs, rs, qlens, dlos, W))
    ref = map(
        np.asarray,
        jax.vmap(_banded_sw_kernel, in_axes=(0, 0, 0, 0, None))(
            qs, rs, qlens, dlos, W
        ),
    )
    for g, r, name in zip(got, ref, ("tb", "best", "bi", "bw", "bs")):
        np.testing.assert_array_equal(g, r, err_msg=name)


def test_aligner_identical_under_either_traceback(monkeypatch):
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

    monkeypatch.setenv("AMIRA_TPU_DEVICE_TRACEBACK", "1")
    dev = aligner.map_reads(dict(reads))
    monkeypatch.setenv("AMIRA_TPU_DEVICE_TRACEBACK", "0")
    host = aligner.map_reads(dict(reads))

    assert dev.keys() == host.keys()
    for rid in dev:
        assert dev[rid].keys() == host[rid].keys()
        for name in dev[rid]:
            sd, ad = dev[rid][name]
            sh, ah = host[rid][name]
            assert sd == sh
            assert ad.cigar == ah.cigar
            assert (ad.q_start, ad.q_end, ad.r_start, ad.r_end) == (
                ah.q_start, ah.q_end, ah.r_start, ah.r_end,
            )
            assert ad.score == ah.score
