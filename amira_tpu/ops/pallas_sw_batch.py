"""Batch-parallel Pallas TPU kernel for banded two-piece-affine SW.

An earlier Pallas kernel put ONE alignment per grid program, so each row
update was a (1, W) vector op — a sliver of the VPU — and the XLA scan
beat it at batch (round-3 verdict item). This kernel re-grids with the BAND on
the sublane axis and the BATCH on the lane axis: carries are (W, BB=128)
VMEM scratch persisting across row-block grid steps, every row update is a
full 32-vreg tile, and — the key layout win — row i's reference window is
rshT[i : i+W, :], a CONTIGUOUS sublane slice of the pre-shifted transposed
reference (align._preshift_refs folds each job's band diagonal), so the
kernel needs no per-row gather, no in-kernel transpose, and no multi-GB
precomputed score slab. Inputs are two (rows, B) int32 slabs; the only
large output is the traceback byte tensor.

Role: the minimap2-replacement DP engine (the reference shells out to
minimap2, result_utils.py:259-276). Bit-identical alignments to
ops/align.py's XLA scan kernel (pinned by tests/test_pallas_sw.py);
the DEFAULT engine on the TPU backend (align._select_sw_engine): its DP
runs ~3x the XLA scan at production shapes, measured (512, 2048, W=256) on
one v5e (64 ms vs 193 ms warm).

Mosaic build caveats (each 500s this jaxlib's compile helper): all-int32 kernel
values, x64-off tracing, roll+iota-mask shifts instead of scatter, no
dynamic LANE slicing (all dynamic slices here ride sublanes), vector (not
scalar) predicates for wide selects.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amira_tpu.ops.align import (
    GAP_EXT,
    GAP_EXT2,
    GAP_OPEN,
    GAP_OPEN2,
    MATCH,
    MISMATCH,
    NEG,
)

BB = 128  # alignments per program (the VPU lane count)
LB = 16  # query rows per grid step (bounds the tb block at 512 KB)


def _sw_batch_kernel_body(
    qt_ref, rt_ref, tb_ref, best_ref,
    m_scr, i_scr, d_scr, i2_scr, d2_scr,
    bv_scr, bi_scr, bw_scr, bs_scr,
):
    """qt_ref: (Lqp, BB) query codes (code 4 past each query's length);
    rt_ref: (Lqp + W, BB) pre-shifted reference codes; tb block
    (LB, W, BB); best (4, 8, BB) written on the last row block."""
    W = m_scr.shape[0]
    r = pl.program_id(1)
    nr = pl.num_programs(1)
    neg = jnp.int32(NEG)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (W, BB), 0)
    c0, c1, c2, c3, c4, c5 = (jnp.int32(v) for v in (0, 1, 2, 3, 4, 5))
    c8, c16, c32, c64 = (jnp.int32(v) for v in (8, 16, 32, 64))
    cW = jnp.int32(W)
    match_s, mismatch_s = jnp.int32(MATCH), jnp.int32(MISMATCH)

    @pl.when(r == 0)
    def _():
        m_scr[...] = jnp.zeros((W, BB), jnp.int32)  # virtual row -1: H = 0
        i_scr[...] = jnp.full((W, BB), neg, jnp.int32)
        d_scr[...] = jnp.full((W, BB), neg, jnp.int32)
        i2_scr[...] = jnp.full((W, BB), neg, jnp.int32)
        d2_scr[...] = jnp.full((W, BB), neg, jnp.int32)
        bv_scr[...] = jnp.zeros((8, BB), jnp.int32)
        bi_scr[...] = jnp.full((8, BB), jnp.int32(-1), jnp.int32)
        bw_scr[...] = jnp.full((8, BB), jnp.int32(-1), jnp.int32)
        bs_scr[...] = jnp.zeros((8, BB), jnp.int32)

    def shift_band_up(x, fill):
        # band w+1 -> w (the XLA kernel's shift_up, band now on sublanes)
        return jnp.where(w_idx < W - 1, jnp.roll(x, -1, axis=0), fill)

    def shift_band_down_by(x, n, fill):
        return jnp.where(w_idx >= n, jnp.roll(x, n, axis=0), fill)

    def row(i, _):
        M_prev = m_scr[...]
        I_prev = i_scr[...]
        D_prev = d_scr[...]
        I2_prev = i2_scr[...]
        D2_prev = d2_scr[...]
        gi = r * jnp.int32(LB) + i  # global query row
        qc = qt_ref[pl.ds(gi, 1), :]  # (1, BB)
        rwin = rt_ref[pl.ds(gi, W), :]  # (W, BB) = rsh[b, gi+w]
        in_ref = (rwin != 4) & (qc != 4)
        eq = rwin == qc
        eq_bit = jnp.where(eq, jnp.int32(128), c0)
        s = jnp.where(eq, match_s, mismatch_s)
        gap_best = jnp.maximum(
            jnp.maximum(I_prev, D_prev), jnp.maximum(I2_prev, D2_prev)
        )
        prev_best = jnp.maximum(M_prev, gap_best)
        m_pred = jnp.where(
            M_prev >= gap_best,
            c1,
            jnp.where(
                I_prev >= jnp.maximum(D_prev, jnp.maximum(I2_prev, D2_prev)),
                c2,
                jnp.where(
                    D_prev >= jnp.maximum(I2_prev, D2_prev),
                    c3,
                    jnp.where(I2_prev >= D2_prev, c4, c5),
                ),
            ),
        )
        M_diag = jnp.maximum(prev_best, c0) + s
        M_cur = jnp.maximum(c0, M_diag)
        m_bits = jnp.where((M_diag > 0) & (prev_best > 0), m_pred, c0)
        M_cur = jnp.where(in_ref, M_cur, neg)
        M_up = shift_band_up(M_prev, neg)
        I_up = shift_band_up(I_prev, neg)
        I2_up = shift_band_up(I2_prev, neg)
        I_open = M_up - GAP_OPEN
        I_ext = I_up - GAP_EXT
        I_cur = jnp.maximum(I_open, I_ext)
        i_bits = jnp.where(I_ext >= I_open, c8, c0)
        I_cur = jnp.where(in_ref, I_cur, neg)
        I2_open = M_up - GAP_OPEN2
        I2_ext = I2_up - GAP_EXT2
        I2_cur = jnp.maximum(I2_open, I2_ext)
        i2_bits = jnp.where(I2_ext >= I2_open, c32, c0)
        I2_cur = jnp.where(in_ref, I2_cur, neg)
        A = M_cur + w_idx * GAP_EXT
        shift = 1
        while shift < W:
            A = jnp.maximum(A, shift_band_down_by(A, shift, neg))
            shift *= 2
        A_shift = shift_band_down_by(A, 1, neg)
        D_cur = jnp.maximum(A_shift - GAP_OPEN - (w_idx - 1) * GAP_EXT, neg)
        D_left = shift_band_down_by(D_cur, 1, neg)
        M_left = shift_band_down_by(M_cur, 1, neg)
        d_bits = jnp.where((D_left - GAP_EXT) >= (M_left - GAP_OPEN), c16, c0)
        D_cur = jnp.where(in_ref, D_cur, neg)
        A2 = M_cur + w_idx * GAP_EXT2
        shift = 1
        while shift < W:
            A2 = jnp.maximum(A2, shift_band_down_by(A2, shift, neg))
            shift *= 2
        A2_shift = shift_band_down_by(A2, 1, neg)
        D2_cur = jnp.maximum(
            A2_shift - GAP_OPEN2 - (w_idx - 1) * GAP_EXT2, neg
        )
        D2_left = shift_band_down_by(D2_cur, 1, neg)
        d2_bits = jnp.where(
            (D2_left - GAP_EXT2) >= (M_left - GAP_OPEN2), c64, c0
        )
        D2_cur = jnp.where(in_ref, D2_cur, neg)
        tb_ref[pl.ds(i, 1)] = (
            m_bits + i_bits + d_bits + i2_bits + d2_bits + eq_bit
        ).reshape(1, W, BB)
        m_scr[...] = M_cur
        i_scr[...] = I_cur
        d_scr[...] = D_cur
        i2_scr[...] = I2_cur
        d2_scr[...] = D2_cur

        gap_cur = jnp.maximum(
            jnp.maximum(I_cur, D_cur), jnp.maximum(I2_cur, D2_cur)
        )
        row_state = jnp.where(
            M_cur >= gap_cur,
            c0,
            jnp.where(
                I_cur >= jnp.maximum(D_cur, jnp.maximum(I2_cur, D2_cur)),
                c1,
                jnp.where(
                    D_cur >= jnp.maximum(I2_cur, D2_cur),
                    c2,
                    jnp.where(I2_cur >= D2_cur, c3, c4),
                ),
            ),
        )
        row_vals = jnp.maximum(M_cur, gap_cur)
        # per-job row best: max value, FIRST band lane holding it, its
        # state — (1, BB) reductions over the sublane (band) axis
        rv = jnp.max(row_vals, axis=0, keepdims=True)
        is_max = row_vals == rv
        rw = jnp.min(jnp.where(is_max, w_idx, cW), axis=0, keepdims=True)
        state_at = jnp.max(
            jnp.where(is_max & (w_idx == rw), row_state, c0),
            axis=0,
            keepdims=True,
        )
        # best-so-far carries: (8, BB) scratch, every sublane the same
        bv = bv_scr[...]
        upd = rv > bv  # (1, BB) broadcasts; sublane-uniform result
        bv_scr[...] = jnp.where(upd, rv, bv)
        bi_scr[...] = jnp.where(upd, gi, bi_scr[...])
        bw_scr[...] = jnp.where(upd, rw, bw_scr[...])
        bs_scr[...] = jnp.where(upd, state_at, bs_scr[...])
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(LB), row, jnp.int32(0))

    @pl.when(r == nr - 1)
    def _():
        best_ref[pl.ds(0, 1)] = bv_scr[...].reshape(1, 8, BB)
        best_ref[pl.ds(1, 1)] = bi_scr[...].reshape(1, 8, BB)
        best_ref[pl.ds(2, 1)] = bw_scr[...].reshape(1, 8, BB)
        best_ref[pl.ds(3, 1)] = bs_scr[...].reshape(1, 8, BB)


@partial(jax.jit, static_argnums=(2, 3))
def _pallas_sw_core(qt, rt, W: int, interpret: bool = False):
    """DP over transposed (rows, B) code slabs. qt (Lqp, Bp) int32 with
    code 4 past each query's length; rt (Lqp + W, Bp) int32 pre-shifted
    reference codes. Lqp % LB == 0, Bp % BB == 0. Returns tb (Lqp, W, Bp)
    uint8 + per-job (best, bi, bw, bs)."""
    Lqp, Bp = qt.shape
    tb, best = pl.pallas_call(
        _sw_batch_kernel_body,
        grid=(Bp // BB, Lqp // LB),
        out_shape=(
            jax.ShapeDtypeStruct((Lqp, W, Bp), jnp.int32),
            jax.ShapeDtypeStruct((4, 8, Bp), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(
                (Lqp, BB), lambda b, r: (0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Lqp + W, BB), lambda b, r: (0, b),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (LB, W, BB), lambda b, r: (r, 0, b),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 8, BB), lambda b, r: (0, 0, b),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=(
            [pltpu.VMEM((W, BB), jnp.int32) for _ in range(5)]
            + [pltpu.VMEM((8, BB), jnp.int32) for _ in range(4)]
        ),
        interpret=interpret,
    )(qt, rt)
    return tb.astype(jnp.uint8), best[0, 0], best[1, 0], best[2, 0], best[3, 0]


@partial(jax.jit, static_argnames=("W",))
def _prep_inputs(qs, rs, qlens, dlos, W: int):
    from amira_tpu.ops.align import _preshift_refs

    B, Lq = qs.shape
    rsh = _preshift_refs(rs, dlos, Lq, W)
    # fold the query-length mask into the query codes (rows past qlen
    # become code 4 -> whole rows invalid; state vectors then match the
    # XLA kernel's live-masked carries exactly)
    qmask = jnp.arange(Lq, dtype=jnp.int32)[None, :] < qlens[:, None]
    qs_m = jnp.where(qmask, qs, jnp.uint8(4))
    b_pad = (-B) % BB
    r_pad = (-Lq) % LB
    qt = jnp.pad(
        qs_m.transpose(1, 0).astype(jnp.int32),
        ((0, r_pad), (0, b_pad)),
        constant_values=4,
    )
    rt = jnp.pad(
        rsh.transpose(1, 0).astype(jnp.int32),
        ((0, r_pad), (0, b_pad)),
        constant_values=4,
    )
    return qt, rt


@partial(jax.jit, static_argnames=("B", "Lq", "W"))
def _traceback_stage(tb_lwb, B: int, Lq: int, best, bi, bw, bs, dlos,
                     W: int):
    """Device traceback over the kernel's (Lq, W, Bp) tb layout — exactly
    align._traceback_batch with the flat-index formula adapted, so no
    whole-tensor transpose is ever materialized."""
    from amira_tpu.ops.align import _traceback_batch

    Bp = tb_lwb.shape[2]
    packed, n_steps, q0, fw = _traceback_batch(
        tb_lwb, B, Lq, best, bi, bw, bs, W,
        tb_index=lambda ic, wc, ln: (ic * W + wc) * Bp + ln,
    )
    r0 = q0 + dlos.astype(jnp.int32) + fw
    return packed, n_steps, q0, r0


def pallas_sw_cigar(qs, rs, qlens, dlos, W: int, interpret: bool = False):
    """Fused Pallas DP + (XLA) device traceback; drop-in twin of
    align._batched_sw_cigar with identical outputs. The Pallas stage
    traces with x64 off between two normally-traced XLA stages: under
    global x64, Mosaic's index plumbing emits 64-bit iota/arith that the
    v5e lowering grinds on (~500s trace vs seconds), and no kernel index
    here needs more than 32 bits."""
    B, Lq = qs.shape
    qt, rt = _prep_inputs(qs, rs, qlens, dlos, W)
    with jax.enable_x64(False):
        tb, best, bi, bw, bs = _pallas_sw_core(qt, rt, W, interpret)
    best, bi, bw, bs = best[:B], bi[:B], bw[:B], bs[:B]
    packed, n_steps, q0, r0 = _traceback_stage(
        tb, B, Lq, best, bi, bw, bs, dlos, W
    )
    return packed, n_steps, q0, r0, best, bi, bw
