"""Pallas TPU kernel for banded two-piece-affine Smith-Waterman.

Same contract as ops/align.py:_banded_sw_kernel, but the M/I/D/I2/D2 band
rows live in VMEM scratch across the whole row loop and each horizontal
(deletion) recurrence is a Kogge-Stone prefix max (log2(W) shift-max steps)
instead of lax.cummax — so each row update is a handful of (1, W) VPU ops
with no HBM traffic beyond the packed traceback bytes.

Used by ops/align.py when AMIRA_TPU_SW_ENGINE=pallas. Compiles and runs on
real v5e hardware, bit-exact vs both interpret mode and the XLA scan kernel
(validated 2026-08-18; ~29ms warm through the tunnel at (8,128,128), with
the XLA scan still faster at large batch because the grid serializes
alignments while the scan vectorizes across them — so XLA scan remains the
default engine).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
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


def _sw_kernel_body(
    q_ref, rw_ref, meta_ref, tb_ref, best_ref,
    m_scr, i_scr, d_scr, i2_scr, d2_scr,
):
    """One alignment: q (1, Lq) in SMEM, pre-gathered band windows rw (Lq, W)
    in VMEM, meta = [q_len, dlo] in SMEM.

    Mosaic-on-this-jaxlib workarounds (each 500s the compile helper
    otherwise): no dynamic LANE slicing and no dynamic scalar VMEM reads —
    band windows are pre-gathered in XLA and q rides in SMEM; no vmap over
    pallas_call — the batch is the grid; no BLOCKED SMEM outputs — the best
    table is a full (B, 4) SMEM buffer written at the program_id row.
    """
    Lq = q_ref.shape[1]
    W = m_scr.shape[1]
    batch = pl.program_id(0)
    neg = jnp.int32(NEG)
    q_len = meta_ref[0, 0]
    dlo = meta_ref[0, 1]
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    # all literals as int32: under jax x64, a Python-int branch of jnp.where
    # becomes int64 and the resulting int64->int32 converts recurse forever
    # in Mosaic's _convert_helper on this jaxlib build
    c0, c1, c2, c3, c4, c5 = (jnp.int32(v) for v in (0, 1, 2, 3, 4, 5))
    c8, c16, c32, c64 = (jnp.int32(v) for v in (8, 16, 32, 64))
    cW = jnp.int32(W)
    match_s, mismatch_s = jnp.int32(MATCH), jnp.int32(MISMATCH)

    m_scr[...] = jnp.zeros((1, W), jnp.int32)  # virtual row -1: H = 0
    i_scr[...] = jnp.full((1, W), neg, jnp.int32)
    d_scr[...] = jnp.full((1, W), neg, jnp.int32)
    i2_scr[...] = jnp.full((1, W), neg, jnp.int32)
    d2_scr[...] = jnp.full((1, W), neg, jnp.int32)
    best_ref[batch, 0] = 0  # best score
    best_ref[batch, 1] = -1  # best i
    best_ref[batch, 2] = -1  # best w
    best_ref[batch, 3] = 0  # best state

    def row(i, _):
        # lane-masked shifts (jnp.roll + iota mask) instead of .at[].set —
        # Mosaic lowers the masked roll directly; the scatter form recursed
        # in _convert_helper on this jax/Mosaic build
        def shift_left(x, fill):
            return jnp.where(w_idx < W - 1, jnp.roll(x, -1, axis=-1), fill)

        def shift_right_by(x, n, fill):
            return jnp.where(w_idx >= n, jnp.roll(x, n, axis=-1), fill)

        M_prev = m_scr[...]
        I_prev = i_scr[...]
        D_prev = d_scr[...]
        I2_prev = i2_scr[...]
        D2_prev = d2_scr[...]
        qc = q_ref[0, i]
        rwin = rw_ref[pl.ds(i, 1), :]
        j = i + dlo + w_idx
        in_ref = (j >= 0) & (rwin != 4)
        s = jnp.where(rwin == qc, match_s, mismatch_s)
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
        M_diag = jnp.maximum(prev_best, 0) + s
        M_cur = jnp.maximum(c0, M_diag)
        m_bits = jnp.where((M_diag > 0) & (prev_best > 0), m_pred, c0)
        M_cur = jnp.where(in_ref, M_cur, neg)
        # vertical (insertion): from band w+1 of the previous row
        M_up = shift_left(M_prev, neg)
        I_up = shift_left(I_prev, neg)
        I2_up = shift_left(I2_prev, neg)
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
        # horizontal (deletion): prefix max via Kogge-Stone shifts
        A = M_cur + w_idx * GAP_EXT
        shift = 1
        while shift < W:
            A = jnp.maximum(A, shift_right_by(A, shift, neg))
            shift *= 2
        A_shift = shift_right_by(A, 1, neg)
        D_cur = jnp.maximum(A_shift - GAP_OPEN - (w_idx - 1) * GAP_EXT, neg)
        D_left = shift_right_by(D_cur, 1, neg)
        M_left = shift_right_by(M_cur, 1, neg)
        d_bits = jnp.where((D_left - GAP_EXT) >= (M_left - GAP_OPEN), c16, c0)
        D_cur = jnp.where(in_ref, D_cur, neg)
        A2 = M_cur + w_idx * GAP_EXT2
        shift = 1
        while shift < W:
            A2 = jnp.maximum(A2, shift_right_by(A2, shift, neg))
            shift *= 2
        A2_shift = shift_right_by(A2, 1, neg)
        D2_cur = jnp.maximum(
            A2_shift - GAP_OPEN2 - (w_idx - 1) * GAP_EXT2, neg
        )
        D2_left = shift_right_by(D2_cur, 1, neg)
        d2_bits = jnp.where(
            (D2_left - GAP_EXT2) >= (M_left - GAP_OPEN2), c64, c0
        )
        D2_cur = jnp.where(in_ref, D2_cur, neg)

        # vector (not scalar) liveness predicate: a scalar-bool jnp.where
        # over (1, W) operands is another grid-mode Mosaic 500 on this build
        live = (w_idx - w_idx + i) < q_len
        M_cur = jnp.where(live, M_cur, neg)
        I_cur = jnp.where(live, I_cur, neg)
        D_cur = jnp.where(live, D_cur, neg)
        I2_cur = jnp.where(live, I2_cur, neg)
        D2_cur = jnp.where(live, D2_cur, neg)
        tb_ref[pl.ds(i, 1), :] = (
            m_bits + i_bits + d_bits + i2_bits + d2_bits
        ).reshape(1, W)
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
        # best lane without 1-D argmax / dynamic vector indexing: the max
        # value, its first lane, and the state at that lane via reductions
        rv = jnp.max(row_vals)
        is_max = row_vals == rv
        rw = jnp.min(jnp.where(is_max, w_idx, cW))
        state_at = jnp.max(jnp.where(is_max & (w_idx == rw), row_state, c0))

        @pl.when(rv > best_ref[batch, 0])
        def _():
            best_ref[batch, 0] = rv
            best_ref[batch, 1] = i
            best_ref[batch, 2] = rw.astype(jnp.int32)
            best_ref[batch, 3] = state_at

        return jnp.int32(0)

    # int32 loop bounds: with jax x64 enabled a Python-int bound makes the
    # loop index int64, and every int64->int32 convert inside the kernel
    # falls into Mosaic's _convert_helper fallback, which emits the same
    # convert again -> infinite lowering recursion on this jaxlib build
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(Lq), row, jnp.int32(0))


@partial(jax.jit, static_argnums=(4, 5))
def pallas_banded_sw(q, r_padded, q_len, dlo, W: int, interpret: bool = False):
    """Batched Pallas banded SW; same outputs as align._batched_sw.

    The batch is the pallas grid dimension (one program per alignment,
    blocks pipelined) — vmap over pallas_call also 500s in this build's
    compile helper. Band windows are pre-gathered in XLA (dynamic lane
    slices don't compile in Mosaic here; sublane loads do).
    """
    B, Lq = q.shape
    q = q.astype(jnp.int32)
    meta = jnp.stack(
        [q_len.astype(jnp.int32), dlo.astype(jnp.int32)], axis=-1
    )  # (B, 2)
    starts = (
        jnp.arange(Lq, dtype=jnp.int32)[None, :]
        + dlo.astype(jnp.int32)[:, None]
        + jnp.int32(W + Lq)
    )  # (B, Lq)
    rwin = jax.vmap(
        lambda r1, st: jax.vmap(
            lambda s0: jax.lax.dynamic_slice_in_dim(r1, s0, W)
        )(st)
    )(r_padded.astype(jnp.int32), starts)  # (B, Lq, W)

    # scalars ride as (B, 1, X) with a squeezed (None) batch block: Mosaic
    # requires the last two block dims be full (or 8x128-divisible), so the
    # batch axis must not be one of them
    tb, best = pl.pallas_call(
        _sw_kernel_body,
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lq, W), jnp.int32),
            jax.ShapeDtypeStruct((B, 4), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(
                (None, 1, Lq), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (None, Lq, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, 1, 2), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (None, Lq, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
        ],
        interpret=interpret,
    )(q[:, None, :], rwin, meta[:, None, :])
    return (
        tb.astype(jnp.uint8),
        best[:, 0],
        best[:, 1],
        best[:, 2],
        best[:, 3],
    )


def make_pallas_batched_sw(interpret: bool = False):
    def fn(q, r_padded, q_len, dlo, W):
        # trace with x64 off: with jax's global x64 mode on, Mosaic's
        # grid/block index plumbing emits 64-bit indices and the compile
        # helper 500s (kernel-content-independent; reproduced on trivial
        # grid kernels). The kernel is all-int32, so x64-off tracing is
        # value-identical.
        with jax.enable_x64(False):
            return pallas_banded_sw(q, r_padded, q_len, dlo, W, interpret)

    return fn
