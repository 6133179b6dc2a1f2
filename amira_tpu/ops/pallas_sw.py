"""Pallas TPU kernel for banded affine Smith-Waterman.

Same contract as ops/align.py:_banded_sw_kernel, but the M/I/D band rows
live in VMEM scratch across the whole row loop and the horizontal (deletion)
recurrence is a Kogge-Stone prefix max (log2(W) shift-max steps) instead of
lax.cummax — so each row update is a handful of (1, W) VPU ops with no HBM
traffic beyond the packed traceback bytes.

Used by ops/align.py when AMIRA_TPU_SW_ENGINE=pallas (XLA scan remains the
default until the Pallas path is profiled faster on the target chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amira_tpu.ops.align import GAP_EXT, GAP_OPEN, MATCH, MISMATCH, NEG


def _sw_kernel_body(q_ref, r_ref, meta_ref, tb_ref, best_ref, m_scr, i_scr, d_scr):
    """One alignment: q (1, Lq), padded ref (1, R) slice, meta = [q_len, dlo]."""
    Lq = q_ref.shape[1]
    W = m_scr.shape[1]
    neg = jnp.int32(NEG)
    q_len = meta_ref[0, 0]
    dlo = meta_ref[0, 1]
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    m_scr[...] = jnp.zeros((1, W), jnp.int32)  # virtual row -1: H = 0
    i_scr[...] = jnp.full((1, W), neg, jnp.int32)
    d_scr[...] = jnp.full((1, W), neg, jnp.int32)
    best_ref[0, 0] = 0  # best score
    best_ref[0, 1] = -1  # best i
    best_ref[0, 2] = -1  # best w
    best_ref[0, 3] = 0  # best state

    def row(i, _):
        M_prev = m_scr[...]
        I_prev = i_scr[...]
        D_prev = d_scr[...]
        qc = q_ref[0, i]
        rwin = r_ref[0, pl.ds(i + dlo + W + Lq, W)].reshape(1, W)
        j = i + dlo + w_idx
        in_ref = (j >= 0) & (rwin != 4)
        s = jnp.where(rwin == qc, MATCH, MISMATCH)
        prev_best = jnp.maximum(jnp.maximum(M_prev, I_prev), D_prev)
        m_pred = jnp.where(
            M_prev >= jnp.maximum(I_prev, D_prev),
            1,
            jnp.where(I_prev >= D_prev, 2, 3),
        )
        M_diag = jnp.maximum(prev_best, 0) + s
        M_cur = jnp.maximum(0, M_diag)
        m_bits = jnp.where((M_diag > 0) & (prev_best > 0), m_pred, 0)
        M_cur = jnp.where(in_ref, M_cur, neg)
        # vertical (insertion): from band w+1 of the previous row
        M_up = _shift_left(M_prev, neg)
        I_up = _shift_left(I_prev, neg)
        I_open = M_up - GAP_OPEN
        I_ext = I_up - GAP_EXT
        I_cur = jnp.maximum(I_open, I_ext)
        i_bits = jnp.where(I_ext >= I_open, 4, 0)
        I_cur = jnp.where(in_ref, I_cur, neg)
        # horizontal (deletion): prefix max via Kogge-Stone shifts
        A = M_cur + w_idx * GAP_EXT
        shift = 1
        while shift < W:
            A = jnp.maximum(A, _shift_right_by(A, shift, neg))
            shift *= 2
        A_shift = _shift_right_by(A, 1, neg)
        D_cur = jnp.maximum(A_shift - GAP_OPEN - (w_idx - 1) * GAP_EXT, neg)
        D_left = _shift_right_by(D_cur, 1, neg)
        M_left = _shift_right_by(M_cur, 1, neg)
        d_bits = jnp.where((D_left - GAP_EXT) >= (M_left - GAP_OPEN), 8, 0)
        D_cur = jnp.where(in_ref, D_cur, neg)

        live = i < q_len
        M_cur = jnp.where(live, M_cur, neg)
        I_cur = jnp.where(live, I_cur, neg)
        D_cur = jnp.where(live, D_cur, neg)
        tb_ref[i, :] = (m_bits + i_bits + d_bits).reshape(W)
        m_scr[...] = M_cur
        i_scr[...] = I_cur
        d_scr[...] = D_cur

        row_state = jnp.where(
            M_cur >= jnp.maximum(I_cur, D_cur),
            0,
            jnp.where(I_cur >= D_cur, 1, 2),
        )
        row_vals = jnp.maximum(jnp.maximum(M_cur, I_cur), D_cur)
        rw = jnp.argmax(row_vals.reshape(W))
        rv = row_vals.reshape(W)[rw]

        @pl.when(rv > best_ref[0, 0])
        def _():
            best_ref[0, 0] = rv
            best_ref[0, 1] = i
            best_ref[0, 2] = rw.astype(jnp.int32)
            best_ref[0, 3] = row_state.reshape(W)[rw]

        return 0

    jax.lax.fori_loop(0, Lq, row, 0)


def _shift_left(x, fill):
    """x[..., w] <- x[..., w+1]; last lane <- fill."""
    y = jnp.roll(x, -1, axis=-1)
    return y.at[..., -1].set(fill)


def _shift_right_by(x, n, fill):
    y = jnp.roll(x, n, axis=-1)
    return y.at[..., :n].set(fill)


@partial(jax.jit, static_argnums=(4, 5))
def pallas_banded_sw(q, r_padded, q_len, dlo, W: int, interpret: bool = False):
    """Batched Pallas banded SW; same outputs as align._batched_sw."""
    import sys as _sys

    if _sys.getrecursionlimit() < 20000:
        _sys.setrecursionlimit(20000)  # Mosaic lowering recurses deeply
    B, Lq = q.shape

    def one(qi, ri, meta):
        return pl.pallas_call(
            _sw_kernel_body,
            out_shape=(
                jax.ShapeDtypeStruct((Lq, W), jnp.int32),
                jax.ShapeDtypeStruct((1, 4), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, W), jnp.int32),
                pltpu.VMEM((1, W), jnp.int32),
                pltpu.VMEM((1, W), jnp.int32),
            ],
            interpret=interpret,
        )(qi, ri, meta)

    meta = jnp.stack([q_len.astype(jnp.int32), dlo.astype(jnp.int32)], axis=-1)
    # int32 everywhere inside the kernel: Mosaic's uint8 conversion path
    # recurses during lowering
    tb, best = jax.vmap(one)(
        q[:, None, :].astype(jnp.int32),
        r_padded[:, None, :].astype(jnp.int32),
        meta[:, None, :],
    )
    return (
        tb.astype(jnp.uint8),
        best[:, 0, 0],
        best[:, 0, 1],
        best[:, 0, 2],
        best[:, 0, 3],
    )


def make_pallas_batched_sw(interpret: bool = False):
    def fn(q, r_padded, q_len, dlo, W):
        return pallas_banded_sw(q, r_padded, q_len, dlo, W, interpret)

    return fn
