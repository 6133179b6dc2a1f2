"""Banded affine-gap local alignment on device (minimap2 replacement).

The reference shells out to minimap2 (`-a --MD -x map-ont --eqx`,
result_utils.py:259-276) for read->allele and allele->allele alignment. Here
alignment is a batched JAX kernel: a scan over query rows carrying M/I/D
band-vectors, with the horizontal (deletion) recurrence rewritten as a
cumulative max so every lane of the band updates in parallel on the VPU.
Traceback directions are packed into one byte per cell and walked on the
host to produce =/X/I/D CIGARs (minimap2 --eqx semantics).

Band placement comes from shared-15-mer seed diagonals (the seed-chain step
of seed-chain-extend); pairs with no seeds are reported unmapped.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from amira_tpu.sketch import encode_dna

NEG = -(2**28)

# ONT-style scoring (minimap2 map-ont: A=2, B=4, O=4, E=2)
MATCH = 2
MISMATCH = -4
GAP_OPEN = 6  # first gap base: O + E
GAP_EXT = 2


@partial(jax.jit, static_argnames=("W",))
def _banded_sw_kernel(q, r_padded, q_len, dlo, W: int):
    """One banded local alignment.

    q:        (Lq,) uint8 query codes (0..3, 4=N/pad)
    r_padded: uint8 ref codes padded with 4s, real ref at offset W + Lq
    q_len:    scalar actual query length
    dlo:      scalar band lower diagonal (j - i >= dlo)
    Returns (tb, best, best_i, best_w, best_state):
      tb: (Lq, W) uint8 packed traceback
          bits 0-1: M predecessor (0 start, 1 M, 2 I, 3 D)
          bit 2: I extends (else opens from M)
          bit 3: D extends (else opens from M)
      best_state: 0=M, 1=I, 2=D at the maximum cell
    """
    Lq = q.shape[0]
    neg = jnp.int32(NEG)
    w_idx = jnp.arange(W, dtype=jnp.int32)

    def row(carry, i):
        M_prev, I_prev, D_prev, best, bi, bw, bs = carry
        qc = q[i]
        # ref chars for this row's band: j = i + dlo + w (offset W+Lq pad)
        rwin = jax.lax.dynamic_slice_in_dim(r_padded, i + dlo + W + Lq, W)
        j = i + dlo + w_idx
        in_ref = (j >= 0) & (rwin != 4)
        s = jnp.where(rwin == qc, MATCH, MISMATCH)
        # diagonal move: (i-1, j-1) is the same w in band coordinates
        prev_best = jnp.maximum(jnp.maximum(M_prev, I_prev), D_prev)
        m_pred = jnp.where(
            M_prev >= jnp.maximum(I_prev, D_prev),
            1,
            jnp.where(I_prev >= D_prev, 2, 3),
        ).astype(jnp.uint8)
        # a fresh local start treats any non-positive (or out-of-band)
        # predecessor as score 0
        M_diag = jnp.maximum(prev_best, 0) + s
        M_cur = jnp.maximum(0, M_diag)
        # a path only continues through a predecessor with positive score;
        # otherwise this cell is a fresh local start (SW semantics)
        m_bits = jnp.where((M_diag > 0) & (prev_best > 0), m_pred, 0).astype(
            jnp.uint8
        )
        M_cur = jnp.where(in_ref, M_cur, neg)
        # vertical move (insertion in query): from (i-1, j) = band w+1
        M_up = jnp.concatenate([M_prev[1:], jnp.full((1,), neg, jnp.int32)])
        I_up = jnp.concatenate([I_prev[1:], jnp.full((1,), neg, jnp.int32)])
        I_open = M_up - GAP_OPEN
        I_ext = I_up - GAP_EXT
        I_cur = jnp.maximum(I_open, I_ext)
        i_bits = (I_ext >= I_open).astype(jnp.uint8) << 2
        I_cur = jnp.where(in_ref, I_cur, neg)
        # horizontal move (deletion in ref): sequential in w, computed as a
        # cumulative max:  D[w] = max_{w0 < w} M[w0] - OPEN - (w-1-w0)*EXT
        A = M_cur + w_idx * GAP_EXT
        A_cum = jax.lax.cummax(A)
        A_shift = jnp.concatenate([jnp.full((1,), neg, jnp.int32), A_cum[:-1]])
        D_cur = A_shift - GAP_OPEN - (w_idx - 1) * GAP_EXT
        D_cur = jnp.maximum(D_cur, neg)
        # direction bit: did D extend from D[w-1] or open from M[w-1]?
        D_left = jnp.concatenate([jnp.full((1,), neg, jnp.int32), D_cur[:-1]])
        M_left = jnp.concatenate([jnp.full((1,), neg, jnp.int32), M_cur[:-1]])
        d_bits = ((D_left - GAP_EXT) >= (M_left - GAP_OPEN)).astype(jnp.uint8) << 3
        D_cur = jnp.where(in_ref, D_cur, neg)

        live = i < q_len
        M_cur = jnp.where(live, M_cur, neg)
        I_cur = jnp.where(live, I_cur, neg)
        D_cur = jnp.where(live, D_cur, neg)
        tb_row = m_bits | i_bits | d_bits

        # track the global maximum cell and its state
        row_best_state = jnp.where(
            M_cur >= jnp.maximum(I_cur, D_cur),
            0,
            jnp.where(I_cur >= D_cur, 1, 2),
        )
        row_vals = jnp.maximum(jnp.maximum(M_cur, I_cur), D_cur)
        rw = jnp.argmax(row_vals)
        rv = row_vals[rw]
        upd = rv > best
        best = jnp.where(upd, rv, best)
        bi = jnp.where(upd, i, bi)
        bw = jnp.where(upd, rw.astype(jnp.int32), bw)
        bs = jnp.where(upd, row_best_state[rw], bs)
        return (M_cur, I_cur, D_cur, best, bi, bw, bs), tb_row

    init = (
        # virtual row -1: H = 0 everywhere (fresh local starts), gaps closed
        jnp.zeros((W,), jnp.int32),
        jnp.full((W,), neg, jnp.int32),
        jnp.full((W,), neg, jnp.int32),
        jnp.int32(0),
        jnp.int32(-1),
        jnp.int32(-1),
        jnp.int32(0),
    )
    (M, I, D, best, bi, bw, bs), tb = jax.lax.scan(
        row, init, jnp.arange(Lq, dtype=jnp.int32)
    )
    return tb, best, bi, bw, bs


_batched_sw = jax.jit(
    jax.vmap(_banded_sw_kernel, in_axes=(0, 0, 0, 0, None)),
    static_argnums=(4,),
)


def _select_sw_engine():
    """XLA scan by default; AMIRA_TPU_SW_ENGINE=pallas selects the Pallas
    VMEM-resident kernel (ops/pallas_sw.py), =pallas-interpret its
    interpreter mode (for CPU testing)."""
    import os

    engine = os.environ.get("AMIRA_TPU_SW_ENGINE", "xla")
    if engine == "pallas":
        from amira_tpu.ops.pallas_sw import make_pallas_batched_sw

        return make_pallas_batched_sw(interpret=False)
    if engine == "pallas-interpret":
        from amira_tpu.ops.pallas_sw import make_pallas_batched_sw

        return make_pallas_batched_sw(interpret=True)
    return _batched_sw


@dataclass
class Alignment:
    """A local alignment of query against ref (one SAM record equivalent)."""

    q_start: int
    q_end: int  # exclusive
    r_start: int
    r_end: int  # exclusive
    score: int
    cigar: list  # [(op, length)] with ops in "=XID"
    q_len: int
    r_len: int

    @property
    def matching_bases(self) -> int:
        return sum(n for op, n in self.cigar if op == "=")

    @property
    def aligned_ref_positions(self):
        return (self.r_start, self.r_end)

    def cigar_string(self, with_clips=True) -> str:
        parts = []
        if with_clips and self.q_start > 0:
            parts.append(f"{self.q_start}S")
        parts.extend(f"{n}{op}" for op, n in self.cigar)
        if with_clips and self.q_len - self.q_end > 0:
            parts.append(f"{self.q_len - self.q_end}S")
        return "".join(parts)

    def cigar_tuples(self, with_clips=True):
        """pysam-style (op_code, length) tuples: = ->7, X->8, I->1, D->2, S->4."""
        code = {"=": 7, "X": 8, "I": 1, "D": 2}
        out = []
        if with_clips and self.q_start > 0:
            out.append((4, self.q_start))
        out.extend((code[op], n) for op, n in self.cigar)
        if with_clips and self.q_len - self.q_end > 0:
            out.append((4, self.q_len - self.q_end))
        return out

    def identity(self) -> float:
        """matching / (aligned cols excluding clips), minimap2 --eqx style."""
        total = sum(n for _, n in self.cigar)
        return self.matching_bases / total if total else 0.0


_COMP = str.maketrans("ACGTacgt", "TGCAtgca")


def reverse_complement(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


_KMER_SENTINEL = np.uint64(1) << np.uint64(62)


def _seed_diagonal(qcodes, ref_index, k=15):
    """Median seed diagonal (j - i) of shared k-mers, or None."""
    qk = _forward_kmers(qcodes, k)
    qpos = np.nonzero(qk != _KMER_SENTINEL)[0]
    qk = qk[qpos]
    if len(qk) == 0:
        return None
    rk_codes, rk_pos = ref_index
    if len(rk_codes) == 0:
        return None
    idx = np.searchsorted(rk_codes, qk)
    idx = np.clip(idx, 0, len(rk_codes) - 1)
    hit = rk_codes[idx] == qk
    if not hit.any():
        return None
    diags = rk_pos[idx[hit]] - qpos[hit]
    return int(np.median(diags)), int(hit.sum())


def _forward_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    """Forward-strand packed k-mers (invalid windows -> sentinel removed)."""
    n = len(codes) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    acc = np.zeros(n, dtype=np.uint64)
    valid = np.ones(n, dtype=bool)
    for j in range(k):
        b = codes[j : j + n]
        valid &= b != 255
        acc = (acc << np.uint64(2)) | (b.astype(np.uint64) & np.uint64(3))
    return np.where(valid, acc, np.uint64(1) << np.uint64(62))


def build_ref_seed_index(rcodes: np.ndarray, k: int = 15):
    """Sorted (kmer, position) arrays for seed lookup."""
    rk = _forward_kmers(rcodes, k)
    pos = np.nonzero(rk != _KMER_SENTINEL)[0].astype(np.int64)
    rk = rk[pos]
    order = np.argsort(rk, kind="stable")
    return rk[order], pos[order]


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _traceback(tb, q, r, bi, bw, bstate, dlo):
    """Host traceback from the max cell to the local start; returns
    (cigar, q_start, r_start, q_end, r_end)."""
    ops = []
    i, w, state = int(bi), int(bw), int(bstate)
    q_end = i + 1
    r_end = i + dlo + w + 1
    while i >= 0:
        byte = int(tb[i, w])
        if state == 0:  # M
            j = i + dlo + w
            ops.append("=" if q[i] == r[j] else "X")
            pred = byte & 3
            i -= 1
            if pred == 0:
                break
            # pred: 1 -> M, 2 -> I, 3 -> D
            state = {1: 0, 2: 1, 3: 2}[pred]
        elif state == 1:  # I: consumes query, band w+1 in previous row
            ops.append("I")
            ext = (byte >> 2) & 1
            i -= 1
            w += 1
            state = 1 if ext else 0
        else:  # D: consumes ref, band w-1 same row
            ops.append("D")
            ext = (byte >> 3) & 1
            w -= 1
            state = 2 if ext else 0
    q_start = i + 1
    r_start = q_start + dlo + w
    ops.reverse()
    # run-length encode
    cigar = []
    for op in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1][1] += 1
        else:
            cigar.append([op, 1])
    return [tuple(c) for c in cigar], q_start, r_start, q_end, r_end


class Aligner:
    """Batched seed-chain-extend aligner against a fixed reference set."""

    def __init__(self, references: dict[str, str], band_width: int = 256, seed_k: int = 15):
        self.band_width = band_width
        self.seed_k = seed_k
        self.ref_names = list(references.keys())
        self.ref_seqs = {n: references[n] for n in self.ref_names}
        self.ref_codes = {n: encode_dna(references[n]) for n in self.ref_names}
        self.ref_seed_index = {
            n: build_ref_seed_index(self.ref_codes[n], seed_k)
            for n in self.ref_names
        }

    def map_sequence(self, seq: str, min_seeds: int = 2):
        """Map one query (both strands) against every reference; returns
        {ref_name: (strand, Alignment)} keeping the best-scoring strand."""
        return self.map_reads({"q": seq}, min_seeds).get("q", {})

    def _jobs_for(self, rid, seq, min_seeds, allowed=None):
        jobs = []  # (job_tag, strand, qseq, dlo) with job_tag = (rid, ref)
        names = self.ref_names if allowed is None else allowed
        for strand, qseq in (("+", seq), ("-", reverse_complement(seq))):
            qcodes = encode_dna(qseq)
            for name in names:
                sd = _seed_diagonal(qcodes, self.ref_seed_index[name], self.seed_k)
                if sd is None or sd[1] < min_seeds:
                    continue
                jobs.append(((rid, name), strand, qseq, sd[0]))
        return jobs

    def _run_jobs(self, jobs):
        """Execute alignment jobs grouped by query-length bucket."""
        W = self.band_width
        out = []
        by_bucket: dict = {}
        for job in jobs:
            lq = _bucket(len(job[2]))
            by_bucket.setdefault(lq, []).append(job)
        # cap traceback memory: chunk launches at ~64 MB of tb per batch
        for lq, bucket_jobs in by_bucket.items():
            chunk = max(1, (64 << 20) // (lq * W))
            for c0 in range(0, len(bucket_jobs), chunk):
                self._run_batch(bucket_jobs[c0 : c0 + chunk], lq, W, out)
        return out

    def _run_batch(self, batch, lq, W, out):
        # pad refs to a bucketed common length so compiles are reused
        lr_max = max(len(self.ref_codes[j[0][1]]) for j in batch)
        P = W + lq  # real-ref offset inside the padded buffer
        rlen = _bucket(lr_max + 2 * W + 2 * lq)
        qs, rs, qlens, dlos = [], [], [], []
        for tag, strand, qseq, diag in batch:
            qc = encode_dna(qseq)
            qpad = np.full(lq, 4, dtype=np.uint8)
            qpad[: len(qc)] = qc
            rc = self.ref_codes[tag[1]]
            rpad = np.full(rlen, 4, dtype=np.uint8)
            rpad[P : P + len(rc)] = rc
            # clamp band start: diagonals from "whole query before ref" to
            # "band starts at the last ref base"
            dlo = int(np.clip(diag - W // 2, -(lq - 1), max(len(rc) - 1, 0)))
            qs.append(qpad)
            rs.append(rpad)
            qlens.append(len(qc))
            dlos.append(dlo)
        # pad the batch dimension to a bucket so vmapped jits are reused
        n_pad = _bucket(len(batch), 8) - len(batch)
        for _ in range(n_pad):
            qs.append(np.full(lq, 4, dtype=np.uint8))
            rs.append(np.full(rlen, 4, dtype=np.uint8))
            qlens.append(0)
            dlos.append(0)
        tb, best, bi, bw, bs = _select_sw_engine()(
            np.stack(qs),
            np.stack(rs),
            np.asarray(qlens, np.int32),
            np.asarray(dlos, np.int32),
            W,
        )
        tb = np.asarray(tb)
        best = np.asarray(best)
        bi = np.asarray(bi)
        bw = np.asarray(bw)
        bs = np.asarray(bs)
        for bidx, (tag, strand, qseq, _diag) in enumerate(batch):
            if bi[bidx] < 0 or best[bidx] <= 0:
                continue
            qc = encode_dna(qseq)
            rc = self.ref_codes[tag[1]]
            cigar, q0, r0, q1, r1 = _traceback(
                tb[bidx], qc,
                np.concatenate([rc, np.full(W + lq, 4, np.uint8)]),
                bi[bidx], bw[bidx], bs[bidx], dlos[bidx],
            )
            aln = Alignment(
                q_start=q0, q_end=q1, r_start=r0, r_end=r1,
                score=int(best[bidx]), cigar=cigar,
                q_len=len(qseq), r_len=len(rc),
            )
            out.append((tag, strand, qseq, aln))

    def map_reads(self, reads: dict[str, str], min_seeds: int = 2, ref_subsets=None):
        """Map many reads in shared batched kernel launches; returns
        {read_id: {ref: (strand, Alignment)}}. `ref_subsets` optionally
        restricts each read to {read_id: [ref names]} (used to batch many
        independent per-cluster mapping problems into one launch set)."""
        jobs = []
        for rid, seq in reads.items():
            allowed = None if ref_subsets is None else ref_subsets.get(rid)
            jobs.extend(self._jobs_for(rid, seq, min_seeds, allowed))
        results: dict = {}
        for (rid, name), strand, _qseq, aln in self._run_jobs(jobs):
            per_read = results.setdefault(rid, {})
            prev = per_read.get(name)
            if prev is None or aln.score > prev[1].score:
                per_read[name] = (strand, aln)
        return results
