"""Vectorized gene-mer hashing and canonicalization.

Reference semantics (amira/construct_gene_mer.py): a gene-mer is a window of k
stranded genes; its reverse complement is the reversed window with strands
flipped; the canonical form is the lexicographically smaller of the two
per-gene hash sequences, and the node identity is a hash of the canonical
sequence. The reference computes sha256-of-pickle per gene per window — here
each gene id is mixed once with splitmix64 and whole batches of windows are
canonicalized and hashed with pure vector ops, so the entire gene-mer
enumeration for a read set is a single fused XLA computation.

Identity semantics are preserved exactly (two windows map to the same node
iff their canonical stranded-gene sequences are equal, modulo the 2^-64
mix-hash collision probability); the *choice* of which orientation is
canonical differs from the reference (different hash function), which is
immaterial to the graph structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x):
    """splitmix64 finalizer over uint64 arrays (jnp or np)."""
    x = x * _GOLDEN + jnp.uint64(1)
    x = (x ^ (x >> jnp.uint64(30))) * _MIX1
    x = (x ^ (x >> jnp.uint64(27))) * _MIX2
    return x ^ (x >> jnp.uint64(31))


def gene_hash(tokens):
    """Signed 63-bit hash per signed gene token.

    h(+g) = -h(-g), mirroring Gene.__hash__ = hash(name) * strand
    (amira/construct_gene.py:91-93). Padding (0) hashes to 0.
    """
    tokens = jnp.asarray(tokens)
    ids = jnp.abs(tokens).astype(jnp.uint64)
    h = (splitmix64(ids) >> jnp.uint64(1)).astype(jnp.int64)  # 63-bit positive
    return jnp.sign(tokens).astype(jnp.int64) * h


def _combine_hash_seq(seq_hashes):
    """Collapse a (..., k) int64 hash sequence into one uint64 per window."""
    k = seq_hashes.shape[-1]
    acc = jnp.full(seq_hashes.shape[:-1], jnp.uint64(k), dtype=jnp.uint64)
    for j in range(k):
        acc = splitmix64(acc ^ seq_hashes[..., j].astype(jnp.uint64))
    return acc


def genemer_windows(tokens, lengths, k: int):
    """Enumerate canonicalized gene-mers for a padded read batch.

    Args:
      tokens:  (R, L) int32 signed gene tokens, 0-padded.
      lengths: (R,) int32 number of genes per read.
      k:       gene-mer size (static).

    Returns dict of (R, W) arrays with W = L - k + 1:
      node_hash: uint64 canonical gene-mer hash (node identity)
      direction: int8, +1 if the observed orientation is canonical else -1
                 (GeneMer.geneMerDirection, construct_gene_mer.py:64-70)
      valid:     bool, window fully inside the read
    Reads with < k genes produce no valid windows (the reference's
    "short reads", construct_graph.py:53-55).
    """
    tokens = jnp.asarray(tokens)
    lengths = jnp.asarray(lengths)
    R, L = tokens.shape
    W = L - k + 1
    if W <= 0:
        z = jnp.zeros((R, 0))
        return {
            "node_hash": z.astype(jnp.uint64),
            "direction": z.astype(jnp.int8),
            "valid": z.astype(bool),
        }

    h = gene_hash(tokens)  # (R, L) int64 signed
    # windows[..., j] = h[:, w + j]
    fwd = jnp.stack([h[:, j : j + W] for j in range(k)], axis=-1)  # (R, W, k)
    # rc sequence: reversed order, negated signs
    rc = -fwd[..., ::-1]
    # lexicographic fwd <= rc: find first position where they differ
    diff = fwd != rc  # (R, W, k)
    first = jnp.argmax(diff, axis=-1)  # first differing index (0 if none)
    fwd_at = jnp.take_along_axis(fwd, first[..., None], axis=-1)[..., 0]
    rc_at = jnp.take_along_axis(rc, first[..., None], axis=-1)[..., 0]
    fwd_is_canon = fwd_at <= rc_at  # ties (self-RC) impossible for odd k
    canon = jnp.where(fwd_is_canon[..., None], fwd, rc)
    node_hash = _combine_hash_seq(canon)  # (R, W) uint64
    direction = jnp.where(fwd_is_canon, 1, -1).astype(jnp.int8)
    widx = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = widx < (lengths[:, None] - (k - 1))
    return {"node_hash": node_hash, "direction": direction, "valid": valid}


def edge_key(src_hash, src_dir, tgt_hash, tgt_dir):
    """Canonical undirected-with-orientation edge identity.

    Mirrors Edge.__hash__ (amira/construct_edge.py:104-124): the key of the
    directed edge (s, d_s) -> (t, d_t) equals the key of (s, -d_s) -> (t, -d_t)
    but NOT the key of the companion reverse edge (t, -d_t) -> (s, -d_s).
    Implemented as a mix-hash of the sign-canonicalized pair
    (s*d_s, t*d_t) vs (-s*d_s, -t*d_t).
    """
    a = src_hash.astype(jnp.int64) * src_dir.astype(jnp.int64)
    b = tgt_hash.astype(jnp.int64) * tgt_dir.astype(jnp.int64)
    na, nb = -a, -b
    # lexicographic min of (a, b) vs (na, nb)
    take_neg = (na < a) | ((na == a) & (nb < b))
    ca = jnp.where(take_neg, na, a)
    cb = jnp.where(take_neg, nb, b)
    acc = splitmix64(jnp.uint64(2) ^ ca.astype(jnp.uint64))
    return splitmix64(acc ^ cb.astype(jnp.uint64))


def node_hash_from_signed_seq(seq: np.ndarray) -> int:
    """Host-side helper: canonical node hash for one signed-token gene-mer.

    Used by tests and by host code that needs to key a single gene-mer
    without launching a kernel.
    """
    seq = np.asarray(seq, dtype=np.int32)[None, :]
    out = genemer_windows(seq, np.asarray([seq.shape[1]], np.int32), seq.shape[1])
    return int(out["node_hash"][0, 0])
