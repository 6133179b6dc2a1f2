"""FracMinHash sketches of DNA sequences (sourmash replacement).

The reference gates bubble corrections on minimizer containment between the
read subsequences spanning two graph paths (construct_graph.py:2148-2194,
1797-1808: MinHash(ksize=11, scaled=10), containment > 0.80). Only the
containment *ratios* matter, not the specific hash function, so this
implementation 2-bit-packs canonical k-mers and mixes them with splitmix64 —
fully vectorized in numpy (and batchable in JAX for large sweeps).
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

_BASE_CODE = np.full(256, 255, dtype=np.uint8)
for b, c in zip(b"ACGT", range(4)):
    _BASE_CODE[b] = c
for b, c in zip(b"acgt", range(4)):
    _BASE_CODE[b] = c


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    x = x * _GOLDEN + np.uint64(1)
    x = (x ^ (x >> np.uint64(30))) * _MIX1
    x = (x ^ (x >> np.uint64(27))) * _MIX2
    return x ^ (x >> np.uint64(31))


def encode_dna(seq: str) -> np.ndarray:
    """ACGT -> 0..3 uint8; other characters -> 255 (invalid)."""
    raw = np.frombuffer(seq.encode("ascii", "replace"), dtype=np.uint8)
    return _BASE_CODE[raw]


def canonical_kmer_codes(codes: np.ndarray, k: int) -> np.ndarray:
    """Canonical 2-bit-packed k-mer codes for every valid window.

    Windows containing non-ACGT bases are dropped (sourmash force=True
    semantics). Requires 2k <= 62.
    """
    n = len(codes) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(codes, k)  # (n, k)
    valid = ~(win == 255).any(axis=1)
    win = win[valid].astype(np.uint64)
    if len(win) == 0:
        return np.zeros(0, dtype=np.uint64)
    shifts = (np.uint64(2) * np.arange(k - 1, -1, -1, dtype=np.uint64))
    fwd = (win << shifts).sum(axis=1, dtype=np.uint64)
    rc_win = (np.uint64(3) - win)[:, ::-1]
    rc = (rc_win << shifts).sum(axis=1, dtype=np.uint64)
    return np.minimum(fwd, rc)


_EMPTY_U64 = np.zeros(0, dtype=np.uint64)
_EMPTY_I64 = np.zeros(0, dtype=np.int64)


def read_kept_kmer_index(seq: str, ksize: int = 11, scaled: int = 10):
    """(window_positions, hashes) of the RETAINED canonical k-mers of one
    sequence, sorted by position.

    Lets a caller sketch any subsequence span [s, e] with two searchsorted
    lookups instead of re-hashing the slice: the windows of seq[s:e+1] are
    exactly the windows of seq at positions s..e-ksize+1 (same bases, same
    validity), so the span's retained-hash multiset is hashes[lo:hi] with
    lo = first position >= s, hi = first position > e-ksize+1. Sequences
    are immutable for a pipeline run, so one index per read serves every
    node sketch of every cleaning iteration."""
    codes = encode_dna(seq)
    n = len(codes) - ksize + 1
    if n <= 0:
        return _EMPTY_I64, _EMPTY_U64
    bad = codes >= 4
    cs = np.zeros(len(codes) + 1, np.int64)
    np.cumsum(bad, out=cs[1:])
    valid = (cs[ksize:] - cs[:-ksize]) == 0
    cc = np.where(bad, 0, codes).astype(np.uint64)
    fwd = np.zeros(n, dtype=np.uint64)
    rc = np.zeros(n, dtype=np.uint64)
    for j in range(ksize):
        sl = cc[j : j + n]
        fwd |= sl << np.uint64(2 * (ksize - 1 - j))
        rc |= (np.uint64(3) - sl) << np.uint64(2 * j)
    h = _splitmix64_np(np.minimum(fwd, rc))
    keep = valid
    if scaled > 1:
        keep = keep & (h < np.uint64(2**64 // scaled))
    pos = np.nonzero(keep)[0].astype(np.int64)
    return pos, h[pos]


def batch_read_kept_kmer_index(seqs, ksize: int = 11, scaled: int = 10):
    """read_kept_kmer_index for MANY reads in one vectorized pass: one
    joined buffer ("\\n" separators invalidate boundary windows), one
    windowing/hash/filter sweep, then per-read (positions, hashes) slices
    of the shared arrays. Value-identical per read to the scalar function
    (pinned by tests/test_bubbles.py) — the bubble sweep's first sketch
    pass hashed tens of thousands of reads one call at a time.

    `seqs`: {read_id: sequence}. Returns {read_id: (pos, hashes)}.

    Processes ~1 MB of sequence per inner pass: the k windowing passes
    then stay cache-resident (one giant buffer made the sweep MEMORY-bound
    and slower than the per-read calls it replaced)."""
    ids = list(seqs)
    if not ids:
        return {}
    out: dict = {}
    CHUNK = 1 << 20
    group: list = []
    size = 0
    for r in ids:
        group.append(r)
        size += len(seqs[r]) + 1
        if size >= CHUNK:
            out.update(_batch_kept_kmer_group(seqs, group, ksize, scaled))
            group, size = [], 0
    if group:
        out.update(_batch_kept_kmer_group(seqs, group, ksize, scaled))
    return out


def _batch_kept_kmer_group(seqs, ids, ksize: int, scaled: int):
    lens = np.fromiter((len(seqs[r]) for r in ids), np.int64, len(ids))
    joined = "\n".join(seqs[r] for r in ids)
    codes = encode_dna(joined)
    n = len(codes) - ksize + 1
    out: dict = {}
    if n <= 0:
        return {r: (_EMPTY_I64, _EMPTY_U64) for r in ids}
    bad = codes >= 4
    cs = np.zeros(len(codes) + 1, np.int64)
    np.cumsum(bad, out=cs[1:])
    valid = (cs[ksize:] - cs[:-ksize]) == 0
    cc = np.where(bad, 0, codes).astype(np.uint64)
    fwd = np.zeros(n, dtype=np.uint64)
    rc = np.zeros(n, dtype=np.uint64)
    for j in range(ksize):
        sl = cc[j : j + n]
        fwd |= sl << np.uint64(2 * (ksize - 1 - j))
        rc |= (np.uint64(3) - sl) << np.uint64(2 * j)
    h = _splitmix64_np(np.minimum(fwd, rc))
    keep = valid
    if scaled > 1:
        keep = keep & (h < np.uint64(2**64 // scaled))
    pos = np.nonzero(keep)[0].astype(np.int64)
    hk = h[pos]
    # read r occupies joined[starts[r] : starts[r] + lens[r]]
    starts = np.zeros(len(ids), np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    owner = np.searchsorted(starts, pos, side="right") - 1
    local = pos - starts[owner]
    bounds = np.searchsorted(owner, np.arange(len(ids) + 1))
    for i, r in enumerate(ids):
        lo, hi = bounds[i], bounds[i + 1]
        out[r] = (local[lo:hi], hk[lo:hi])
    return out


def span_hashes(index, s: int, e: int, ksize: int = 11) -> np.ndarray:
    """Retained hashes of the subsequence [s, e] (inclusive) from a
    read_kept_kmer_index — identical to hashing seq[s:e+1] directly."""
    pos, hashes = index
    lo = np.searchsorted(pos, s, side="left")
    hi = np.searchsorted(pos, e - ksize + 1, side="right")
    return hashes[lo:hi]


class MinHash:
    """FracMinHash: retains k-mer hashes below 2^64/scaled."""

    __slots__ = ("ksize", "scaled", "_hashes", "_max_hash", "_arr")

    def __init__(self, ksize: int = 11, scaled: int = 10):
        self.ksize = ksize
        self.scaled = scaled
        self._hashes: set[int] = set()
        self._max_hash = int(2**64 // scaled) if scaled > 1 else None
        # bulk producers (bubbles.get_minhashes_for_paths) deposit the
        # distinct hashes as a sorted uint64 array; the Python set
        # materializes lazily on first .hashes access — set construction
        # of millions of ints per sweep was a measured hot spot, and the
        # batched consumers only need array intersections
        self._arr = None

    def add_sequence(self, seq: str, force: bool = True):
        codes = encode_dna(seq)
        kmers = canonical_kmer_codes(codes, self.ksize)
        if len(kmers) == 0:
            return
        h = _splitmix64_np(kmers)
        if self._max_hash is not None:
            h = h[h < np.uint64(self._max_hash)]
        self.hashes.update(int(x) for x in np.unique(h))

    @property
    def hashes(self) -> set[int]:
        if self._arr is not None:
            self._hashes = set(self._arr.tolist())
            self._arr = None
        return self._hashes

    def add_many(self, other: "MinHash"):
        self.hashes.update(other.hashes)

    def contained_by(self, other: "MinHash") -> float:
        """|self ∩ other| / |self| (sourmash containment)."""
        if not self.hashes:
            return 0.0
        return len(self.hashes & other.hashes) / len(self.hashes)

    def jaccard(self, other: "MinHash") -> float:
        union = self.hashes | other.hashes
        if not union:
            return 0.0
        return len(self.hashes & other.hashes) / len(union)
