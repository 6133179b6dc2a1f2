"""Contiguous-subsequence search over collections of symbol sequences.

The reference leans on a generalized suffix tree (`suffix_tree.Tree`) purely
for `find_all(pattern)`-style queries: which sequences contain this exact
contiguous pattern, and what is the suffix starting at the match
(path_finding_utils.py:79-123). Here the sequences are interned to int32
tokens in ONE concatenated array with per-sequence offsets; occurrence
queries probe the rarest pattern symbol's posting array and verify whole
windows with a single vectorized gather-compare — the tensor reformulation
of the suffix-tree queries, with identical match sets and output order.
"""

from __future__ import annotations

import numpy as np


def find_sublist_indices(main_list, sublist):
    """All (start, end-inclusive) occurrences of sublist in main_list
    (path_finding_utils.py:68-77)."""
    indices = []
    m = len(sublist)
    for i in range(len(main_list) - m + 1):
        if main_list[i : i + m] == sublist:
            indices.append((i, i + m - 1))
    return indices


def is_sublist(long_list, sub_list):
    assert isinstance(long_list, list) and isinstance(sub_list, list)
    m = len(sub_list)
    return any(
        sub_list == long_list[i : i + m] for i in range(len(long_list) - m + 1)
    )


class SequenceIndex:
    """Index of sequences supporting contains/suffix queries.

    Replaces `suffix_tree.Tree` for the access patterns the reference uses:
      * find_ids(pattern): ids of sequences containing the pattern
      * find_all(pattern): (id, start) pairs for every occurrence
      * suffixes_from(symbol): per id, the longest suffix starting at an
        occurrence of `symbol` (get_suffixes_from_initial_tree semantics).

    Layout: every sequence's symbols interned to int32 and concatenated into
    `tok`; `off[i]:off[i+1]` is sequence i's slice and `owner[p]` its index.
    Posting arrays per symbol hold absolute token positions in scan order,
    so outputs keep the legacy (insertion, position) order exactly.
    """

    def __init__(self, sequences: dict, symbols=None):
        """`symbols`: optional set restricting which symbols get posting
        lists — queries must then only start with an indexed symbol (used by
        the anchor sub-indexes, which are only ever queried by anchor)."""
        self.sequences = {k: list(v) for k, v in sequences.items()}
        self._restricted = symbols is not None
        self._memo: dict = {}  # pattern tuple -> find_all result
        self._sids = list(self.sequences.keys())
        self._sym_ids: dict = {}
        if symbols is not None:
            # restricted indexes (per-anchor sub-indexes) are only queried
            # by their declared symbols, almost always single-symbol — a
            # plain posting scan beats the intern/sort machinery there
            self._postings_py: dict = {}
            for sid, seq in self.sequences.items():
                for i, sym in enumerate(seq):
                    if sym in symbols:
                        self._postings_py.setdefault(sym, []).append((sid, i))
            return
        flat: list = []
        offsets = np.zeros(len(self._sids) + 1, dtype=np.int64)
        for i, sid in enumerate(self._sids):
            flat.extend(self.sequences[sid])
            offsets[i + 1] = len(flat)
        # node hashes are full-range unsigned 64-bit python ints: force
        # uint64 first (a plain asarray silently casts >2^63 ints to FLOAT,
        # corrupting identities); strings take the unicode dtype; anything
        # heterogeneous falls back to per-token dict interning
        arr = None
        try:
            arr = np.asarray(flat, dtype=np.uint64)
        except (OverflowError, ValueError, TypeError):
            try:
                arr = np.asarray(flat)
                if arr.dtype.kind not in ("i", "u", "U", "S"):
                    arr = None
            except (ValueError, TypeError):
                arr = None
        if arr is not None and arr.ndim != 1:
            arr = None  # tuple-valued symbols: numpy stacked them into 2D
        if arr is None and flat:
            # (hash, dir) pair symbols — the bubble path filter's case:
            # hashes are full-range uint64, dirs are +-1, so no single
            # numpy integer dtype holds both columns. Intern via a
            # two-column lexsort instead of the per-token dict loop (which
            # dominated the bubble sweep at 100k reads).
            try:
                a = np.fromiter(
                    (s[0] for s in flat), dtype=np.uint64, count=len(flat)
                )
                b = np.fromiter(
                    (s[1] for s in flat), dtype=np.int64, count=len(flat)
                )
                lens = np.fromiter(
                    (len(s) for s in flat), dtype=np.int64, count=len(flat)
                )
            except (TypeError, ValueError, OverflowError, IndexError):
                a = None
            if (
                a is not None
                and type(flat[0]) is tuple
                and bool((lens == 2).all())
            ):
                order = np.lexsort((b, a))
                sa, sb = a[order], b[order]
                boundary = np.concatenate(
                    [[True], (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])]
                )
                gid_sorted = np.cumsum(boundary) - 1
                ids = np.empty(len(flat), np.int32)
                ids[order] = (gid_sorted).astype(np.int32)
                reps = order[boundary]
                self._sym_ids = {
                    (int(a[i]), int(b[i])): g
                    for g, i in enumerate(reps.tolist())
                }
                self.tok = ids
                arr = False  # handled
        if arr is None:
            ids = np.empty(len(flat), dtype=np.int32)
            for k, sym in enumerate(flat):
                sym_id = self._sym_ids.get(sym)
                if sym_id is None:
                    sym_id = len(self._sym_ids)
                    self._sym_ids[sym] = sym_id
                ids[k] = sym_id
            self.tok = ids
        elif arr is False or not flat:
            if not flat:
                self.tok = np.zeros(0, dtype=np.int32)
        else:
            uniq, inverse = np.unique(arr, return_inverse=True)
            self._sym_ids = {v: i for i, v in enumerate(uniq.tolist())}
            self.tok = inverse.astype(np.int32)
        self.off = offsets
        lengths = np.diff(offsets)
        self.owner = np.repeat(
            np.arange(len(self._sids), dtype=np.int64), lengths
        )
        # postings: one stable sort groups every symbol's positions in scan
        # order (scan order == legacy per-(sid, pos) posting order)
        self._postings: dict = {}
        if len(self.tok):
            order = np.argsort(self.tok, kind="stable")
            grouped = self.tok[order]
            starts = np.concatenate(
                [[0], np.nonzero(np.diff(grouped))[0] + 1, [len(grouped)]]
            )
            wanted = (
                None
                if symbols is None
                else {self._sym_ids[s] for s in symbols if s in self._sym_ids}
            )
            for a, b in zip(starts[:-1], starts[1:]):
                sym_id = int(grouped[a])
                if wanted is not None and sym_id not in wanted:
                    continue
                self._postings[sym_id] = np.sort(order[a:b])

    def find_all_abs(self, pattern):
        """Vectorized occurrence search: (abs_starts, seq_indices) numpy
        arrays in scan order (the internal form of find_all; unrestricted
        indexes only)."""
        assert not self._restricted
        pattern = list(pattern)
        empty = (np.zeros(0, np.int64), np.zeros(0, np.int64))
        if not pattern:
            return empty
        m = len(pattern)
        pid = np.empty(m, dtype=np.int32)
        for k, sym in enumerate(pattern):
            sym_id = self._sym_ids.get(sym)
            if sym_id is None:
                return empty
            pid[k] = sym_id
        # probe the rarest symbol's postings
        probe_at = 0
        if m > 1:
            best = None
            for k in range(m):
                p = self._postings.get(int(pid[k]))
                sz = 0 if p is None else len(p)
                if best is None or sz < best:
                    probe_at, best = k, sz
                    if sz == 0:
                        break
        posting = self._postings.get(int(pid[probe_at]))
        if posting is None or len(posting) == 0:
            return empty
        starts = posting - probe_at
        seq_idx = self.owner[posting]
        valid = (starts >= self.off[seq_idx]) & (
            starts + m <= self.off[seq_idx + 1]
        )
        starts, seq_idx = starts[valid], seq_idx[valid]
        if m > 1 and len(starts):
            windows = self.tok[starts[:, None] + np.arange(m)]
            ok = (windows == pid[None, :]).all(axis=1)
            starts, seq_idx = starts[ok], seq_idx[ok]
        return starts, seq_idx

    def find_all(self, pattern):
        """Every (seq_id, start_index) where pattern occurs contiguously,
        in the legacy (insertion, position) posting order.

        Results are memoized per pattern (callers re-query the same cores/
        paths across blocks); callers must not mutate the returned list."""
        pattern = list(pattern)
        if not pattern:
            return []
        key = tuple(pattern)
        cached = self._memo.get(key)
        if cached is not None:
            return cached
        if self._restricted:
            # restricted index: probe the first symbol's posting scan and
            # verify windows directly (queries start at a declared symbol)
            m = len(pattern)
            out = []
            for sid, pos in self._postings_py.get(pattern[0], ()):
                seq = self.sequences[sid]
                if seq[pos : pos + m] == pattern:
                    out.append((sid, pos))
            self._memo[key] = out
            return out
        starts, seq_idx = self.find_all_abs(pattern)
        rel = starts - self.off[seq_idx]
        out = [
            (self._sids[si], int(r)) for si, r in zip(seq_idx.tolist(), rel.tolist())
        ]
        self._memo[key] = out
        return out

    def find_ids(self, pattern) -> set:
        return {sid for sid, _ in self.find_all(pattern)}

    def posting_pairs(self, symbol):
        """All (seq_id, position) occurrences of one symbol in scan order
        (the raw posting list; unrestricted indexes only)."""
        assert not self._restricted
        sym_id = self._sym_ids.get(symbol)
        posting = None if sym_id is None else self._postings.get(sym_id)
        if posting is None:
            return []
        seq_idx = self.owner[posting]
        rel = posting - self.off[seq_idx]
        return [
            (self._sids[si], pos)
            for si, pos in zip(seq_idx.tolist(), rel.tolist())
        ]

    def suffixes_from(self, symbol) -> dict:
        """For each sequence containing `symbol`, the longest suffix starting
        at an occurrence of it (i.e. from the FIRST occurrence), mirroring
        path_finding_utils.py:88-100."""
        suffixes: dict = {}
        if self._restricted:
            pairs = self._postings_py.get(symbol, ())
        else:
            sym_id = self._sym_ids.get(symbol)
            posting = None if sym_id is None else self._postings.get(sym_id)
            if posting is None:
                return suffixes
            seq_idx = self.owner[posting]
            rel = posting - self.off[seq_idx]
            pairs = [
                (self._sids[si], pos)
                for si, pos in zip(seq_idx.tolist(), rel.tolist())
            ]
        for sid, pos in pairs:
            cand = self.sequences[sid][pos:]
            if sid not in suffixes or len(cand) > len(suffixes[sid]):
                suffixes[sid] = cand
        return suffixes
