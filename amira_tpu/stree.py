"""Contiguous-subsequence search over collections of symbol sequences.

The reference leans on a generalized suffix tree (`suffix_tree.Tree`) purely
for `find_all(pattern)`-style queries: which sequences contain this exact
contiguous pattern, and what is the suffix starting at the match
(path_finding_utils.py:79-123). The sequences involved (reads in gene/node
space) are short, so an n-gram index + direct verification answers the same
queries with tensor-friendly machinery and no tree construction.
"""

from __future__ import annotations


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
    """Index of sequences supporting contains/suffix queries by first symbol.

    Replaces `suffix_tree.Tree` for the access patterns the reference uses:
      * find_ids(pattern): ids of sequences containing the pattern
      * find_all(pattern): (id, start) pairs for every occurrence
      * suffixes_from(symbol): per id, the longest suffix starting at an
        occurrence of `symbol` (get_suffixes_from_initial_tree semantics).
    """

    def __init__(self, sequences: dict, symbols=None):
        """`symbols`: optional set restricting which symbols get posting
        lists — queries must then only start with an indexed symbol (used by
        the anchor sub-indexes, which are only ever queried by anchor)."""
        self.sequences = {k: list(v) for k, v in sequences.items()}
        self._restricted = symbols is not None
        # posting lists: symbol -> list of (seq_id, position)
        self._postings: dict = {}
        if symbols is None:
            for sid, seq in self.sequences.items():
                for i, sym in enumerate(seq):
                    self._postings.setdefault(sym, []).append((sid, i))
        else:
            for sid, seq in self.sequences.items():
                for i, sym in enumerate(seq):
                    if sym in symbols:
                        self._postings.setdefault(sym, []).append((sid, i))

    def find_all(self, pattern):
        """Every (seq_id, start_index) where pattern occurs contiguously.

        Probes the posting list of the RAREST symbol in the pattern and
        verifies the window around each occurrence — the same match set (and
        the same (insertion, position) output order) as probing the first
        symbol, at a fraction of the candidates when the pattern contains a
        low-frequency node/gene. Restricted indexes fall back to the first
        symbol (other symbols have no postings by construction)."""
        pattern = list(pattern)
        if not pattern:
            return []
        m = len(pattern)
        probe_at = 0
        if not self._restricted and m > 1:
            best = len(self._postings.get(pattern[0], ()))
            for k in range(1, m):
                sz = len(self._postings.get(pattern[k], ()))
                if sz < best:
                    probe_at, best = k, sz
                    if sz == 0:
                        break
        out = []
        for sid, pos in self._postings.get(pattern[probe_at], ()):
            start = pos - probe_at
            if start < 0:
                continue
            seq = self.sequences[sid]
            if seq[start : start + m] == pattern:
                out.append((sid, start))
        return out

    def find_ids(self, pattern) -> set:
        return {sid for sid, _ in self.find_all(pattern)}

    def suffixes_from(self, symbol) -> dict:
        """For each sequence containing `symbol`, the longest suffix starting
        at an occurrence of it (i.e. from the FIRST occurrence), mirroring
        path_finding_utils.py:88-100."""
        suffixes: dict = {}
        for sid, pos in self._postings.get(symbol, ()):
            cand = self.sequences[sid][pos:]
            if sid not in suffixes or len(cand) > len(suffixes[sid]):
                suffixes[sid] = cand
        return suffixes
