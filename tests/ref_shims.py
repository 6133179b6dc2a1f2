"""Faithful in-process stand-ins for the upstream implementation's external
dependencies (sourmash, suffix_tree, pysam), so the UPSTREAM bubble-popping
and clustering layers (/root/reference/amira/construct_graph.py:1482-2959,
path_finding_utils.py) can run here and be compared against this repo's
implementations output-for-output.

- ``suffix_tree.Tree``: the upstream code uses the `suffix-tree` package
  only as a substring-search engine over symbol sequences:
  ``Tree(dict_of_sequences)`` then ``tree.find_all(pattern)`` yielding
  ``(sequence_id, path)`` per occurrence, where ``str(path)`` is the
  space-joined SUFFIX from the match start to the end of that sequence
  plus a ``"$"`` terminator (path_finding_utils.py:88-123 parses exactly
  this shape). The stand-in reproduces those semantics with direct scans —
  identical answers, no generalized suffix tree required.
- ``sourmash.MinHash``: wraps this repo's FracMinHash
  (amira_tpu/sketch.py) behind sourmash's constructor/attribute surface
  (``MinHash(n=0, ksize, scaled)``, ``add_sequence(seq, force=True)``,
  ``.hashes``, ``contained_by``). The hash function differs from
  sourmash's murmur64 — containment *ratios* drive every upstream decision
  (construct_graph.py:1797-1808), and both sides of a cross-implementation
  comparison share this same sketch primitive, so gate decisions match
  exactly.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"


class _Path:
    """Stand-in for suffix_tree's path-to-leaf object: the suffix of the
    sequence starting at the match position; ``str`` appends the library's
    ``$`` terminator (parsed away by path_finding_utils.py:91-94)."""

    __slots__ = ("_symbols",)

    def __init__(self, symbols):
        self._symbols = symbols

    def __str__(self):
        return " ".join(str(s) for s in self._symbols) + " $"

    def __len__(self):  # pragma: no cover - parity with the library
        return len(self._symbols) + 1


class Tree:
    """Substring-search stand-in for ``suffix_tree.Tree``."""

    def __init__(self, d):
        self._seqs = {k: list(v) for k, v in d.items()}

    def find_all(self, pattern):
        pattern = list(pattern)
        m = len(pattern)
        out = []
        if m == 0:
            return out
        first = pattern[0]
        for rid, seq in self._seqs.items():
            n = len(seq)
            for i in range(n - m + 1):
                if seq[i] == first and seq[i : i + m] == pattern:
                    out.append((rid, _Path(seq[i:])))
        return out

    def find(self, pattern):
        pattern = list(pattern)
        m = len(pattern)
        for seq in self._seqs.values():
            for i in range(len(seq) - m + 1):
                if seq[i : i + m] == pattern:
                    return True
        return False


def _make_sourmash_module():
    from amira_tpu import sketch

    class MinHash:
        __slots__ = ("_mh",)

        def __init__(self, n=0, ksize=11, scaled=1, **_kw):
            self._mh = sketch.MinHash(ksize=ksize, scaled=scaled)

        def add_sequence(self, seq, force=False):
            self._mh.add_sequence(seq, force=force)

        @property
        def hashes(self):
            return self._mh.hashes

        def contained_by(self, other):
            return self._mh.contained_by(other._mh)

    mod = types.ModuleType("sourmash")
    mod.MinHash = MinHash
    return mod


def install_reference_shims():
    """Install the stand-in modules (only where the real package is absent)
    and put the reference checkout on sys.path. Returns the upstream
    GeneMerGraph class."""
    import importlib

    if "sourmash" not in sys.modules:
        try:
            importlib.import_module("sourmash")
        except ImportError:
            sys.modules["sourmash"] = _make_sourmash_module()
    elif not hasattr(sys.modules["sourmash"], "MinHash"):
        # upgrade an earlier loader's empty placeholder in place (upstream
        # modules hold a reference to this module object)
        sys.modules["sourmash"].MinHash = _make_sourmash_module().MinHash
    if "suffix_tree" not in sys.modules:
        try:
            importlib.import_module("suffix_tree")
        except ImportError:
            mod = types.ModuleType("suffix_tree")
            mod.Tree = Tree
            sys.modules["suffix_tree"] = mod
    else:
        mod = sys.modules["suffix_tree"]
        if getattr(mod, "Tree", None) is object:
            # an earlier loader installed a non-functional placeholder;
            # upgrade it in place so upstream modules bound to it work
            mod.Tree = Tree
    for name in ("joblib", "tqdm", "pysam"):
        try:
            importlib.import_module(name)
        except ImportError:
            mod = types.ModuleType(name)
            if name == "joblib":
                class _Parallel:
                    def __init__(self, *a, **k):
                        pass

                    def __call__(self, tasks):
                        return [f(*args, **kw) for f, args, kw in tasks]

                mod.Parallel = _Parallel
                mod.delayed = lambda f: (
                    lambda *a, **k: (f, a, k)
                )
            if name == "tqdm":
                mod.tqdm = lambda x, **k: x
            sys.modules[name] = mod
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # upstream modules may have been imported earlier with the
    # non-functional suffix_tree.Tree=object placeholder bound in; reload
    # so they bind the working stand-in
    import amira.construct_graph as ref_cg

    if getattr(ref_cg, "Tree", None) is not Tree and not hasattr(
        ref_cg.Tree, "find_all"
    ):
        import amira.path_finding_utils as ref_pf

        importlib.reload(ref_pf)
        ref_cg = importlib.reload(ref_cg)
    return ref_cg.GeneMerGraph
