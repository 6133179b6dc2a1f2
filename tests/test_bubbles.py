"""Bubble-popping and sketch semantics."""

import numpy as np

from amira_tpu.bubbles import (
    filter_paths_between_bubble_starts,
    get_all_paths_between_junctions_in_component,
    identify_potential_bubble_starts,
    longest_common_sublist,
    separate_paths_by_terminal_nodes,
)
from amira_tpu.graph import GeneMerGraph
from amira_tpu.sketch import MinHash, canonical_kmer_codes, encode_dna
from amira_tpu.stree import SequenceIndex


def _bubble_graph(n_high=6, n_low=2):
    """Two alternative paths a..e between shared flanks: high-coverage via
    '+m', low-coverage via '+x'."""
    high = ["+a", "+b", "+c", "+m", "+d", "+e", "+f"]
    low = ["+a", "+b", "+c", "+x", "+d", "+e", "+f"]
    reads = {}
    for i in range(n_high):
        reads[f"h{i}"] = list(high)
    for i in range(n_low):
        reads[f"l{i}"] = list(low)
    positions = {
        r: [(j * 100, j * 100 + 99) for j in range(len(reads[r]))] for r in reads
    }
    rng = np.random.RandomState(0)
    seq = "".join(rng.choice(list("ACGT"), size=1600))
    fastq = {r: {"sequence": seq, "quality": "I" * len(seq)} for r in reads}
    return GeneMerGraph(reads, 3, positions), fastq


def test_identify_bubble_starts():
    g, _ = _bubble_graph()
    starts = identify_potential_bubble_starts(g)
    # one component; the two junction nodes appear with their directions
    assert len(starts) == 1
    comp_starts = list(starts.values())[0]
    assert len(comp_starts) >= 2


def test_paths_between_junctions_and_filtering():
    g, _ = _bubble_graph()
    starts = list(identify_potential_bubble_starts(g).values())[0]
    paths = get_all_paths_between_junctions_in_component(g, starts, 12)
    # the two arms of the bubble
    assert len(paths) == 2
    filtered = filter_paths_between_bubble_starts(g, paths)
    assert len(filtered) == 2
    binned = separate_paths_by_terminal_nodes(sorted(filtered, key=lambda x: len(x[0])))
    assert len(binned) == 1
    pair_paths = list(binned.values())[0]
    assert len(pair_paths) == 2


def test_bubble_correction_end_to_end():
    g, fastq = _bubble_graph()
    reads, positions, path_coverages, mpc = g.correct_low_coverage_paths(
        fastq, set(), 1, 5, set(), True
    )
    high = ["+a", "+b", "+c", "+m", "+d", "+e", "+f"]
    # the low-coverage reads were corrected onto the high-coverage arm
    for i in range(2):
        assert reads[f"l{i}"] == high, reads[f"l{i}"]
        assert len(positions[f"l{i}"]) == 7
    for i in range(6):
        assert reads[f"h{i}"] == high


def test_bubble_correction_never_deletes_amr_genes():
    g, fastq = _bubble_graph()
    reads, positions, _, _ = g.correct_low_coverage_paths(
        fastq, {"x"}, 1, 5, set(), True
    )
    low = ["+a", "+b", "+c", "+x", "+d", "+e", "+f"]
    for i in range(2):
        assert reads[f"l{i}"] == low


def test_longest_common_sublist():
    a = ["x", "a", "b", "c", "y"]
    b = ["q", "a", "b", "c", "z"]
    sub, (sa, ea), (sb, eb) = longest_common_sublist(a, b)
    assert sub == ["a", "b", "c"]
    assert (sa, ea) == (1, 3)
    assert (sb, eb) == (1, 3)
    sub, _, _ = longest_common_sublist(["1"], ["2"])
    assert sub == []


def test_minhash_containment():
    m1 = MinHash(ksize=11, scaled=1)
    m2 = MinHash(ksize=11, scaled=1)
    seq = "ACGTACGGTTACGATCGATCGGCTAGCTA" * 4
    m1.add_sequence(seq)
    m2.add_sequence(seq)
    assert m1.contained_by(m2) == 1.0
    m3 = MinHash(ksize=11, scaled=1)
    m3.add_sequence("TTTTTTTTTTTTTTTTTTTTTTTA")
    assert m1.contained_by(m3) == 0.0


def test_canonical_kmer_reverse_complement():
    fwd = encode_dna("ACGTACGGTTA")
    rc = encode_dna("TAACCGTACGT")
    assert canonical_kmer_codes(fwd, 11)[0] == canonical_kmer_codes(rc, 11)[0]
    # non-ACGT windows are dropped
    assert len(canonical_kmer_codes(encode_dna("NACGTACGTACG"), 11)) == 1


def test_sequence_index_queries():
    idx = SequenceIndex({"r1": [1, 2, 3, 4], "r2": [2, 3], "r3": [5, 6]})
    assert idx.find_ids([2, 3]) == {"r1", "r2"}
    assert idx.find_ids([3, 2]) == set()
    assert idx.suffixes_from(2) == {"r1": [2, 3, 4], "r2": [2, 3]}
    assert idx.find_all([9]) == []


def test_read_kmer_index_span_lookup_matches_minhash():
    """span_hashes over a per-read retained-k-mer index equals hashing the
    slice directly (windows, validity, and scaled filter all identical)."""
    import numpy as np

    from amira_tpu.sketch import (
        MinHash,
        read_kept_kmer_index,
        span_hashes,
    )

    rng = np.random.RandomState(7)
    bases = np.array(list("ACGTN"))
    seq = "".join(rng.choice(bases, size=3000, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
    idx = read_kept_kmer_index(seq, ksize=11, scaled=10)
    for s, e in [(0, 2999), (5, 400), (100, 110), (2990, 2999), (17, 17), (250, 1800)]:
        mh = MinHash(ksize=11, scaled=10)
        mh.add_sequence(seq[s : e + 1])
        got = set(span_hashes(idx, s, e, ksize=11).tolist())
        assert got == mh.hashes, (s, e)


def test_batched_path_filter_matches_scalar():
    """The rolling-hash containment screen equals the posting-index filter
    on random path sets — including nested containment chains, reversed
    (no-dir-flip) containment, and mutual equal-length reversal pairs."""
    import random

    import numpy as np

    from amira_tpu.bubbles import (
        _filter_paths_scalar,
        filter_paths_between_bubble_starts,
    )

    class _FakeNode:
        def __init__(self, cov):
            self.coverage = cov

    class _FakeGraph:
        def __init__(self):
            self._cov = {}

        def get_node_by_hash(self, h):
            return _FakeNode(self._cov.setdefault(h, (h % 7) + 1))

    for seed in range(6):
        rng = random.Random(seed)
        hashes = [rng.getrandbits(64) for _ in range(12)]
        paths = set()
        for _ in range(40):
            ln = rng.randint(2, 8)
            p = tuple(
                (rng.choice(hashes), rng.choice((1, -1))) for _ in range(ln)
            )
            paths.add(p)
            if rng.random() < 0.5 and ln > 3:
                # guaranteed containment: a contiguous slice as its own path
                s = rng.randrange(0, ln - 2)
                e = rng.randint(s + 2, ln)
                paths.add(p[s:e])
            if rng.random() < 0.3:
                paths.add(tuple(reversed(p)))  # mutual reversal pair
        unique_paths = list(paths)
        g1, g2 = _FakeGraph(), _FakeGraph()
        got = filter_paths_between_bubble_starts(g1, list(unique_paths))
        want = _filter_paths_scalar(g2, list(unique_paths))
        key = lambda fp: sorted((p, c) for p, c in fp)  # noqa: E731
        assert key(got) == key(want), seed


def test_batch_read_kmer_index_matches_scalar():
    """batch_read_kept_kmer_index equals the per-read function exactly —
    positions and hashes — including N bases, short reads, and empties."""
    import numpy as np

    from amira_tpu.sketch import batch_read_kept_kmer_index, read_kept_kmer_index

    rng = np.random.RandomState(4)
    bases = np.array(list("ACGTN"))
    seqs = {}
    for i in range(50):
        ln = int(rng.randint(0, 300))
        seqs[f"r{i}"] = "".join(
            rng.choice(bases, size=ln, p=[0.24, 0.24, 0.24, 0.24, 0.04])
        )
    got = batch_read_kept_kmer_index(seqs, ksize=11, scaled=10)
    for r, s in seqs.items():
        pos, h = read_kept_kmer_index(s, ksize=11, scaled=10)
        gp, gh = got[r]
        assert np.array_equal(gp, pos), r
        assert np.array_equal(gh, h), r


def test_filter_path_matrices_matches_tuple_filter():
    """The production fast path (containment filter straight on the
    frontier search's int32 row matrices, tuples for survivors only)
    returns exactly the same (path, coverage) set as the tuple-based
    filter on random noisy graphs."""
    import random

    from amira_tpu.bubbles import (
        filter_path_matrices,
        filter_paths_between_bubble_starts,
        get_all_paths_between_junctions_in_component,
        identify_potential_bubble_starts,
    )

    checked = 0
    for seed in (1, 5, 9, 13):
        rng = random.Random(seed)
        reads = {}
        genes = [f"g{i}" for i in range(8)]
        for r in range(300):
            ln = rng.randint(3, 8)
            reads[f"r{r}"] = [
                rng.choice("+-") + rng.choice(genes) for _ in range(ln)
            ]
        graph = GeneMerGraph(reads, 3)
        for _comp, starts in identify_potential_bubble_starts(graph).items():
            levels, hash_list = get_all_paths_between_junctions_in_component(
                graph, starts, 12, return_matrices=True
            )
            tuples = get_all_paths_between_junctions_in_component(
                graph, starts, 12
            )
            got = filter_path_matrices(graph, levels, hash_list)
            want = filter_paths_between_bubble_starts(graph, tuples)
            assert sorted(got) == sorted(want), seed
            checked += len(tuples)
    assert checked > 0


def test_node_sketch_short_span_empty():
    """A (read, span) shorter than the sketch k-mer size contributes no
    hashes (span_hashes slice semantics); the batched global-searchsorted
    assembly must clamp, not crash (regression: negative repeat counts)."""
    from amira_tpu.bubbles import get_minhashes_for_paths
    from amira_tpu.graph import GeneMerGraph

    reads = {
        "r1": ["+a", "+b", "+c", "+d"],
        "r2": ["+a", "+b", "+c", "+d"],
        "r3": ["+a", "+b", "+x", "+d"],
    }
    # one gene span of 4 bases (< ksize 11) on every read
    positions = {
        r: [(0, 3), (4, 120), (121, 240), (241, 360)] for r in reads
    }
    fastq = {
        r: {"sequence": "ACGTACGTAC" * 40, "quality": "I" * 400}
        for r in reads
    }
    graph = GeneMerGraph(reads, 3, positions)
    paths = []
    for comp in graph.components():
        nodes = [n.hash for n in graph.get_nodes_in_component(comp)]
        if len(nodes) >= 2:
            paths.append(
                (tuple((h, 1) for h in nodes[:2]), 1.0)
            )
    assert paths
    mins = get_minhashes_for_paths(graph, paths, fastq)
    for key, mhs in mins.items():
        for mh in mhs:
            assert isinstance(mh.hashes, set)
