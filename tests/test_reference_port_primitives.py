"""Ports of the reference's primitive-layer assertion corpus
(tests/test_gene.py, test_gene_mer.py, test_read.py, test_node.py,
test_edge.py in the upstream checkout).

The reference tests exercise Gene/GeneMer/Read/Node/Edge objects; this
repo's equivalents are the signed-token vocabulary (vocab.py), the
device windowing/hash kernels (ops/hashing.py), and the graph's
Node/Edge wrappers (graph.py). Each reference assertion is re-expressed
against those APIs; the inputs and expected values are the behavioral
spec.
"""

import numpy as np
import pytest

from amira_tpu.graph import GeneMerGraph
from amira_tpu.ops.hashing import edge_key, gene_hash, genemer_windows
from amira_tpu.vocab import GeneVocab, pack_reads, reverse_tokens


def _windows(genes, k, vocab=None):
    # NB: an empty GeneVocab is falsy (defines __len__), so `or` won't do
    vocab = vocab if vocab is not None else GeneVocab()
    toks, lens = pack_reads([vocab.encode_read(genes)])
    out = genemer_windows(toks, lens, k)
    valid = np.asarray(out["valid"][0])
    return (
        np.asarray(out["node_hash"][0])[valid],
        np.asarray(out["direction"][0])[valid],
        vocab,
    )


# ------------------------------------------------------------------ Gene
# reference tests/test_gene.py (37 tests: construction, strand parsing,
# names containing +/- characters, equality, reverse_strand, hashing)


def test_gene_construction_positive_and_negative_strand():
    v = GeneVocab()
    t1 = v.encode_gene("+gene1")
    t2 = v.encode_gene("-gene2")
    assert t1 > 0 and v.decode_gene(t1) == "+gene1"
    assert t2 < 0 and v.decode_gene(t2) == "-gene2"


@pytest.mark.parametrize(
    "stranded",
    ["+gene+1", "-gene+1", "+gene-1", "-gene-1", "+gene~1", "-gene~1"],
)
def test_gene_strand_chars_in_name_preserved(stranded):
    # reference test_gene.py:59-130 — only the FIRST character is the
    # strand; +/- later in the name belong to the name
    v = GeneVocab()
    t = v.encode_gene(stranded)
    assert v.decode_gene(t) == stranded
    assert (t > 0) == (stranded[0] == "+")


@pytest.mark.parametrize("bad", ["gene1", "~gene1", " +gene1"])
def test_gene_invalid_strand_rejected(bad):
    # reference test_gene.py:131-170 asserts construction fails without a
    # leading +/- strand character
    v = GeneVocab()
    with pytest.raises(ValueError):
        v.encode_gene(bad)


def test_gene_empty_name_rejected():
    v = GeneVocab()
    for bad in ("+", "-"):
        with pytest.raises(ValueError):
            v.encode_gene(bad)


def test_gene_equality_same_name_same_strand():
    v = GeneVocab()
    assert v.encode_gene("+gene1") == v.encode_gene("+gene1")
    assert v.encode_gene("-gene1") == v.encode_gene("-gene1")


def test_gene_equality_different_strand_or_name():
    v = GeneVocab()
    assert v.encode_gene("+gene1") != v.encode_gene("-gene1")
    assert v.encode_gene("+gene1") != v.encode_gene("+gene2")


def test_gene_reverse_strand():
    # reference reverse_strand: +gene1 <-> -gene1 (an involution)
    v = GeneVocab()
    t = v.encode_gene("+gene1")
    assert v.decode_gene(-t) == "-gene1"
    assert v.decode_gene(-(-t)) == "+gene1"


def test_gene_hash_antisymmetric():
    # Gene.__hash__ = hash(name) * strand (construct_gene.py:91-93):
    # h(+g) == -h(-g), and h is nonzero for real genes
    v = GeneVocab()
    tp = v.encode_gene("+gene1")
    hp = int(np.asarray(gene_hash(np.asarray([tp], dtype=np.int32)))[0])
    hm = int(np.asarray(gene_hash(np.asarray([-tp], dtype=np.int32)))[0])
    assert hp == -hm != 0


def test_gene_hash_distinct_names():
    v = GeneVocab()
    toks = np.asarray(
        [v.encode_gene(f"+gene{i}") for i in range(100)], dtype=np.int32
    )
    hashes = np.asarray(gene_hash(toks))
    assert len(set(hashes.tolist())) == 100


# --------------------------------------------------------------- GeneMer
# reference tests/test_gene_mer.py (23 tests: rc construction, canonical
# choice, direction assignment, hashing across k sizes)


def test_rc_genemer_literal():
    # define_rc_geneMer([+gene1, -gene2, +gene3]) == [-gene3, +gene2, -gene1]
    v = GeneVocab()
    toks = v.encode_read(["+gene1", "-gene2", "+gene3"])
    rc = reverse_tokens(toks)
    assert [v.decode_gene(t) for t in rc] == ["-gene3", "+gene2", "-gene1"]


def test_rc_genemer_empty():
    assert reverse_tokens(np.asarray([], dtype=np.int32)).tolist() == []


def test_rc_genemer_involution():
    v = GeneVocab()
    toks = v.encode_read(["+gene1", "-gene2", "+gene3", "-gene4"])
    assert np.array_equal(reverse_tokens(reverse_tokens(toks)), toks)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_canonical_genemer_fw_rc_same_hash(k):
    # the canonical gene-mer of a window and of its reverse-complement are
    # the same object (choose_canonical_geneMer) -> identical node hash,
    # opposite observed direction
    genes = ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5"][:k]
    rc_genes = [
        ("-" if g[0] == "+" else "+") + g[1:] for g in reversed(genes)
    ]
    v = GeneVocab()
    h_fw, d_fw, _ = _windows(genes, k, v)
    h_rc, d_rc, _ = _windows(rc_genes, k, v)
    assert h_fw.tolist() == h_rc.tolist()
    assert int(d_fw[0]) == -int(d_rc[0])


def test_canonical_genemer_direction_is_plus_or_minus_one():
    h, d, _ = _windows(["+gene1", "-gene2", "+gene3"], 3)
    assert int(d[0]) in (1, -1)


def test_genemer_hash_same_for_equal_genemers():
    v = GeneVocab()
    h1, _, _ = _windows(["+gene1", "-gene2", "+gene3"], 3, v)
    h2, _, _ = _windows(["+gene1", "-gene2", "+gene3"], 3, v)
    assert h1.tolist() == h2.tolist()


def test_genemer_hash_differs_for_different_genemers():
    v = GeneVocab()
    h1, _, _ = _windows(["+gene1", "-gene2", "+gene3"], 3, v)
    h2, _, _ = _windows(["+gene1", "-gene2", "+gene4"], 3, v)
    h3, _, _ = _windows(["+gene1", "-gene2", "-gene3"], 3, v)
    assert h1.tolist() != h2.tolist()
    assert h1.tolist() != h3.tolist()


def test_genemer_size_one_canonicalizes_strands():
    # k=1: (+gene1) and (-gene1) collapse to one canonical node with
    # opposite directions (reference test_gene_mer.py:103-126)
    v = GeneVocab()
    h_fw, d_fw, _ = _windows(["+gene1"], 1, v)
    h_rc, d_rc, _ = _windows(["-gene1"], 1, v)
    assert h_fw.tolist() == h_rc.tolist()
    assert int(d_fw[0]) == -int(d_rc[0])


# ------------------------------------------------------------------ Read
# reference tests/test_read.py (10 tests: construction, conversion,
# windowing across k)


def test_read_tokenization_roundtrip():
    genes = ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6"]
    v = GeneVocab()
    toks = v.encode_read(genes)
    assert len(toks) == 6
    assert v.decode_read(toks) == genes


def test_read_empty_genes():
    v = GeneVocab()
    assert v.encode_read([]).tolist() == []
    assert v.decode_read(np.asarray([], dtype=np.int32)) == []


@pytest.mark.parametrize(
    "k,expected",
    [(1, 5), (2, 4), (3, 3), (4, 2), (5, 1), (6, 0), (7, 0)],
)
def test_read_genemer_counts_across_k(k, expected):
    # reference test_read.py geneMer counts: L - k + 1 windows, zero when
    # k exceeds the read length (short-read semantics)
    genes = ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5"]
    h, _, _ = _windows(genes, k)
    assert len(h) == expected


def test_read_genemer_windows_match_manual_slices():
    # each window's canonical hash equals the hash of the standalone
    # gene-mer built from the same slice
    genes = ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5"]
    k = 3
    v = GeneVocab()
    h, _, _ = _windows(genes, k, v)
    for i in range(len(genes) - k + 1):
        hw, _, _ = _windows(genes[i : i + k], k, v)
        assert h[i] == hw[0]


def test_short_read_collected_not_windowed():
    # reads shorter than k produce no nodes but are tracked as short reads
    g = GeneMerGraph(
        {"long": ["+g1", "-g2", "+g3"], "short": ["+g1", "-g2"]}, 3
    )
    assert "short" not in g.get_readNodes()
    assert "short" in g.get_short_read_annotations()


# ------------------------------------------------------------------ Node
# reference tests/test_node.py (15 tests: coverage, read lists, edge-hash
# lists). The repo's Node is graph-managed; the same invariants are
# asserted on graph-built nodes.


def _one_node():
    g = GeneMerGraph({"read1": ["+gene1", "-gene2", "+gene3"]}, 3)
    return g, next(iter(g.all_nodes()))


def test_node_initial_state_and_hash():
    g, node = _one_node()
    assert node.__hash__() == node.hash
    assert node.get_node_coverage() == 1  # one observation
    assert node.get_list_of_reads() == ["read1"]


def test_node_increment_coverage():
    _, node = _one_node()
    before = node.get_node_coverage()
    assert node.increment_node_coverage() == before + 1
    assert node.get_node_coverage() == before + 1


def test_node_add_read():
    _, node = _one_node()
    node.add_read("read2")
    assert node.get_list_of_reads() == ["read1", "read2"]
    # duplicate adds are ignored (reference stores a set)
    node.add_read("read2")
    assert node.get_list_of_reads() == ["read1", "read2"]


def test_node_remove_read_present_and_absent():
    _, node = _one_node()
    node.remove_read("read1")
    assert node.get_list_of_reads() == []
    # removing a read that is not there leaves the node unchanged
    node.remove_read("read_missing")
    assert node.get_list_of_reads() == []


def test_node_edge_hash_lists_no_duplicates():
    # reference test_node.py:104-185: adding the same edge hash twice must
    # not duplicate it; forward and backward lists are separate
    g = GeneMerGraph(
        {
            "r1": ["+g1", "-g2", "+g3", "-g4", "+g5"],
            "r2": ["+g1", "-g2", "+g3", "-g4", "+g5"],
        },
        3,
    )
    for node in g.all_nodes():
        fwd = node.get_forward_edge_hashes()
        bwd = node.get_backward_edge_hashes()
        assert len(fwd) == len(set(fwd))
        assert len(bwd) == len(set(bwd))
        assert not set(fwd) & set(bwd)
        assert len(fwd) + len(bwd) == g.get_degree(node)


# ------------------------------------------------------------------ Edge
# reference tests/test_edge.py (8 tests: construction, coverage,
# equality/hash incl. the complement split)


def _edge_key1(src_h, src_d, tgt_h, tgt_d):
    return int(
        np.asarray(
            edge_key(
                np.asarray([src_h], dtype=np.uint64),
                np.asarray([src_d], dtype=np.int8),
                np.asarray([tgt_h], dtype=np.uint64),
                np.asarray([tgt_d], dtype=np.int8),
            )
        )[0]
    )


def test_edge_init_properties():
    g = GeneMerGraph({"read1": ["+g1", "-g2", "+g3", "-g4"]}, 3)
    (n1h, n2h) = g.get_readNodes()["read1"]
    edges = g.get_edges_between_nodes(
        g.get_node_by_hash(n1h), g.get_node_by_hash(n2h)
    )
    assert edges
    e = edges[0]
    assert e.get_sourceNode() == n1h
    assert e.get_targetNode() == n2h
    assert e.get_sourceNodeDirection() in (1, -1)
    assert e.get_targetNodeDirection() in (1, -1)
    assert e.get_edge_coverage() == 1


def test_edge_hash_same_edges():
    # identical reads -> identical per-position edge keys
    h1, d1, _ = _windows(["+gene1", "-gene2", "+gene3", "-gene4"], 3)
    keys_a = [
        _edge_key1(h1[i], d1[i], h1[i + 1], d1[i + 1])
        for i in range(len(h1) - 1)
    ]
    keys_b = [
        _edge_key1(h1[i], d1[i], h1[i + 1], d1[i + 1])
        for i in range(len(h1) - 1)
    ]
    assert keys_a == keys_b


def test_edge_hash_same_complement_edges():
    # reference test_edge.py:137-170: traversing the RC read backwards
    # produces the SAME edge hashes; node hash lists mirror-reverse
    genes = ["+gene1", "-gene2", "+gene3", "-gene4"]
    rc_genes = ["+gene4", "-gene3", "+gene2", "-gene1"]
    v = GeneVocab()
    h1, d1, _ = _windows(genes, 3, v)
    h2, d2, _ = _windows(rc_genes, 3, v)
    assert h1.tolist() == h2.tolist()[::-1]
    keys1 = [
        _edge_key1(h1[i], d1[i], h1[i + 1], d1[i + 1])
        for i in range(len(h1) - 1)
    ]
    keys2 = [
        _edge_key1(h2[i + 1], -d2[i + 1], h2[i], -d2[i])
        for i in range(len(h2) - 1)
    ]
    assert keys1 == keys2


def test_edge_hash_different_edges():
    v = GeneVocab()
    h1, d1, _ = _windows(["+gene1", "-gene2", "+gene3", "-gene4"], 3, v)
    h2, d2, _ = _windows(["+gene4", "-gene5", "+gene6", "-gene7"], 3, v)
    keys1 = {
        _edge_key1(h1[i], d1[i], h1[i + 1], d1[i + 1])
        for i in range(len(h1) - 1)
    }
    keys2 = {
        _edge_key1(h2[i], d2[i], h2[i + 1], d2[i + 1])
        for i in range(len(h2) - 1)
    }
    assert not keys1 & keys2


def test_edge_companion_reverse_edge_is_distinct():
    # Edge.__hash__ keeps the companion reverse edge separate: the key of
    # (s, ds) -> (t, dt) differs from (t, -dt) -> (s, -ds)
    h, d, _ = _windows(["+gene1", "-gene2", "+gene3", "-gene4"], 3)
    fwd = _edge_key1(h[0], d[0], h[1], d[1])
    companion = _edge_key1(h[1], -d[1], h[0], -d[0])
    assert fwd != companion


def test_edge_graph_rc_read_same_edge_keys():
    # graph level: a read and its reverse-complement build identical node
    # AND edge tables
    genes = ["+g1", "-g2", "+g3", "-g4", "+g5"]
    rc = [("-" if x[0] == "+" else "+") + x[1:] for x in reversed(genes)]
    v = GeneVocab()
    g1 = GeneMerGraph({"r": genes}, 3, vocab=v)
    g2 = GeneMerGraph({"r": rc}, 3, vocab=v)
    assert set(g1.get_nodes()) == set(g2.get_nodes())
    assert set(g1.get_edges()) == set(g2.get_edges())


def test_edge_increment_coverage():
    g = GeneMerGraph({"read1": ["+g1", "-g2", "+g3", "-g4"]}, 3)
    e = next(iter(g.get_edges().values()))
    before = e.get_edge_coverage()
    e.coverage += 1
    assert e.get_edge_coverage() == before + 1
