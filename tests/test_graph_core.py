"""Core gene-mer graph semantics, mirroring the reference's assertion corpus
(tests/test_gene_mer_graph.py topologies)."""

import numpy as np
import pytest

from amira_tpu.graph import GeneMerGraph
from amira_tpu.ops.hashing import node_hash_from_signed_seq
from amira_tpu.vocab import GeneVocab, reverse_tokens


def test_vocab_roundtrip():
    v = GeneVocab()
    t = v.encode_gene("+geneA")
    assert t > 0
    assert v.decode_gene(t) == "+geneA"
    t2 = v.encode_gene("-geneA")
    assert t2 == -t
    with pytest.raises(ValueError):
        v.encode_gene("geneA")
    with pytest.raises(ValueError):
        v.encode_gene("+")


def test_canonical_hash_symmetry():
    v = GeneVocab()
    fwd = v.encode_read(["+g1", "-g2", "+g3"])
    rc = reverse_tokens(fwd)
    assert node_hash_from_signed_seq(fwd) == node_hash_from_signed_seq(rc)
    other = v.encode_read(["+g1", "-g2", "-g3"])
    assert node_hash_from_signed_seq(fwd) != node_hash_from_signed_seq(other)


def test_simple_linear_graph():
    reads = {"read1": ["+g1", "-g2", "+g3", "-g4", "+g5"]}
    g = GeneMerGraph(reads, 3)
    # 3 windows -> 3 nodes, 2 adjacencies -> 4 directed edge records
    assert g.get_total_number_of_nodes() == 3
    assert g.get_total_number_of_edges() == 4
    for n in g.all_nodes():
        assert n.coverage == 1
        assert n.reads == ["read1"]
    assert len(g.get_readNodes()["read1"]) == 3


def test_duplicate_reads_coverage():
    reads = {
        "r1": ["+g1", "-g2", "+g3", "-g4"],
        "r2": ["+g1", "-g2", "+g3", "-g4"],
    }
    g = GeneMerGraph(reads, 3)
    assert g.get_total_number_of_nodes() == 2
    for n in g.all_nodes():
        assert n.coverage == 2
        assert set(n.reads) == {"r1", "r2"}
    for e in g.get_edges().values():
        assert e.coverage == 2


def test_reverse_complement_read_same_nodes():
    fwd = ["+g1", "-g2", "+g3", "-g4"]
    rc = ["+g4", "-g3", "+g2", "-g1"]
    g1 = GeneMerGraph({"r1": fwd}, 3)
    g2 = GeneMerGraph({"r1": rc}, 3, vocab=g1.vocab)
    assert set(g1.get_nodes()) == set(g2.get_nodes())
    assert set(g1.get_edges()) == set(g2.get_edges())


def test_short_reads_collected():
    reads = {"long": ["+a", "+b", "+c"], "short": ["+a", "+b"]}
    g = GeneMerGraph(reads, 3)
    assert g.get_total_number_of_nodes() == 1
    assert g.get_short_read_annotations() == {"short": ["+a", "+b"]}


def test_degree_and_neighbors():
    reads = {
        "r1": ["+a", "+b", "+c", "+d"],
        "r2": ["+a", "+b", "+c", "+e"],
    }
    g = GeneMerGraph(reads, 3)
    # nodes: abc (shared), bcd, bce
    assert g.get_total_number_of_nodes() == 3
    abc = None
    for n in g.all_nodes():
        if n.coverage == 2:
            abc = n
    assert abc is not None
    assert g.get_degree(abc) == 2
    nbrs = g.get_all_neighbor_hashes(abc)
    assert len(nbrs) == 2


def test_components_and_removal():
    reads = {
        "r1": ["+a", "+b", "+c", "+d"],
        "r2": ["+x", "+y", "+z", "+w"],
    }
    g = GeneMerGraph(reads, 3)
    assert g.get_number_of_component() == 2
    # removing one component's nodes leaves the other intact
    comp = g.components()[0]
    for n in g.get_nodes_in_component(comp):
        g.remove_node(n)
    g.assign_component_ids()
    assert g.get_number_of_component() == 1


def test_filter_graph_marks_reads_for_correction():
    reads = {
        "r1": ["+a", "+b", "+c", "+d"],
        "r2": ["+a", "+b", "+c"],
        "r3": ["+a", "+b", "+c"],
    }
    g = GeneMerGraph(reads, 3)
    # abc coverage 3; bcd coverage 1
    g.filter_graph(2, 1)
    assert g.get_total_number_of_nodes() == 1
    assert g.get_total_number_of_edges() == 0
    assert "r1" in g.get_reads_to_correct()
    nodes_r1 = g.get_readNodes()["r1"]
    assert nodes_r1[1] is None and nodes_r1[0] is not None


def test_nodes_containing():
    reads = {"r1": ["+amrA", "+b", "+c", "+d"]}
    g = GeneMerGraph(reads, 3)
    hits = g.get_nodes_containing("amrA")
    assert len(hits) == 1
    with pytest.raises(AssertionError):
        g.get_nodes_containing("+amrA")


def test_get_genes_in_unitig_roundtrip():
    genes = ["+a", "-b", "+c", "-d", "+e", "+f"]
    g = GeneMerGraph({"r1": genes}, 3)
    path = g.get_readNodes()["r1"]
    unitig = g.get_genes_in_unitig(path)
    assert unitig == genes or unitig == g.reverse_list_of_genes(genes)


def test_annotation_for_read_roundtrip():
    genes = ["+a", "-b", "+c", "-d", "+e"]
    g = GeneMerGraph({"r1": genes}, 3)
    nodes = g.get_readNodes()["r1"]
    dirs = g.get_readNodeDirections()["r1"]
    rebuilt = g.get_annotation_for_read(nodes, dirs, "r1")
    assert rebuilt == genes


def test_remove_short_linear_paths():
    reads = {}
    # a well-covered core path
    for i in range(5):
        reads[f"core{i}"] = ["+a", "+b", "+c", "+d", "+e", "+f"]
    # one read branching off to a short dead end
    reads["tip"] = ["+a", "+b", "+c", "+q"]
    g = GeneMerGraph(reads, 3)
    n_before = g.get_total_number_of_nodes()
    removed = g.remove_short_linear_paths(3)
    assert len(removed) >= 1
    assert g.get_total_number_of_nodes() < n_before


def test_correct_reads_trims_boundary_holes():
    """A bad gene near the read end produces boundary holes, which are
    trimmed (not re-threaded), matching the reference."""
    reads = {}
    for i in range(5):
        reads[f"core{i}"] = ["+a", "+b", "+c", "+d", "+e", "+f"]
    reads["noisy"] = ["+a", "+b", "+c", "+q", "+e", "+f"]
    positions = {
        r: [(j * 100, j * 100 + 99) for j in range(len(reads[r]))] for r in reads
    }
    fastq = {r: {"sequence": "A" * 700, "quality": "I" * 700} for r in reads}
    g = GeneMerGraph(reads, 3, positions)
    g.filter_graph(2, 1)
    corrected, corrected_pos = g.correct_reads(fastq)
    assert corrected["noisy"] == ["+a", "+b", "+c"]
    assert len(corrected_pos["noisy"]) == 3


def test_correct_reads_rethreads_interior_hole():
    core = ["+a", "+b", "+c", "+d", "+e", "+f", "+g", "+h"]
    reads = {f"core{i}": list(core) for i in range(5)}
    reads["noisy"] = ["+a", "+b", "+c", "+d", "+X", "+f", "+g", "+h"]
    positions = {
        r: [(j * 100, j * 100 + 99) for j in range(len(reads[r]))] for r in reads
    }
    fastq = {r: {"sequence": "A" * 900, "quality": "I" * 900} for r in reads}
    g = GeneMerGraph(reads, 3, positions)
    g.filter_graph(2, 1)
    corrected, corrected_pos = g.correct_reads(fastq)
    assert corrected["noisy"] == core
    assert len(corrected_pos["noisy"]) == 8
    # untouched reads pass through unchanged
    assert corrected["core0"] == core
