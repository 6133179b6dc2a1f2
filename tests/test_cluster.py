"""Path clustering semantics, ported from the reference's
tests/test_path_finding.py assertion corpus."""

import json
import os

import pytest

from amira_tpu.cluster import (
    cluster_adjacent_paths,
    construct_node_index,
    get_AMR_anchors,
    get_full_paths,
    get_singleton_paths,
    split_into_subpaths,
)
from amira_tpu.graph import GeneMerGraph

REF_TESTS = "/root/reference/tests"


def _run_full_paths(reads, gene, k=3, threshold=1, positions=None):
    graph = GeneMerGraph(reads, k, positions)
    nodes = graph.get_nodes_containing(gene)
    node_index = construct_node_index(dict(graph.get_readNodes()))
    calls = dict(graph.get_reads())
    calls.update(
        {r + "_reverse": graph.reverse_list_of_genes(calls[r]) for r in list(calls)}
    )
    anchors = get_AMR_anchors(graph, [n.hash for n in nodes])
    full_blocks, seen, covs = get_full_paths(
        graph, node_index, anchors, threshold, calls, gene
    )
    return graph, anchors, full_blocks, seen, covs


def test_find_full_paths_linear_simple():
    genes1 = ["+gene1", "-gene2", "+gene3", "-gene4", "-gene6", "+gene7"]
    genes2 = ["-gene2", "+gene3", "-gene4"]
    genes3 = ["-gene4", "-gene6", "+gene7"]
    _, _, full_blocks, _, _ = _run_full_paths(
        {"read1": genes1, "read2": genes1, "read3": genes2, "read4": genes3},
        "gene4",
    )
    assert len(full_blocks) == 1
    for k in full_blocks:
        assert full_blocks[k] == 4


def test_find_full_paths_no_adjacent_paths():
    genes1 = ["+gene1", "-gene2", "+gene4", "-gene4", "-gene4", "+gene7"]
    _, _, full_blocks, _, _ = _run_full_paths(
        {f"read{i}": genes1 for i in range(1, 5)}, "gene4"
    )
    assert len(full_blocks) == 1
    for k in full_blocks:
        assert full_blocks[k] == 4


def test_find_full_paths_linear_path_duplicates_simple():
    genes1 = ["+gene1", "-gene2", "+gene3", "-gene4", "+gene4", "-gene6", "+gene7"]
    genes2 = ["-gene2", "+gene3", "-gene4"]
    genes3 = ["+gene4", "-gene6", "+gene7"]
    _, _, full_blocks, _, _ = _run_full_paths(
        {"read1": genes1, "read2": genes1, "read3": genes2, "read4": genes3},
        "gene4",
    )
    assert len(full_blocks) == 1
    for k in full_blocks:
        assert len(k) == 6
        assert full_blocks[k] == 2


def test_find_full_paths_linear_path_contained():
    genes1 = ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6", "+gene7", "-gene8"]
    genes2 = [
        "+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "+gene3", "-gene4",
        "+gene5", "-gene6", "+gene7", "-gene8",
    ]
    _, _, full_blocks, _, _ = _run_full_paths(
        {"read1": genes1, "read2": genes1, "read3": genes2, "read4": genes2},
        "gene4",
    )
    assert len(full_blocks) == 2
    for k in full_blocks:
        assert len(k) in (5, 8)
        assert full_blocks[k] == 2


def test_find_full_paths_linear_path_contained_two():
    genes1 = [
        "+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6", "+gene7",
        "-gene8", "+gene3", "-gene4", "+gene5",
    ]
    genes2 = [
        "+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "+gene3", "-gene4",
        "+gene5", "-gene6", "+gene7", "-gene8", "+gene3", "-gene4", "+gene5",
    ]
    _, _, full_blocks, _, _ = _run_full_paths(
        {"read1": genes1, "read2": genes1, "read3": genes2, "read4": genes2},
        "gene4",
    )
    assert len(full_blocks) == 2
    for k in full_blocks:
        assert len(k) in (13, 10)
        assert full_blocks[k] == 2


def test_find_full_paths_singleton_and_singleton_paths():
    genes1 = ["+gene7", "-gene4", "-gene13"]
    graph, anchors, full_blocks, seen, covs = _run_full_paths(
        {"read1": genes1, "read2": genes1}, "gene7"
    )
    assert len(anchors) == 1
    assert len(full_blocks) == 0
    get_singleton_paths(graph, seen, anchors, full_blocks, covs)
    assert len(full_blocks) == 1
    for f in full_blocks:
        assert full_blocks[f] == 2


def test_cluster_adjacent_paths():
    adjacent_paths = {
        (0, 1, 2, 3, 4): {"read1"},
        (1, 2, 3, 4): {"read2"},
        (2, 3, 4): {"read3"},
        (5, 6, 3, 4): {"read4", "read5"},
        (6, 3, 4): {"read6"},
        (5, 3, 2, 4): {"read7"},
        (3, 4): {"read8"},
    }
    clusters = cluster_adjacent_paths(adjacent_paths, upstream=True)
    assert len(clusters) == 3
    assert (2, 3, 4) in clusters
    assert (6, 3, 4) in clusters
    assert (5, 3, 2, 4) in clusters


def test_cluster_adjacent_paths_overlapping():
    adjacent_paths = {
        (0, 1, 2, 3, 4, 7, 8, 9, 10, 11, 12): {"read1", "read2"},
        (5, 1, 2, 3, 4, 7, 8, 9, 10, 11, 12): {"read3", "read4", "read5"},
        (5, 6, 2, 3, 4, 7, 8, 9, 10, 11, 12): {"read6", "read7"},
        (2, 3, 4, 7, 8, 9, 10): {"read8"},
    }
    clusters = cluster_adjacent_paths(adjacent_paths, upstream=True)
    assert len(clusters) == 4
    for key in adjacent_paths:
        assert key in clusters


@pytest.mark.skipif(
    not os.path.exists(f"{REF_TESTS}/complex_gene_calls_eight.json"),
    reason="reference fixtures unavailable",
)
def test_partial_internal_block_complex_fixture():
    """Real-sample parity fixture: dfrA17 in complex_gene_calls_eight
    (reference tests/test_path_finding.py:1086-1127)."""
    with open(f"{REF_TESTS}/complex_gene_calls_eight.json") as i:
        calls = json.load(i)
    with open(f"{REF_TESTS}/complex_gene_positions_eight.json") as i:
        positions = json.load(i)
    graph = GeneMerGraph(calls, 3, positions)
    nodes = []
    for gene in ["dfrA17"]:
        nodes += graph.get_nodes_containing(gene)
    node_index = construct_node_index(dict(graph.get_readNodes()))
    gene_calls = dict(graph.get_reads())
    gene_calls.update(
        {
            r + "_reverse": graph.reverse_list_of_genes(gene_calls[r])
            for r in list(gene_calls)
        }
    )
    anchors = get_AMR_anchors(graph, [n.hash for n in nodes])
    full_blocks, seen, covs = get_full_paths(
        graph, node_index, anchors, 1, gene_calls, "dfrA17"
    )
    finalAlleles, _path_reads = split_into_subpaths(
        graph, "dfrA17", full_blocks, covs, {}, 188
    )
    assert len(full_blocks) == 3
    assert len(finalAlleles) == 2
    for f in full_blocks:
        assert len(f) in (6, 3)
    sizes = sorted(len(v) for v in finalAlleles.values())
    assert sizes == [52, 69]
