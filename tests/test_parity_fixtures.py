"""Additional real-data parity fixtures ported from the reference's
tests/test_gene_mer_graph.py (lines 5094-5212)."""

import json
import os

import pytest

from amira_tpu.bubbles import (
    filter_paths_between_bubble_starts,
    get_all_paths_between_junctions_in_component,
    get_minhashes_for_paths,
    identify_potential_bubble_starts,
)
from amira_tpu.cluster import construct_node_index, get_paths_for_gene
from amira_tpu.graph import GeneMerGraph
from amira_tpu.io import parse_fastq

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/test_path_calls.json"),
    reason="reference fixtures unavailable",
)


def _load(name):
    with open(f"{REF}/{name}") as i:
        return json.load(i)


def test_path_finding_between_junctions():
    """reference tests/test_gene_mer_graph.py:5094-5117: exactly two
    alternative junction-to-junction paths survive filtering."""
    calls = _load("test_path_calls.json")
    graph = GeneMerGraph(calls, 3)
    graph.filter_graph(3, 1)
    starts = identify_potential_bubble_starts(graph)
    max_distance = graph.get_kmerSize() * 3
    checked = 0
    for component in graph.components():
        if component not in starts:
            continue
        unique_paths = get_all_paths_between_junctions_in_component(
            graph, starts[component], max_distance
        )
        filtered = filter_paths_between_bubble_starts(graph, unique_paths)
        assert len(filtered) == 2
        checked += 1
    assert checked >= 1


def test_minhashes_for_paths_containment():
    """reference :5119-5156 — the two bubble arms' minimizer sets are ~91%
    mutually contained (semantic parity: our hash differs from sourmash, so
    assert the containment band rather than the exact value)."""
    calls = _load("test_path_calls.json")
    positions = _load("test_path_positions.json")
    graph = GeneMerGraph(calls, 3, positions)
    fastq_data = parse_fastq(f"{REF}/test_1.fastq.gz")
    starts = identify_potential_bubble_starts(graph)
    max_distance = graph.get_kmerSize() * 3
    checked = 0
    for component in graph.components():
        if component not in starts:
            continue
        unique_paths = get_all_paths_between_junctions_in_component(
            graph, starts[component], max_distance
        )
        filtered = filter_paths_between_bubble_starts(graph, unique_paths)
        sorted_filtered = sorted(filtered, key=lambda x: len(x[0]), reverse=True)
        path_minimizers = get_minhashes_for_paths(graph, sorted_filtered, fastq_data)
        m1 = set()
        m2 = set()
        for mh in path_minimizers[tuple(n[0] for n in sorted_filtered[0][0])]:
            m1.update(mh.hashes)
        for mh in path_minimizers[tuple(n[0] for n in sorted_filtered[1][0])]:
            m2.update(mh.hashes)
        assert len(m1 & m2) / len(m1) > 0.85
        assert len(m1 & m2) / len(m2) > 0.85
        # and the arms are not identical
        assert len(m1 & m2) / len(m1) < 1.0
        checked += 1
    assert checked >= 1


def test_get_subpaths_long_collapsed():
    """reference :5159-5187 — mphA on complex fixture three: 4 final paths
    with read supports {151, 101, 129, 131}."""
    calls = _load("complex_gene_calls_three.json")
    positions = _load("complex_gene_positions_three.json")
    graph = GeneMerGraph(calls, 3, positions)
    gene = "mphANG_0479861"
    nodes = graph.get_nodes_containing(gene)
    hashes = [n.hash for n in nodes]
    node_index = construct_node_index(dict(graph.get_readNodes()))
    reads_with_gene = graph.collect_reads_in_path(set(hashes))
    subset = {r: graph.get_reads()[r] for r in reads_with_gene}
    subset.update(
        {
            r + "_reverse": graph.reverse_list_of_genes(subset[r])
            for r in list(subset)
        }
    )
    paths, path_coverages = get_paths_for_gene(
        graph, node_index, subset, set(hashes), 1, gene
    )
    assert len(paths) == 4
    assert all(paths[p] in {151, 101, 129, 131} for p in paths)


def test_get_paths_bubble_starts_k5():
    """reference :5189-5211 — complex fixture four at k=5: 4 junction starts
    per component, 2 unique paths at distance 15."""
    calls = _load("complex_gene_calls_four.json")
    positions = _load("complex_gene_positions_four.json")
    graph = GeneMerGraph(calls, 5, positions)
    starts = identify_potential_bubble_starts(graph)
    for component in starts:
        assert len(starts[component]) == 4
        unique_paths = get_all_paths_between_junctions_in_component(
            graph, starts[component], 15
        )
        assert len(unique_paths) == 2
