"""Smoke sweep: every available real-sample fixture builds, cleans and
clusters without error, with sane structure."""

import json
import os

import pytest

from amira_tpu.graph import GeneMerGraph

REF = "/root/reference/tests"
FIXTURES = [
    n
    for n in ("one", "three", "four", "five", "six", "seven", "eight", "nine")
    if os.path.exists(f"{REF}/complex_gene_calls_{n}.json")
]


@pytest.mark.parametrize("name", FIXTURES)
def test_fixture_graph_builds_and_filters(name):
    with open(f"{REF}/complex_gene_calls_{name}.json") as i:
        calls = json.load(i)
    pos_path = f"{REF}/complex_gene_positions_{name}.json"
    positions = json.load(open(pos_path)) if os.path.exists(pos_path) else None
    graph = GeneMerGraph(calls, 3, positions)
    n_nodes = graph.get_total_number_of_nodes()
    assert n_nodes > 0
    # coverage bookkeeping: total node coverage == total window occurrences
    total_cov = sum(n.coverage for n in graph.all_nodes())
    total_windows = sum(
        max(len(calls[r]) - 2, 0) for r in calls if len(calls[r]) >= 3
    )
    assert total_cov == total_windows
    # every read's node list reconstructs its gene annotation
    rid = max(
        (r for r in calls if len(calls[r]) >= 3), key=lambda r: len(calls[r])
    )
    rebuilt = graph.get_annotation_for_read(
        graph.get_readNodes()[rid], graph.get_readNodeDirections()[rid], rid
    )
    assert rebuilt == calls[rid]
    # filtering never leaves dangling edges
    graph.filter_graph(3, 1)
    for node in graph.all_nodes():
        for key in node.fwd_edges + node.bwd_edges:
            assert key in graph.get_edges()
    for edge in graph.get_edges().values():
        assert edge.src in graph.get_nodes()
        assert edge.tgt in graph.get_nodes()
