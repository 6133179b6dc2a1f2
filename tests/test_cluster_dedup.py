"""Equivalence of the deduplicated clustering path with the per-read path.

Clustering scales with DISTINCT read sequences (cluster.py dedups node and
gene-call sequences and counts support with group weights); these fuzz tests
pin that every answer — sublist support counts and full-path discovery — is
identical to the undeduplicated formulation on randomized read sets with
heavy duplication, reverse twins, and palindromic calls."""

import numpy as np
import pytest

from amira_tpu.cluster import (
    _weighted_gene_index,
    get_all_sublists,
    get_full_paths,
    construct_node_index,
    get_AMR_anchors,
)
from amira_tpu.graph import GeneMerGraph
from amira_tpu.stree import SequenceIndex


def _reverse_calls(seq):
    return [("-" if g[0] == "+" else "+") + g[1:] for g in reversed(seq)]


def _random_calls(rng, n_reads, gene_pool, dup_bias=0.7):
    """Random gene-call dict with many duplicate sequences."""
    distinct = []
    calls = {}
    for i in range(n_reads):
        if distinct and rng.rand() < dup_bias:
            seq = distinct[rng.randint(len(distinct))]
        else:
            L = rng.randint(3, 9)
            start = rng.randint(0, len(gene_pool) - L + 1)
            seq = [
                ("+" if rng.rand() < 0.8 else "-") + g
                for g in gene_pool[start : start + L]
            ]
            if rng.rand() < 0.5:
                seq = _reverse_calls(seq)
            distinct.append(seq)
        calls[f"r{i}"] = list(seq)
    return calls


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_weighted_dedup_sublist_counts_match_per_read(seed):
    rng = np.random.RandomState(seed)
    pool = [f"g{i}" for i in range(12)]
    pool[5] = "amr"
    calls = _random_calls(rng, 120, pool)
    subset = dict(calls)
    subset.update({r + "_reverse": _reverse_calls(calls[r]) for r in calls})

    plain = SequenceIndex(subset)
    weighted = _weighted_gene_index(subset)
    # pre-deduplicated form with multiplicities
    groups: dict = {}
    for r, seq in calls.items():
        groups.setdefault(tuple(seq), []).append(r)
    rep_subset, mult = {}, {}
    for key, mem in groups.items():
        rep_subset[mem[0]] = list(key)
        rep_subset[mem[0] + "_reverse"] = _reverse_calls(list(key))
        mult[mem[0]] = len(mem)
    weighted_pre = _weighted_gene_index(rep_subset, mult)

    # query windows around the gene from a few reads that contain it
    queried = 0
    for r, seq in calls.items():
        if not any(g[1:] == "amr" for g in seq):
            continue
        for threshold in (1, 2, 5):
            a = get_all_sublists(plain, list(seq), threshold, "amr")
            b = get_all_sublists(weighted, list(seq), threshold, "amr")
            c = get_all_sublists(weighted_pre, list(seq), threshold, "amr")
            assert a == b == c
        queried += 1
        if queried >= 8:
            break
    assert queried > 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_paths_match_between_dedup_and_per_read_subsets(seed):
    rng = np.random.RandomState(seed)
    layout = [f"g{i}" for i in range(10)]
    layout[4] = "amr"
    calls = {}
    for i in range(80):
        L = rng.randint(3, 8)
        start = rng.randint(0, len(layout) - L + 1)
        seq = [f"+{g}" for g in layout[start : start + L]]
        if rng.rand() < 0.4:
            seq = _reverse_calls(seq)
        calls[f"r{i}"] = seq
    graph = GeneMerGraph(calls, 3)
    nodes = [n.hash for n in graph.get_nodes_containing("amr")]
    if not nodes:
        pytest.skip("no amr nodes for this seed")
    anchors = get_AMR_anchors(graph, nodes)
    reads = graph.collect_reads_in_path(nodes)
    node_index = construct_node_index(
        {r: graph.get_readNodes()[r] for r in reads}
    )
    full = {r: graph.get_reads()[r] for r in reads}
    full.update(
        {r + "_reverse": graph.reverse_list_of_genes(full[r]) for r in list(full)}
    )
    groups: dict = {}
    for r in reads:
        groups.setdefault(tuple(graph.get_reads()[r]), []).append(r)
    rep_subset, mult = {}, {}
    for key, mem in groups.items():
        rep_subset[mem[0]] = list(key)
        rep_subset[mem[0] + "_reverse"] = graph.reverse_list_of_genes(list(key))
        mult[mem[0]] = len(mem)

    a = get_full_paths(graph, node_index, anchors, 1, full, "amr")
    b = get_full_paths(
        graph, node_index, anchors, 1, rep_subset, "amr", gene_multiplicity=mult
    )
    # (final_paths, seen_nodes, final_path_coverages) must be identical,
    # including dict orders
    assert list(a[0].items()) == list(b[0].items())
    assert a[1] == b[1]
    assert a[2] == b[2]


def test_node_index_rep_members_cover_all_reads():
    reads = {
        "a": [1, 2, 3],
        "b": [1, 2, 3],
        "c": [3, 2, 1],
        "d": [7, 7],
        "e": [5],
        "f": [5],
    }
    idx = construct_node_index(reads)
    members = idx._rep_members
    covered = set()
    for rep, mem in members.items():
        if not str(rep).endswith("_reverse"):
            covered.update(mem)
    assert covered == set(reads)
    # reverse twins share the group list with their forward representative
    assert members["a_reverse"] is members["a"]
    # single-distinct-node reads get no reverse entry (legacy semantics)
    assert "e_reverse" not in idx.sequences and "d_reverse" not in idx.sequences
