"""The single-traversal junction path search must return exactly the same
canonicalized path set as the reference's per-ordered-pair bounded DFS
(construct_graph.py:2066-2098)."""

import json

import pytest

from amira_tpu.bubbles import (
    get_all_paths_between_junctions_in_component,
    identify_potential_bubble_starts,
)
from amira_tpu.graph import GeneMerGraph

REF = "/root/reference/tests"


def per_pair_reference(graph, bubble_starts, max_distance):
    """Faithful re-statement of the per-pair search for comparison."""
    unique_paths = set()
    for start_hash, start_dir in bubble_starts:
        for stop_hash, stop_dir in bubble_starts:
            if start_hash == stop_hash:
                continue
            paths = graph.new_find_paths_between_nodes(
                start_hash, stop_hash, max_distance, start_dir
            )
            valid = []
            for p in paths:
                if p[0] != (start_hash, start_dir) or len(p) < 2:
                    continue
                end_dir = graph.get_direction_between_two_nodes(
                    p[-2][0], p[-1][0]
                )
                if (p[-1][0], end_dir) == (stop_hash, stop_dir):
                    valid.append(p)
            if len(valid) > 1:
                for p in valid:
                    rc = list(reversed([(t[0], t[1] * -1) for t in p]))
                    unique_paths.add(tuple(sorted([p, rc])[0]))
    return unique_paths


def test_vectorized_frontier_matches_scalar_dfs_on_random_graphs():
    """The batched frontier expansion equals the per-start DFS
    (`_get_all_paths_scalar`) on random noisy graphs — including
    multi-edge multiplicity counting and direction-filtered stops."""
    import random

    from amira_tpu.bubbles import _get_all_paths_scalar

    for seed in (1, 5, 9):
        rng = random.Random(seed)
        reads = {}
        genes = [f"g{i}" for i in range(12)]
        for r in range(60):
            ln = rng.randint(3, 8)
            reads[f"r{r}"] = [
                rng.choice("+-") + rng.choice(genes) for _ in range(ln)
            ]
        graph = GeneMerGraph(reads, 3)
        starts_by_component = identify_potential_bubble_starts(graph)
        for component, starts in starts_by_component.items():
            expected = set(_get_all_paths_scalar(graph, starts, 12))
            got = set(
                get_all_paths_between_junctions_in_component(graph, starts, 12)
            )
            assert got == expected, (seed, component)


@pytest.mark.parametrize(
    "name,k,expect_paths", [("nine", 3, True), ("five", 3, False), ("seven", 5, False)]
)
def test_junction_path_search_matches_per_pair_reference(name, k, expect_paths):
    calls = json.load(open(f"{REF}/complex_gene_calls_{name}.json"))
    positions = json.load(open(f"{REF}/complex_gene_positions_{name}.json"))
    graph = GeneMerGraph(calls, k, positions)
    starts_by_component = identify_potential_bubble_starts(graph)
    max_distance = k * 4
    checked = 0
    for component, starts in starts_by_component.items():
        expected = per_pair_reference(graph, starts, max_distance)
        got = set(
            get_all_paths_between_junctions_in_component(
                graph, starts, max_distance
            )
        )
        assert got == expected, f"component {component} path set differs"
        checked += len(expected)
    if expect_paths:
        assert checked > 0, "fixture produced no junction paths at all"
