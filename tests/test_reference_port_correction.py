"""Ports of the reference's correction-DP and fringe-trimming assertion
corpus (tests/test_gene_mer_graph.py:4649-5737 in the upstream checkout).

The long literal inputs/expectations are extracted from the upstream test
file's AST at test time (assertion DATA is the behavioral spec; the code
under test here is this repo's own implementation)."""

import ast
import json
import os

import pytest

from amira_tpu.bubbles import (
    correct_gene_positions_on_read,
    correct_genes_on_read,
    longest_common_sublist,
    modify_alignment_subset,
)
from amira_tpu.graph import GeneMerGraph
from amira_tpu.stree import find_sublist_indices

REF_TESTS = "/root/reference/tests/test_gene_mer_graph.py"
REF_FIXTURES = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_TESTS), reason="reference checkout not available"
)


def ref_literals(test_name):
    """Literal assignments inside one upstream test function, by name."""
    tree = ast.parse(open(REF_TESTS).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == test_name:
            out = {}
            for stmt in ast.walk(node):
                if (
                    isinstance(stmt, ast.Assign)
                    and len(stmt.targets) == 1
                    and isinstance(stmt.targets[0], ast.Name)
                ):
                    try:
                        out[stmt.targets[0].id] = ast.literal_eval(stmt.value)
                    except ValueError:
                        pass
            return out
    raise KeyError(test_name)


def _nine_graph():
    calls = json.load(open(f"{REF_FIXTURES}/complex_gene_calls_nine.json"))
    positions = json.load(
        open(f"{REF_FIXTURES}/complex_gene_positions_nine.json")
    )
    return GeneMerGraph(calls, 5, positions)


# ---- alignment-subset correction on fixture nine
# (reference test_gene_mer_graph.py:5211-5447)


def test_modify_alignment_subset():
    lit = ref_literals("test___modify_alignment_subset")
    _nine_graph()  # the reference builds it; the op itself is graph-free
    actual = modify_alignment_subset(
        [tuple(c) for c in lit["alignment_subset"]],
        lit["genes_on_read"][5 : 20 + 1],
    )
    assert [tuple(c) for c in actual] == [
        tuple(c) for c in lit["expected_modified_alignment"]
    ]


def test_modify_alignment_subset_gap_in_hcp():
    lit = ref_literals("test___modify_alignment_subset_gap_in_hcp")
    actual = modify_alignment_subset(
        [tuple(c) for c in lit["alignment_subset"]],
        lit["genes_on_read"][5 : 19 + 1],
    )
    assert [tuple(c) for c in actual] == [
        tuple(c) for c in lit["expected_modified_alignment"]
    ]


def test_correct_gene_positions():
    """reference test_gene_mer_graph.py:5449-5554 — -catA1's remapped span
    on read 421f6a37384a4d2dfc6b53287b819698 is (25421, 26047)."""
    lit = ref_literals("test___correct_gene_positions")
    graph = _nine_graph()
    rid = "421f6a37384a4d2dfc6b53287b819698"
    subset = [tuple(c) for c in lit["alignment_subset"]]
    corrected = correct_genes_on_read(
        graph, lit["genes_on_read"], 5, 20, subset, rid
    )
    new_positions = correct_gene_positions_on_read(
        graph, 5, 20, subset, rid, {}
    )
    assert tuple(new_positions[corrected.index("-catA1")]) == (25421, 26047)


def test_correct_genes_on_read_partial_correction():
    """reference test_gene_mer_graph.py:5556-5717."""
    lit = ref_literals("test___correct_genes_on_read_partial_corrrection")
    graph = GeneMerGraph({}, 5)
    actual = correct_genes_on_read(
        graph,
        lit["genes_on_read"],
        5,
        20,
        [tuple(c) for c in lit["alignment_subset"]],
        "421f6a37384a4d2dfc6b53287b819698",
    )
    assert actual == lit["expected_corrected_reads"]


# ---- longest common sublist (reference :5719-5737)


def test_longest_common_sublist_variants():
    lcs, _, _ = longest_common_sublist(
        ["a", "b", "c", "d", "e", "f"], ["x", "y", "z", "a", "b", "c", "d"]
    )
    assert lcs == ["a", "b", "c", "d"]
    lcs, _, _ = longest_common_sublist(
        ["a", "c", "f", "e", "e", "f"], ["x", "y", "z", "a", "b", "c", "d"]
    )
    assert lcs == ["a"]


# ---- find_sublist_indices (reference :4649-4695)


@pytest.mark.parametrize(
    "main,sub,expected",
    [
        (list("123456789") + ["10"], ["4", "5", "6"], [(3, 5)]),
        (list("123456789") + ["10"], ["11", "12", "13"], []),
        (
            ["1", "2", "3", "4", "5", "6", "2", "3", "4", "10"],
            ["2", "3", "4"],
            [(1, 3), (6, 8)],
        ),
        (
            list("123456789") + ["10"],
            list("123456789") + ["10"],
            [(0, 9)],
        ),
        (["1"] * 5, ["1"] * 3, [(0, 2), (1, 3), (2, 4)]),
    ],
)
def test_find_sublist_indices(main, sub, expected):
    assert find_sublist_indices(main, sub) == expected


# ---- fringe trimming on synthetic topologies (reference :4753-5060)


@pytest.mark.parametrize(
    "ref_name,expected_nodes,expected_read_counts",
    [
        ("test___trim_fringe_nodes_linear", 4, {5: 2, 6: 2}),
        # NOTE: the upstream test asserts all read counts in {5, 6}, but the
        # upstream IMPLEMENTATION run on its own fixture yields {5: 10,
        # 10: 3, 9: 1} (verified directly against /root/reference code with
        # stubbed imports) — the upstream assertion has rotted. We pin the
        # implementation's actual behavior, which this repo reproduces
        # exactly.
        ("test___trim_fringe_nodes_circle", 14, {5: 10, 10: 3, 9: 1}),
        ("test___trim_fringe_nodes_junction", 6, {6: 5, 5: 1}),
    ],
)
def test_trim_fringe_nodes(ref_name, expected_nodes, expected_read_counts):
    from collections import Counter

    lit = ref_literals(ref_name)
    graph = GeneMerGraph(lit["annotations"], 3)
    matrix, node_hashes = graph.make_intersection_matrix()
    trimmed = graph.trim_fringe_nodes(5, matrix, node_hashes)
    assert len(trimmed.get_nodes()) == expected_nodes
    assert (
        dict(Counter(len(n.get_list_of_reads()) for n in trimmed.all_nodes()))
        == expected_read_counts
    )


def test_insert_elements_fuzz_matches_sequential():
    """Stitched insert_elements equals the sequential delete/insert
    bookkeeping on random span layouts, including the boundary-sharing
    overlap adjacent bubbles produce."""
    import random

    from amira_tpu.correct import (
        _insert_elements_sequential,
        insert_elements,
    )

    rng = random.Random(0)
    for _trial in range(500):
        n = rng.randint(3, 12)
        base = [(i, rng.choice((1, -1))) for i in range(n)]
        spans = []
        s = 0
        while s < n - 1 and len(spans) < 3:
            e = min(n - 1, s + rng.randint(1, 3))
            spans.append((s, e))
            s = e if rng.random() < 0.5 else e + rng.randint(1, 3)
        ins = {}
        for s0, e0 in spans:
            opts = []
            for _ in range(rng.randint(1, 2)):
                length = rng.randint(e0 - s0 + 1, e0 - s0 + 4)
                opts.append(
                    [(100 + rng.randint(0, 50), 1) for _ in range(length)]
                )
            ins[(s0, e0)] = opts
        got = insert_elements(list(base), dict(ins))
        want = _insert_elements_sequential(list(base), dict(ins))
        assert got == want
