"""Ports of the reference's fringe-trimming, graph-filtering, GML, and
subpath-splitting assertion corpus (tests/test_gene_mer_graph.py:1836-2130,
4394-4528, 4753-5062 in the upstream checkout).

Long literal fixtures (the annotation dicts) are extracted from the
upstream test file's AST at test time — assertion DATA is the behavioral
spec; the code under test is this repo's own implementation."""

import ast
import os

import pytest

from amira_tpu.cluster import (
    construct_node_index,
    get_AMR_anchors,
    get_full_paths,
    split_into_subpaths,
)
from amira_tpu.graph import GeneMerGraph

REF_TESTS = "/root/reference/tests/test_gene_mer_graph.py"

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


# ------------------------------------------------------- trim_fringe_nodes
# reference test_gene_mer_graph.py:4753-5062 (the _complex case is ported
# in tests/test_reference_port_correction.py)


def _trim(test_name):
    annotations = ref_literals(test_name)["annotations"]
    graph = GeneMerGraph(annotations, 3)
    matrix, node_hashes = graph.make_intersection_matrix()
    return graph.trim_fringe_nodes(5, matrix, node_hashes)


def test_trim_fringe_nodes_linear():
    trimmed = _trim("test___trim_fringe_nodes_linear")
    assert len(trimmed.get_nodes()) == 4
    assert all(
        len(n.get_list_of_reads()) in {5, 6} for n in trimmed.all_nodes()
    )


def test_trim_fringe_nodes_circle():
    trimmed = _trim("test___trim_fringe_nodes_circle")
    assert len(trimmed.get_nodes()) == 14
    assert all(
        len(n.get_list_of_reads()) in {9, 10, 5} for n in trimmed.all_nodes()
    )


def test_trim_fringe_nodes_junction():
    trimmed = _trim("test___trim_fringe_nodes_junction")
    assert len(trimmed.get_nodes()) == 6
    assert all(
        len(n.get_list_of_reads()) in {5, 6} for n in trimmed.all_nodes()
    )


# ------------------------------------------------------------ filter_graph
# reference test_gene_mer_graph.py:1971-2130 (the base filter-count case is
# ported in tests/test_graph_reference_counts.py)


def test_filter_graph_k1_cut_edge(tmp_path):
    lits = ref_literals("test___filter_graph_k_1_cut_edge")
    genes1, genes2 = lits["genes1"], lits["genes2"]
    graph = GeneMerGraph({"read1": genes1, "read2": genes1, "read3": genes2}, 1)
    graph.filter_graph(1, 2)
    graph.generate_gml(str(tmp_path / "test_graph"), 1, 1, 2)
    assert graph.get_total_number_of_nodes() == 9
    assert graph.get_total_number_of_edges() == 18


def test_filter_all_graph(tmp_path):
    lits = ref_literals("test___filter_all_graph")
    graph = GeneMerGraph(
        {"read1": lits["genes1"], "read2": lits["genes2"]}, 3
    )
    graph.filter_graph(10, 10)
    written = graph.generate_gml(str(tmp_path / "test_graph"), 3, 10, 10)
    assert written == ["graph\t[", "multigraph 1", "]"]
    assert graph.get_total_number_of_nodes() == 0
    assert graph.get_total_number_of_edges() == 0
    assert os.path.exists(tmp_path / "test_graph.3.10.10.gml")


# ------------------------------------------------------------ GML output
# reference test_gene_mer_graph.py:1889-1971


def test_generate_gml_structure(tmp_path):
    graph = GeneMerGraph({"read1": ["+gene1", "-gene2", "+gene3", "-gene4"]}, 3)
    written = graph.generate_gml(str(tmp_path / "test_graph"), 3, 1, 1)
    assert os.path.exists(tmp_path / "test_graph.3.1.1.gml")
    assert written[0] == "graph\t["
    assert written[1] == "multigraph 1"
    assert written[-1] == "]"
    node_blocks = [b for b in written if b.startswith("\tnode\t[")]
    edge_blocks = [b for b in written if b.startswith("\tedge\t[")]
    assert len(node_blocks) == 2
    # both directed edge records are emitted
    assert len(edge_blocks) == 2
    # the two nodes get sequential integer ids and ~~~-joined labels
    labels = set()
    for b in node_blocks:
        assert "\t\tid\t" in b and "coverage\t1" in b
        label = b.split('label\t"')[1].split('"')[0]
        labels.add(label)
    expected_labels = {
        "+gene1~~~-gene2~~~+gene3",
        "-gene3~~~+gene2~~~-gene1",
        "-gene2~~~+gene3~~~-gene4",
        "+gene4~~~-gene3~~~+gene2",
    }
    assert labels <= expected_labels
    assert len(labels) == 2
    for b in edge_blocks:
        assert "source_direction\t" in b and "target_direction\t" in b
        assert "weight\t1" in b


def test_get_gene_mer_label():
    graph = GeneMerGraph({"read1": ["+gene1", "-gene2", "+gene3"]}, 3)
    (node,) = list(graph.all_nodes())
    label = graph.get_gene_mer_label(node)
    assert label in ("+gene1~~~-gene2~~~+gene3", "-gene3~~~+gene2~~~-gene1")


def test_assign_id_to_nodes_sequential():
    graph = GeneMerGraph({"read1": ["+gene1", "-gene2", "+gene3", "-gene4"]}, 3)
    graph.assign_Id_to_nodes()
    ids = sorted(n.node_id for n in graph.all_nodes())
    assert ids == [0, 1]


# ------------------------------------------------------ split_into_subpaths
# reference test_gene_mer_graph.py:4394-4528


def _subpaths_for(test_name, gene):
    lits = ref_literals(test_name)
    genes1, positions1 = lits["genes1"], lits["positions1"]
    graph = GeneMerGraph(
        {"read1": genes1, "read2": genes1, "read3": genes1},
        3,
        {"read1": positions1, "read2": positions1, "read3": positions1},
    )
    hashes = [n.hash for n in graph.get_nodes_containing(gene)]
    reads_with_gene = graph.collect_reads_in_path(set(hashes))
    subset = {r: graph.get_reads()[r] for r in reads_with_gene}
    subset.update(
        {
            r + "_reverse": graph.reverse_list_of_genes(subset[r])
            for r in list(subset)
        }
    )
    node_index = construct_node_index(dict(graph.get_readNodes()))
    anchors = get_AMR_anchors(graph, hashes)
    paths, coverages, *_ = get_full_paths(
        graph, node_index, anchors, 1, subset, gene
    )[:3]
    final_paths, _ = split_into_subpaths(graph, gene, paths, coverages, {})
    return final_paths


def test_split_into_subpaths_linear():
    final_paths = _subpaths_for("test___split_into_subpaths_linear", "gene5")
    assert len(final_paths) == 2
    for k in final_paths:
        assert len(final_paths[k]) == 3
    groups = [set(v) for v in final_paths.values()]
    assert {"read1_8_9", "read2_8_9", "read3_8_9"} in groups
    assert {"read1_12_13", "read2_12_13", "read3_12_13"} in groups


def test_split_into_subpaths_triangle():
    final_paths = _subpaths_for("test___split_into_subpaths_triangle", "gene5")
    assert len(final_paths) == 3
    for k in final_paths:
        assert len(final_paths[k]) == 3
    groups = [set(v) for v in final_paths.values()]
    for spans in ("8_9", "12_13", "16_17"):
        assert {f"read{i}_{spans}" for i in (1, 2, 3)} in groups
