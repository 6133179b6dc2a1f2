"""Exact node/edge/coverage counts ported from the reference's
tests/test_gene_mer_graph.py construction and filtering tests."""

import os

from amira_tpu.graph import GeneMerGraph


def test_init_non_empty():
    """reference :38-77: 3 nodes, 4 edges, coverages (2,1,1) in
    first-occurrence order."""
    genes = ["+gene1", "-gene2", "+gene3", "-gene4"]
    genes2 = ["+gene1", "-gene2", "+gene3", "-gene6"]
    graph = GeneMerGraph({"read1": genes, "read2": genes2}, 3)
    assert graph.get_reads() == {"read1": genes, "read2": genes2}
    assert graph.get_kmerSize() == 3
    assert graph.get_minNodeCoverage() == 1
    assert graph.get_minEdgeCoverage() == 1
    assert graph.get_total_number_of_nodes() == 3
    assert graph.get_total_number_of_edges() == 4
    covs = [
        graph.get_nodes()[h].coverage for h in list(graph.get_nodes())[:3]
    ]
    assert covs == [2, 1, 1]


def test_init_duplicate_nodes():
    """reference :79-136: repeated gene-mers within reads: 8 nodes, 18 edges,
    first node coverage 4, all other nodes 1, all edges 1."""
    genes = [
        "+gene1", "-gene2", "+gene3", "-gene4", "+gene1", "-gene2", "+gene3",
        "+gene8",
    ]
    genes2 = [
        "+gene1", "-gene2", "+gene3", "-gene6", "+gene1", "-gene2", "+gene3",
    ]
    graph = GeneMerGraph({"read1": genes, "read2": genes2}, 3)
    assert graph.get_total_number_of_nodes() == 8
    assert graph.get_total_number_of_edges() == 18
    nodes = list(graph.get_nodes().values())
    assert nodes[0].coverage == 4
    assert all(n.coverage == 1 for n in nodes[1:])
    assert all(e.coverage == 1 for e in graph.get_edges().values())


def test_filter_graph_counts(tmp_path):
    """reference :1971-2028: filter_graph(2,2) leaves 6 nodes / 10 edges."""
    genes1 = [
        "+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6",
        "+gene10", "+gene9", "-gene6", "+gene3", "-gene7", "+gene5",
        "-gene6", "+gene3", "-gene7", "-gene6", "+gene3", "-gene7",
        "+gene3", "-gene4", "+gene5", "+gene3", "-gene4", "+gene5",
        "+gene3", "-gene4", "+gene5",
    ]
    genes2 = [
        "+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "+gene9",
        "-gene6", "+gene7", "+gene3", "-gene4", "+gene5",
    ]
    graph = GeneMerGraph({"read1": genes1, "read2": genes2}, 3)
    graph.filter_graph(2, 2)
    out = str(tmp_path / "test_graph")
    graph.generate_gml(out, 3, 2, 2)
    assert graph.get_total_number_of_nodes() == 6
    assert graph.get_total_number_of_edges() == 10
    assert os.path.exists(out + ".3.2.2.gml")
    content = open(out + ".3.2.2.gml").read()
    assert content.startswith("graph\t[")
    assert "~~~" in content  # gene-mer labels


def test_two_genemers_one_read():
    """reference :137-176: 2 nodes, 2 edges, both nodes coverage 1."""
    genes = ["+gene1", "-gene2", "+gene3", "-gene4"]
    graph = GeneMerGraph({"read1": genes}, 3)
    assert graph.get_total_number_of_nodes() == 2
    assert graph.get_total_number_of_edges() == 2
    assert all(n.coverage == 1 for n in graph.all_nodes())


def test_degree_cases():
    """reference :1596-1794 degree topologies."""
    # linear path of 3 nodes: end degree 1, middle degree 2
    g = GeneMerGraph({"r": ["+a", "+b", "+c", "+d", "+e"]}, 3)
    degrees = sorted(g.get_degree(n) for n in g.all_nodes())
    assert degrees == [1, 2, 1] or degrees == [1, 1, 2]
    # branching: middle node degree 3
    g2 = GeneMerGraph(
        {
            "r1": ["+a", "+b", "+c", "+d"],
            "r2": ["+a", "+b", "+c", "+e"],
        },
        3,
    )
    degs = sorted(g2.get_degree(n) for n in g2.all_nodes())
    assert degs == [1, 1, 2]


def test_remove_node_from_reads_multiple_copies():
    """reference :2188-2213: removing a node nulls every occurrence on the
    read."""
    genes = ["+a", "+b", "+c", "+d", "+a", "+b", "+c"]
    g = GeneMerGraph({"r1": genes}, 3)
    # the abc node occurs twice on the read
    abc = None
    for n in g.all_nodes():
        if n.coverage == 2:
            abc = n
    assert abc is not None
    g.remove_node(abc)
    nodes = g.get_readNodes()["r1"]
    assert nodes.count(None) == 2
    assert "r1" in g.get_reads_to_correct()
