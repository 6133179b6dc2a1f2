"""Ports of the reference's graph-method assertion corpus
(tests/test_gene_mer_graph.py:2214-3686 in the upstream checkout).

The reference builds many of these graphs node-by-node with mock Edge
objects; here the same topologies are built from read dicts (the repo's
device build), and the assertions are re-expressed against read-ordered
node hashes. Assertion DATA (inputs and expected values) is the
behavioral spec; the code under test is this repo's own implementation.
"""

import pytest

from amira_tpu.correct import (
    find_read_boundaries,
    insert_elements,
    needleman_wunsch,
)
from amira_tpu.bubbles import (
    correct_genes_on_read,
    count_indels_in_alignment,
    count_snps_in_alignment,
    reorient_alignment,
    reverse_gene_alignment,
)
from amira_tpu.graph import GeneMerGraph
from amira_tpu.stree import find_sublist_indices

from collections import Counter


def _linear(genes, reads=1, k=3):
    return GeneMerGraph({f"read{i + 1}": genes for i in range(reads)}, k)


def _read_nodes(g, read="read1"):
    return [g.get_node_by_hash(h) for h in g.get_readNodes()[read]]


def _read_dirs(g, read="read1"):
    return list(g.get_readNodeDirections()[read])


# --------------------------------------------------- node-from-node walks
# reference test_gene_mer_graph.py:2214-2482


def test_get_existing_forward_node_from_node():
    g = _linear(["+gene1", "-gene2", "+gene3", "-gene4"])
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    step = (
        g.get_forward_node_from_node
        if dirs[0] == 1
        else g.get_backward_node_from_node
    )
    extend, target, target_dir = step(nodes[0])
    assert extend is True
    assert target is nodes[1]
    assert target_dir == dirs[1]


def test_get_existing_forward_node_from_node_in_middle():
    g = _linear(["+gene1", "-gene2", "+gene3", "-gene4", "+gene5"])
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    step = (
        g.get_forward_node_from_node
        if dirs[0] == 1
        else g.get_backward_node_from_node
    )
    extend, target, target_dir = step(nodes[0])
    assert extend is True
    assert target is nodes[1]
    assert target_dir == dirs[1]


def test_get_branched_forward_node_from_node():
    # two reads diverge after the shared prefix: the walk from the node
    # BEFORE the junction must refuse to extend (degree 3 target)
    reads = {
        "read1": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6"],
        "read2": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene7", "-gene8"],
    }
    g = GeneMerGraph(reads, 3)
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    # node[1] = (gene2..gene4) is the junction (degree 3)
    step = (
        g.get_forward_node_from_node
        if dirs[0] == 1
        else g.get_backward_node_from_node
    )
    extend, target, _ = step(nodes[0])
    assert extend is False
    assert target is nodes[1]  # reached but not extendable


def test_get_non_existing_forward_node_from_node():
    # single gene-mer -> no edges at all
    g = _linear(["+gene1", "-gene2", "+gene3"])
    (node,) = _read_nodes(g)
    assert g.get_forward_node_from_node(node) == (False, None, None)
    assert g.get_backward_node_from_node(node) == (False, None, None)


def test_get_self_loop_forward_node_from_node():
    # homopolymer read: one node with a self-edge; walking in the read's
    # observed direction must reach the node itself with the same direction
    # and refuse to extend (reference :2332-2358 — there the mock edge makes
    # "forward" the traversal direction; here canonicalization picks it)
    g = _linear(["+gene1", "+gene1", "+gene1", "+gene1"])
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    assert all(n is nodes[0] for n in nodes)
    step = (
        g.get_forward_node_from_node
        if dirs[0] == 1
        else g.get_backward_node_from_node
    )
    extend, target, target_dir = step(nodes[0])
    assert extend is False
    assert target is nodes[0]
    assert target_dir == dirs[0]


def test_get_existing_backward_node_from_node():
    g = _linear(["+gene1", "-gene2", "+gene3", "-gene4", "+gene5"])
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    step = (
        g.get_backward_node_from_node
        if dirs[-1] == 1
        else g.get_forward_node_from_node
    )
    extend, target, _ = step(nodes[-1])
    assert extend is True
    assert target is nodes[-2]


# ------------------------------------------------------- path-from-node
# reference test_gene_mer_graph.py:2483-2966


def test_get_forward_path_from_node_linear():
    genes = [
        "+gene1", "-gene2", "+gene3", "-gene4",
        "+gene5", "-gene6", "+gene7", "-gene8",
    ]
    g = _linear(genes)
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    path = g.get_forward_path_from_node(nodes[1], dirs[1])
    assert path == [n.hash for n in nodes[1:]]
    assert len(path) == 5


def test_get_forward_path_from_node_circular():
    # read whose gene-mers wrap around: walk stops when it would re-enter
    # the start node (reference :2508-2534 expects all 5 nodes, no repeat)
    genes = ["+gene1", "-gene2", "+gene3", "-gene4", "+gene1", "-gene2", "+gene3"]
    g = _linear(genes)
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    path = g.get_forward_path_from_node(nodes[0], dirs[0], True)
    assert len(path) == 5
    assert path == [n.hash for n in nodes]


def test_get_forward_path_from_node_branched():
    reads = {
        "read1": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6", "+gene7"],
        "read2": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene8", "+gene8"],
    }
    g = GeneMerGraph(reads, 3)
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    path = g.get_forward_path_from_node(nodes[0], dirs[0])
    assert path == [n.hash for n in nodes[:2]]
    assert len(path) == 2


def test_get_forward_path_from_node_branched_want_branched():
    reads = {
        "read1": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6", "+gene7"],
        "read2": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene8", "+gene8"],
    }
    g = GeneMerGraph(reads, 3)
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    path = g.get_forward_path_from_node(nodes[0], dirs[0], True)
    assert path == [n.hash for n in nodes[:3]]
    assert len(path) == 3


def test_get_forward_path_from_middle_node_to_branched_want_branched():
    reads = {
        "read1": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6", "+gene7"],
        "read2": ["+gene0", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6", "+gene8"],
    }
    g = GeneMerGraph(reads, 3)
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    path = g.get_forward_path_from_node(nodes[2], dirs[2], True)
    assert path == [n.hash for n in nodes[2:4]]
    assert len(path) == 2


def test_get_forward_path_from_branched_node_to_branched_want_branched():
    reads = {
        "read1": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6"],
        "read2": ["+gene0", "-gene2", "+gene3", "-gene4", "+gene5", "-gene7"],
    }
    g = GeneMerGraph(reads, 3)
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    path = g.get_forward_path_from_node(nodes[1], dirs[1], True)
    assert path == [n.hash for n in nodes[1:3]]
    assert len(path) == 2


def test_get_backward_path_from_node_linear():
    genes = [
        "+gene1", "-gene2", "+gene3", "-gene4",
        "+gene5", "-gene6", "+gene7", "-gene8",
    ]
    g = _linear(genes)
    nodes, dirs = _read_nodes(g), _read_dirs(g)
    path = g.get_backward_path_from_node(nodes[-2], -dirs[-2])
    assert path == [n.hash for n in nodes[:-1]]
    assert len(path) == 5


def test_get_linear_path_for_node():
    genes = [
        "+gene1", "-gene2", "+gene3", "-gene4",
        "+gene5", "-gene6", "+gene7", "-gene8",
    ]
    g = _linear(genes)
    nodes = _read_nodes(g)
    path = g.get_linear_path_for_node(nodes[2])
    hashes = [n.hash for n in nodes]
    assert path == hashes or path == hashes[::-1]
    assert len(path) == 6


def test_get_linear_path_for_single_node():
    g = _linear(["+gene1", "-gene2", "+gene3"])
    (node,) = _read_nodes(g)
    assert g.get_linear_path_for_node(node) == [node.hash]


# ----------------------------------------------- remove_short_linear_paths
# reference test_gene_mer_graph.py:3065-3326

_RSLP_READ1 = [
    "-gene6", "+gene10", "+gene9", "-gene6", "+gene3", "-gene7", "+gene5",
    "-gene6", "+gene3", "-gene7", "-gene6", "+gene3", "-gene7", "+gene3",
    "-gene4", "+gene5", "+gene3", "-gene4", "+gene5", "+gene3", "-gene4",
    "+gene5",
]
_RSLP_READ2 = ["+gene9", "-gene6", "+gene7", "+gene3", "-gene4", "+gene5"]
_RSLP_READ3 = ["-gene0", "+gene1", "-gene2", "+gene3"]


def _clear_components(g):
    # the reference test builds these graphs node-by-node without ever
    # assigning component ids, which disables remove_short_linear_paths'
    # never-delete-a-whole-component guard; mirror that state
    for n in g.all_nodes():
        n.component = None


def test_remove_short_linear_paths_min4():
    g = GeneMerGraph(
        {"read1": _RSLP_READ1, "read2": _RSLP_READ2, "read3": _RSLP_READ3}, 3
    )
    _clear_components(g)
    rn = {r: list(g.get_readNodes()[r]) for r in ("read1", "read2", "read3")}
    removed = g.remove_short_linear_paths(4)
    expected = {
        rn["read1"][0], rn["read1"][1], rn["read1"][2],
        rn["read2"][0], rn["read2"][1], rn["read2"][2],
        rn["read3"][0], rn["read3"][1],
    }
    assert len(removed) == 8
    assert expected.issubset(set(removed))
    for h in expected:
        assert h not in g.get_nodes()


def test_remove_short_linear_paths_longer_than_min():
    g = GeneMerGraph(
        {"read1": _RSLP_READ1, "read2": _RSLP_READ2, "read3": _RSLP_READ3}, 3
    )
    _clear_components(g)
    rn3 = list(g.get_readNodes()["read3"])
    removed = g.remove_short_linear_paths(3)
    assert len(removed) == 2
    assert set(removed) == {rn3[0], rn3[1]}
    for h in rn3:
        assert h not in g.get_nodes()


def test_remove_short_linear_paths_length_one():
    read2 = _RSLP_READ2 + ["-gene12"]
    g = GeneMerGraph(
        {"read1": _RSLP_READ1, "read2": read2, "read3": _RSLP_READ3}, 3
    )
    rn2 = list(g.get_readNodes()["read2"])
    removed = g.remove_short_linear_paths(2)
    assert len(removed) == 1
    assert removed[0] == rn2[4]
    assert rn2[4] not in g.get_nodes()


# ------------------------------------------------- all_paths_for_subgraph
# reference test_gene_mer_graph.py:3326-3443

_SUBG_GENES1 = [
    "+gene1", "-gene2", "+gene3", "-gene4", "-gene6", "+gene7", "+gene9",
    "-gene10", "+gene16", "-gene17", "+gene18", "-gene19", "+gene20",
]
_SUBG_GENES2 = [
    "+gene11", "-gene12", "+gene3", "-gene4", "-gene6", "+gene13", "+gene14",
    "-gene15", "+gene16", "-gene17", "+gene18", "-gene21", "+gene22",
]


def _subgraph_paths(g, gene):
    nodes = g.get_nodes_containing(gene)
    hashes = [n.hash for n in nodes]
    anchor_nodes, _ = g.get_anchors_of_interest(hashes)
    return g.all_paths_for_subgraph(hashes, anchor_nodes)


def test_all_paths_for_subgraph_junctions():
    g = GeneMerGraph(
        {
            "read1": _SUBG_GENES1, "read2": _SUBG_GENES2,
            "read3": _SUBG_GENES1, "read4": _SUBG_GENES2,
        },
        3,
    )
    for gene in ("gene4", "gene17"):
        paths = _subgraph_paths(g, gene)
        assert len(paths) == 6
        assert all(len(paths[p]) == 1 for p in paths)
        assert all(len(paths[p][0]) == 3 for p in paths)


def test_all_paths_for_subgraph_linear():
    g = GeneMerGraph({f"read{i}": _SUBG_GENES1 for i in range(1, 5)}, 3)
    paths = _subgraph_paths(g, "gene7")
    assert len(paths) == 1
    assert all(len(paths[p]) == 1 for p in paths)
    assert all(len(paths[p][0]) == 3 for p in paths)


def test_all_paths_for_subgraph_linear_duplicate():
    genes = list(_SUBG_GENES1)
    genes[7] = "-gene7"  # the gene of interest recurs mid-read
    g = GeneMerGraph({f"read{i}": genes for i in range(1, 5)}, 3)
    paths = _subgraph_paths(g, "gene7")
    assert len(paths) == 1
    assert all(len(paths[p]) == 1 for p in paths)
    assert all(len(paths[p][0]) == 5 for p in paths)


# --------------------------------------------------- find_read_boundaries
# reference test_gene_mer_graph.py:3443-3529


def test_find_read_boundaries():
    start, end = find_read_boundaries(
        [None, 1, None, 2, 3, 4, 5, None, None, 6, 7, 8, 9, None, None, None]
    )
    assert (start, end) == (1, 12)


# --------------------------------------------------------- insert_elements
# reference test_gene_mer_graph.py:3529-3570


def test_insert_elements_empty_dict():
    base = [(1, 1), (2, -1)]
    assert insert_elements(base, {}) == [base]


def test_insert_elements_single():
    base = [(1, 1), (2, -1)]
    ins = {(0, 1): [[(1, 1), (3, 1), (2, -1)]]}
    assert insert_elements(base, ins) == [[(1, 1), (3, 1), (2, -1)]]


def test_insert_elements_multiple_inserts_single_path():
    base = [(1, 1), (2, -1)]
    ins = {(0, 1): [[(1, 1), (3, 1), (2, -1)], [(1, 1), (4, -1), (5, 1), (2, -1)]]}
    assert insert_elements(base, ins) == [
        [(1, 1), (3, 1), (2, -1)],
        [(1, 1), (4, -1), (5, 1), (2, -1)],
    ]


def test_insert_elements_multiple_paths():
    base = [(1, 1), (2, -1), (3, 1)]
    ins = {
        (0, 1): [[(1, 1), (6, 1), (2, -1)], [(1, 1), (4, -1), (5, 1), (2, -1)]],
        (1, 2): [[(2, -1), (4, -1), (3, 1)], [(2, -1), (5, -1), (6, 1), (3, 1)]],
    }
    expected = sorted(
        [
            [(1, 1), (6, 1), (2, -1), (4, -1), (3, 1)],
            [(1, 1), (6, 1), (2, -1), (5, -1), (6, 1), (3, 1)],
            [(1, 1), (4, -1), (5, 1), (2, -1), (4, -1), (3, 1)],
            [(1, 1), (4, -1), (5, 1), (2, -1), (5, -1), (6, 1), (3, 1)],
        ]
    )
    assert sorted(insert_elements(base, ins)) == expected


# ------------------------------------------------------ genes in unitig
# reference test_gene_mer_graph.py:3571-3686


def test_get_genes_in_unitig_length_one():
    g = GeneMerGraph({f"read{i}": ["+gene1", "-gene2", "+gene3"] for i in range(1, 5)}, 3)
    node_hashes = list(g.get_nodes().keys())
    genes = g.get_genes_in_unitig(node_hashes)
    assert genes in (
        ["+gene1", "-gene2", "+gene3"],
        ["-gene3", "+gene2", "-gene1"],
    )


def test_get_genes_in_unitig_length_greater_than_one():
    g = GeneMerGraph(
        {
            "read1": _SUBG_GENES1, "read2": _SUBG_GENES2,
            "read3": _SUBG_GENES1, "read4": _SUBG_GENES2,
        },
        3,
    )
    nodes = [n.hash for n in g.get_nodes_containing("gene15")]
    genes = g.get_genes_in_unitig(nodes)
    assert genes in (
        ["+gene13", "+gene14", "-gene15", "+gene16", "-gene17"],
        ["+gene17", "-gene16", "+gene15", "-gene14", "-gene13"],
    )


def test_get_genes_in_unitig_length_zero():
    g = GeneMerGraph(
        {"read1": _SUBG_GENES1, "read2": _SUBG_GENES2}, 3
    )
    assert g.get_genes_in_unitig([]) == []


def test_reverse_list_of_genes():
    g = GeneMerGraph({}, 3)
    assert g.reverse_list_of_genes(["-gene6", "+gene13", "+gene14", "-gene15"]) == [
        "+gene15", "-gene14", "-gene13", "+gene6",
    ]
    assert g.reverse_list_of_genes([]) == []


# --------------------------------------------------------- NW literal cases
# reference test_gene_mer_graph.py:3686-3757


def test_nw_both_empty():
    assert needleman_wunsch([], []) == []


def test_nw_gap_in_middle():
    assert needleman_wunsch(["+gene1", "-gene2", "+gene3"], ["+gene1", "+gene3"]) == [
        ("+gene1", "+gene1"), ("-gene2", "*"), ("+gene3", "+gene3"),
    ]


def test_nw_two_gaps_in_middle():
    got = needleman_wunsch(
        ["+gene1", "-gene2", "+gene3", "-gene4"], ["+gene1", "-gene4"]
    )
    assert got == [
        ("+gene1", "+gene1"), ("-gene2", "*"), ("+gene3", "*"), ("-gene4", "-gene4"),
    ]


def test_nw_four_gaps_in_middle():
    got = needleman_wunsch(
        ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6"],
        ["+gene1", "-gene6"],
    )
    assert got == [
        ("+gene1", "+gene1"), ("-gene2", "*"), ("+gene3", "*"),
        ("-gene4", "*"), ("+gene5", "*"), ("-gene6", "-gene6"),
    ]


def test_nw_four_snps_in_middle():
    got = needleman_wunsch(
        ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6"],
        ["+gene1", "-gene7", "+gene8", "-gene9", "+gene10", "-gene6"],
    )
    assert got == [
        ("+gene1", "+gene1"), ("-gene2", "-gene7"), ("+gene3", "+gene8"),
        ("-gene4", "-gene9"), ("+gene5", "+gene10"), ("-gene6", "-gene6"),
    ]


# ------------------------------------------------- alignment helper ports
# reference test_gene_mer_graph.py:3757-3869

_ALN_SNPS = [
    ("+gene1", "+gene1"), ("-gene2", "-gene7"), ("+gene3", "+gene8"),
    ("-gene4", "-gene9"), ("+gene5", "+gene10"), ("-gene6", "-gene6"),
]
_ALN_CLEAN = [
    ("+gene1", "+gene1"), ("-gene2", "-gene2"), ("+gene3", "+gene3"),
    ("-gene4", "-gene4"), ("+gene5", "+gene5"), ("-gene6", "-gene6"),
]


def test_reverse_gene_alignment_no_gaps():
    assert reverse_gene_alignment(_ALN_SNPS) == [
        ("+gene6", "+gene6"), ("-gene5", "-gene10"), ("+gene4", "+gene9"),
        ("-gene3", "-gene8"), ("+gene2", "+gene7"), ("-gene1", "-gene1"),
    ]


def test_reverse_gene_alignment_gaps():
    aln = [
        ("+gene1", "+gene1"), ("-gene2", "*"), ("+gene3", "+gene8"),
        ("-gene4", "*"), ("*", "+gene10"), ("-gene6", "-gene6"),
    ]
    assert reverse_gene_alignment(aln) == [
        ("+gene6", "+gene6"), ("*", "-gene10"), ("+gene4", "*"),
        ("-gene3", "-gene8"), ("+gene2", "*"), ("-gene1", "-gene1"),
    ]


def test_count_snps_in_alignment():
    assert count_snps_in_alignment(_ALN_SNPS) == 4
    assert count_snps_in_alignment(_ALN_CLEAN) == 0


def test_count_indels_in_alignment():
    assert count_indels_in_alignment(_ALN_CLEAN) == 0
    aln = [
        ("+gene1", "+gene1"), ("*", "-gene2"), ("+gene3", "+gene3"),
        ("-gene4", "-gene4"), ("+gene5", "*"), ("-gene6", "-gene6"),
    ]
    assert count_indels_in_alignment(aln) == 2


def test_collect_reads_in_path():
    g = GeneMerGraph(
        {
            "read1": _SUBG_GENES1, "read2": _SUBG_GENES2,
            "read3": _SUBG_GENES1, "read4": _SUBG_GENES2,
        },
        3,
    )
    nodes = [n.hash for n in g.get_nodes_containing("gene15")]
    assert g.collect_reads_in_path(nodes) == {"read2", "read4"}


# -------------------------------------------------- reorient + correction
# reference test_gene_mer_graph.py:3910-4040

_FW_ALN = [
    ("+gene1", "+gene1"), ("*", "-gene2"), ("+gene3", "+gene3"),
    ("-gene4", "-gene4"), ("+gene5", "*"), ("-gene6", "-gene6"),
]
_RV_ALN = [
    ("+gene6", "+gene6"), ("-gene5", "*"), ("+gene4", "+gene4"),
    ("-gene3", "-gene3"), ("*", "+gene2"), ("-gene1", "-gene1"),
]


def _reorient_counters():
    g = GeneMerGraph({}, 3)
    genes = ["+gene1", "-gene2", "+gene3", "-gene4", "-gene6"]
    fw, bw = [], []
    for i in range(len(genes) - 2):
        mer = genes[i : i + 3]
        fw.append(tuple(mer))
        bw.append(tuple(g.reverse_list_of_genes(mer)))
    return Counter(fw), Counter(bw)


def test_reorient_alignment_fw():
    fw_counter, bw_counter = _reorient_counters()
    got = reorient_alignment(
        [("+gene3", "-gene4", "-gene6")], fw_counter, bw_counter, _FW_ALN, _RV_ALN
    )
    assert got == _FW_ALN


def test_reorient_alignment_rv():
    fw_counter, bw_counter = _reorient_counters()
    got = reorient_alignment(
        [("+gene6", "+gene4", "-gene3")], fw_counter, bw_counter, _FW_ALN, _RV_ALN
    )
    assert got == _RV_ALN


def test_correct_genes_on_read_all_shared():
    g = GeneMerGraph({}, 3)
    g.get_reads()["read1"] = ["+gene1", "-gene2", "+gene3", "-gene4", "-gene6"]
    got = correct_genes_on_read(
        g, g.get_reads()["read1"], 0, 4, _FW_ALN, "read1"
    )
    assert got == ["+gene1", "+gene3", "-gene4", "+gene5", "-gene6"]


def test_correct_genes_on_read_subset_shared():
    g = GeneMerGraph({}, 3)
    g.get_reads()["read1"] = ["+gene7", "-gene2", "+gene3", "-gene4", "-gene8"]
    aln = [("*", "-gene2"), ("+gene3", "+gene3"), ("-gene4", "-gene4")]
    got = correct_genes_on_read(g, g.get_reads()["read1"], 1, 3, aln, "read1")
    assert got == ["+gene7", "+gene3", "-gene4", "-gene8"]


def test_correct_genes_on_read_duplicates():
    g = GeneMerGraph({}, 3)
    g.get_reads()["read1"] = ["-gene0", "-gene4", "+gene1", "-gene4", "+gene5"]
    aln = [("+gene1", "+gene1"), ("-gene4", "-gene4")]
    got = correct_genes_on_read(g, g.get_reads()["read1"], 2, 3, aln, "read1")
    assert got == ["-gene0", "-gene4", "+gene1", "-gene4", "+gene5"]


# ------------------------------------------------------ find_sublist_indices
# reference test_gene_mer_graph.py:4648-4697


def test_find_sublist_indices_cases():
    ten = ["1", "2", "3", "4", "5", "6", "7", "8", "9", "10"]
    assert find_sublist_indices(ten, ["4", "5", "6"]) == [(3, 5)]
    assert find_sublist_indices(ten, ["11", "12", "13"]) == []
    assert find_sublist_indices(
        ["1", "2", "3", "4", "5", "6", "2", "3", "4", "10"], ["2", "3", "4"]
    ) == [(1, 3), (6, 8)]
    assert find_sublist_indices(ten, ten) == [(0, 9)]
    assert find_sublist_indices(["1"] * 5, ["1"] * 3) == [(0, 2), (1, 3), (2, 4)]


# -------------------------------------------------- intersection matrix
# reference test_gene_mer_graph.py:4697-4753


def test_make_intersection_matrix():
    annotations = {
        "read1": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "+gene6",
                  "+gene7", "+gene8", "+gene9", "+gene10"],
        "read2": ["-gene4", "+gene5", "+gene6", "+gene7", "+gene8", "+gene9",
                  "+gene10"],
        "read3": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "+gene6",
                  "+gene7", "+gene8"],
        "read4": ["+gene3", "-gene4", "+gene5", "+gene6", "+gene7", "+gene8"],
        "read5": ["-gene2", "+gene3", "-gene4", "+gene5", "+gene6", "+gene7",
                  "+gene8", "+gene9"],
        "read6": ["+gene7", "+gene8", "+gene9", "+gene10"],
        "read7": ["+gene3", "-gene4", "+gene5", "+gene6", "+gene7"],
    }
    g = GeneMerGraph(annotations, 3)
    matrix, node_hashes = g.make_intersection_matrix()
    expected = [
        [2, 2, 2, 2, 2, 2, 1, 1],
        [2, 3, 3, 3, 3, 3, 2, 1],
        [2, 3, 5, 5, 5, 4, 2, 1],
        [2, 3, 5, 6, 6, 5, 3, 2],
        [2, 3, 5, 6, 6, 5, 3, 2],
        [2, 3, 4, 5, 5, 5, 3, 2],
        [1, 2, 2, 3, 3, 3, 4, 3],
        [1, 1, 1, 2, 2, 2, 3, 3],
    ]
    assert matrix == expected
    assert len(node_hashes) == 8


# --------------------------------------------- connectivity + path clusters
# reference test_gene_mer_graph.py:4528-4648


def _minhash_fixture():
    from amira_tpu.sketch import MinHash

    seq1 = "ATGGTCTCCGAGCTGCAGCGCCAGCTGGCGCTGCATCGGCAGACCCGCGGTGTAGGGTCTTCGTCGACTGCTT"
    seq2 = "ATGGTCTCCGAGCTGCAGCGCCAGCTTTCGCTGCATCGGCAGACCCGCGGTGTAGGGTCTTCGTCGACTGCTT"
    seq3 = "ATGAGTAGTAGGTCGTCGATCGTCAGCTGGATCTGAGATTCGGATTCGGCGGCTATCGGCTAGTCGACTGCTT"
    sketches = {}
    for key, seq in (((1, 2, 3), seq1), ((1, 4, 3), seq2), ((1, 5, 3), seq3)):
        mh = MinHash(ksize=9, scaled=1)
        mh.add_sequence(seq)
        sketches[key] = mh
    paths = {
        (1, 2, 3): ["read1", "read2", "read3"],
        (1, 4, 3): ["read4", "read5", "read6"],
        (1, 5, 3): ["read7", "read8", "read9"],
    }
    return paths, sketches


def test_assess_connectivity_090():
    paths, sketches = _minhash_fixture()
    g = GeneMerGraph({}, 3)
    conn = g.assess_connectivity(paths, sketches, 0.9)
    assert conn[(1, 2, 3)] == {(1, 4, 3)}
    assert conn[(1, 4, 3)] == {(1, 2, 3)}
    assert conn[(1, 5, 3)] == set()


def test_assess_connectivity_exact():
    paths, sketches = _minhash_fixture()
    g = GeneMerGraph({}, 3)
    conn = g.assess_connectivity(paths, sketches, 1)
    assert all(conn[k] == set() for k in paths)


def test_assess_connectivity_zero():
    paths, sketches = _minhash_fixture()
    g = GeneMerGraph({}, 3)
    conn = g.assess_connectivity(paths, sketches, 0)
    assert conn[(1, 2, 3)] == {(1, 4, 3), (1, 5, 3)}
    assert conn[(1, 4, 3)] == {(1, 2, 3), (1, 5, 3)}
    assert conn[(1, 5, 3)] == {(1, 4, 3), (1, 2, 3)}


def test_cluster_paths_one():
    g = GeneMerGraph({}, 3)
    got = g.cluster_paths({(1, 2, 3): {(1, 4, 3)}, (1, 4, 3): {(1, 2, 3)}, (1, 5, 3): set()})
    assert got == {(1, 2, 3): {(1, 4, 3), (1, 2, 3)}, (1, 5, 3): {(1, 5, 3)}}


def test_cluster_paths_two():
    g = GeneMerGraph({}, 3)
    got = g.cluster_paths({(1, 2, 3): set(), (1, 4, 3): set(), (1, 5, 3): set()})
    assert got == {
        (1, 2, 3): {(1, 2, 3)}, (1, 4, 3): {(1, 4, 3)}, (1, 5, 3): {(1, 5, 3)},
    }


def test_cluster_paths_three():
    g = GeneMerGraph({}, 3)
    got = g.cluster_paths(
        {
            (1, 2, 3): {(1, 4, 3), (1, 5, 3)},
            (1, 4, 3): {(1, 2, 3), (1, 5, 3)},
            (1, 5, 3): {(1, 4, 3), (1, 2, 3)},
        }
    )
    assert got == {(1, 2, 3): {(1, 4, 3), (1, 5, 3), (1, 2, 3)}}


# ------------------------------------------- edge-record construction
# reference test_gene_mer_graph.py:476-1476 builds edges incrementally via
# create_edges/add_edge; this repo's device build emits the same records in
# one pass, so the invariants are asserted on built graphs instead.


@pytest.mark.parametrize(
    "genes",
    [
        ["+gene1", "+gene2", "+gene3", "+gene4"],  # positive to positive
        ["-gene1", "-gene2", "-gene3", "-gene4"],  # negative to negative
        ["+gene1", "-gene2", "+gene3", "-gene4"],  # positive to negative
        ["-gene1", "+gene2", "-gene3", "+gene4"],  # negative to positive
    ],
)
def test_create_edges_companion_invariants(genes):
    g = GeneMerGraph({"read1": genes}, 3)
    edges = list(g.get_edges().values())
    assert len(edges) == 2  # one adjacency -> fwd + companion reverse
    by_key = {e.key: e for e in edges}
    for e in edges:
        # the companion reverse edge: endpoints swapped, both directions
        # negated, same coverage, DIFFERENT key (reference :476-848)
        companions = [
            o
            for o in edges
            if o.src == e.tgt
            and o.tgt == e.src
            and o.src_dir == -e.tgt_dir
            and o.tgt_dir == -e.src_dir
        ]
        assert len(companions) == 1
        assert companions[0].key != e.key
        assert companions[0].coverage == e.coverage
    # both keys registered on their source nodes' edge lists
    for e in edges:
        node = g.get_node_by_hash(e.src)
        assert e.key in (node.fwd_edges if e.src_dir == 1 else node.bwd_edges)
    assert len(by_key) == 2


def test_add_duplicate_edges_increment_coverage():
    # reference :1013-1056 — adding the same adjacency twice doubles edge
    # coverage without creating new records
    g1 = GeneMerGraph({"r1": ["+g1", "-g2", "+g3", "-g4"]}, 3)
    g2 = GeneMerGraph(
        {"r1": ["+g1", "-g2", "+g3", "-g4"], "r2": ["+g1", "-g2", "+g3", "-g4"]},
        3,
    )
    assert len(g2.get_edges()) == len(g1.get_edges()) == 2
    assert all(e.coverage == 1 for e in g1.get_edges().values())
    assert all(e.coverage == 2 for e in g2.get_edges().values())


def test_remove_existing_edge():
    # reference :1795-1836 — removing an edge detaches it from both the
    # edge table and its source node's hash list
    g = GeneMerGraph({"read1": ["+g1", "-g2", "+g3", "-g4", "+g5"]}, 3)
    nodes = _read_nodes(g)
    key = g.get_edge_hashes_between_nodes(nodes[0], nodes[1])[0]
    g.remove_edge(key)
    assert key not in g.get_edges()
    for n in g.all_nodes():
        assert key not in n.fwd_edges and key not in n.bwd_edges


def test_remove_node_from_reads_one_copy():
    # reference :2171-2188 — the removed node's slot becomes None
    g = GeneMerGraph({"read1": ["+gene1", "-gene2", "+gene3", "-gene4", "+gene5"]}, 3)
    rn = list(g.get_readNodes()["read1"])
    node = g.get_node_by_hash(rn[1])
    g.remove_node_from_reads(node)
    assert g.get_readNodes()["read1"] == [rn[0], None, rn[2]]


def test_remove_node_from_reads_more_than_one_copy():
    # reference :2188-2213 — EVERY duplicate occurrence of the node on the
    # read becomes None, not just the first
    genes = ["+g1", "-g2", "+g3", "-g4", "+g5", "+g1", "-g2", "+g3"]
    g = GeneMerGraph({"read1": genes}, 3)
    rn = list(g.get_readNodes()["read1"])
    dup = rn[0]
    assert rn.count(dup) == 2  # gene-mer (+g1,-g2,+g3) occurs twice
    g.remove_node_from_reads(g.get_node_by_hash(dup))
    expected = [None if h == dup else h for h in rn]
    assert g.get_readNodes()["read1"] == expected
    assert g.get_readNodes()["read1"].count(None) == 2


def test_get_nodes_containing_read_filtered_graph():
    # reference :2149-2171 — after filtering, only surviving nodes of the
    # read are returned
    genes1 = [
        "+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "+gene9",
        "-gene6", "+gene7", "+gene3", "-gene4", "+gene5",
    ]
    g = GeneMerGraph({"read1": genes1}, 3)
    g.filter_graph(2, 2)
    assert len(g.get_nodes_containing_read("read1")) == 2


# --------------------------------------------------- get_nodes_containing
# reference test_gene_mer_graph.py:330-476

_GNC_GENES = [
    "+gene1", "-gene2", "+gene3", "-gene4", "+gene5", "-gene6",
    "-gene3", "+gene2", "-gene1",
]


def test_get_nodes_containing_subset():
    g = _linear(_GNC_GENES)
    for gene in ("gene2", "gene6"):
        nodes = g.get_nodes_containing(gene)
        assert len(nodes) == 3
        for n in nodes:
            assert any(x[1:] == gene for x in g.get_gene_mer_genes(n))


def test_get_nodes_containing_all():
    g = _linear(_GNC_GENES)
    selected = [x[1:] for x in _GNC_GENES]
    expected_counts = [1, 3, 5, 3, 3, 3, 5, 3, 1]
    for gene, expected in zip(selected, expected_counts):
        nodes = g.get_nodes_containing(gene)
        assert len(nodes) == expected
        for n in nodes:
            assert any(x[1:] == gene for x in g.get_gene_mer_genes(n))


def test_get_nodes_containing_gene_not_in_graph():
    g = _linear(_GNC_GENES)
    assert g.get_nodes_containing("gene10") == []


def test_get_nodes_containing_rejects_stranded_names():
    g = _linear(_GNC_GENES)
    with pytest.raises(AssertionError):
        g.get_nodes_containing("+gene6")
    with pytest.raises(AssertionError):
        g.get_nodes_containing("-gene2")
