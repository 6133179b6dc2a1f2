"""Component removal, junk-read filtering, and GML read-list order."""

from amira_tpu.graph import GeneMerGraph


def test_remove_low_coverage_components():
    reads = {}
    for i in range(6):
        reads[f"good{i}"] = ["+a", "+b", "+c", "+d"]
    reads["lone"] = ["+x", "+y", "+z"]
    g = GeneMerGraph(reads, 3)
    assert g.get_number_of_component() == 2
    g.remove_low_coverage_components(5)
    # the single-read component (all coverages 1 < 5) is gone; the good one
    # (coverages 6) stays
    g.assign_component_ids()
    assert g.get_number_of_component() == 1
    assert all(n.coverage >= 5 for n in g.all_nodes())


def test_remove_junk_reads():
    reads = {
        "clean": ["+a", "+b", "+c", "+d", "+e"],
        "junky": ["+a", "+b", "+c", "+q1", "+q2", "+q3", "+q4", "+q5"],
    }
    for i in range(4):
        reads[f"support{i}"] = ["+a", "+b", "+c", "+d", "+e"]
    positions = {
        r: [(j * 10, j * 10 + 9) for j in range(len(reads[r]))] for r in reads
    }
    g = GeneMerGraph(reads, 3, positions)
    g.filter_graph(2, 1)  # q-nodes have coverage 1 -> removed
    new_reads, new_pos, rejected, rejected_pos = g.remove_junk_reads(0.80)
    # junky lost 5/6 of its nodes (>20%) -> rejected
    assert "junky" in rejected
    assert "clean" in new_reads
    assert set(new_reads) | set(rejected) == set(reads)
    assert len(new_pos["clean"]) == 5


def test_node_read_lists_first_occurrence_order():
    reads = {
        "r3": ["+a", "+b", "+c"],
        "r1": ["+a", "+b", "+c"],
        "r2": ["+a", "+b", "+c"],
    }
    g = GeneMerGraph(reads, 3)
    node = next(g.all_nodes())
    # insertion (dict) order of the read dict, not lexicographic
    assert node.reads == ["r3", "r1", "r2"]
