"""Smaller inventory utilities: intersection trimming, subgraph paths,
union-find merging, assembly, downsampling."""

import gzip
import os

import numpy as np

from amira_tpu.graph import GeneMerGraph
from amira_tpu.preprocess import clean_gene


def test_intersection_matrix_and_fringe_trim():
    reads = {
        "r1": ["+a", "+b", "+c", "+d"],
        "r2": ["+a", "+b", "+c", "+d"],
        "r3": ["+x", "+y", "+z"],
    }
    g = GeneMerGraph(reads, 3)
    matrix, node_hashes = g.make_intersection_matrix()
    n = len(node_hashes)
    assert len(matrix) == n and len(matrix[0]) == n
    # nodes of the abcd component intersect in 2 reads; xyz node in 1
    g.trim_fringe_nodes(2, matrix, node_hashes)
    assert g.get_total_number_of_nodes() == 2  # xyz node removed


def test_subgraph_paths_and_anchors():
    reads = {"r1": ["+a", "+b", "+c", "+d", "+e", "+f"]}
    g = GeneMerGraph(reads, 3)
    hashes = g.get_readNodes()["r1"]
    anchors, junctions = g.get_anchors_of_interest(hashes)
    assert len(anchors) == 2  # the two ends of the linear path
    assert junctions == set()
    paths = g.all_paths_for_subgraph(hashes, anchors)
    assert len(paths) == 1
    found = list(paths.values())[0]
    assert sorted(found[0]) == sorted(hashes) or len(found[0]) == len(hashes)


def test_union_find_cluster_paths():
    g = GeneMerGraph({"r": ["+a", "+b", "+c"]}, 3)
    clusters = {"p1": {"p2"}, "p2": {"p1"}, "p3": set()}
    merged = g.cluster_paths(clusters)
    groups = sorted(sorted(v) for v in merged.values())
    assert groups == [["p1", "p2"], ["p3"]]


def test_clean_gene():
    assert clean_gene("bla(TEM)-1*") == "blaTEM1"


def test_assemble_path(tmp_path):
    from amira_tpu.assembly import assemble_path

    rng = np.random.RandomState(0)
    truth = "".join(rng.choice(list("ACGT"), size=900))
    fq = tmp_path / "reads.fastq.gz"
    with gzip.open(fq, "wt") as o:
        for i in range(12):
            seq = truth
            o.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = assemble_path(str(fq), str(tmp_path / "asm"), band_width=128)
    assert out is not None and os.path.exists(out)
    with open(out) as i:
        contig = "".join(i.read().split("\n")[1:])
    assert contig == truth


def test_downsample_reads(tmp_path):
    from amira_tpu.io import downsample_reads, parse_fastq

    content = {
        f"r{i}": {"sequence": "ACGT", "quality": "IIII"} for i in range(50)
    }
    out = downsample_reads(content, None, str(tmp_path), max_reads=10, seed=1)
    sub = parse_fastq(out)
    assert len(sub) == 10
    assert os.path.exists(tmp_path / "selected_reads.txt")
