"""k selection, coverage-trough estimation, per-k mean node coverages."""

import numpy as np

from amira_tpu.graph import GeneMerGraph
from amira_tpu.graph_utils import (
    choose_kmer_size,
    estimate_min_path_coverage,
    get_overall_mean_node_coverages,
)


def test_estimate_min_path_coverage_bimodal():
    """Error peak near 2x and signal peak near 60x -> trough in between."""
    rng = np.random.RandomState(0)
    covs = np.concatenate(
        [
            rng.poisson(2, 400) + 1,  # error nodes
            rng.poisson(60, 300),  # signal nodes
        ]
    )
    trough = estimate_min_path_coverage(covs.tolist())
    assert 5 <= trough <= 45, trough


def test_choose_kmer_size_low_coverage_stays_3():
    reads = {f"r{i}": ["+a", "+b", "+c", "+amrX", "+d"] for i in range(4)}
    positions = {
        r: [(j * 10, j * 10 + 9) for j in range(5)] for r in reads
    }
    # mean coverage < 20 -> k stays 3 regardless of read lengths
    k = choose_kmer_size(4.0, reads, 1, positions, {"amrX"})
    assert k == 3


def test_choose_kmer_size_high_coverage_grows():
    genes = [f"+g{i}" for i in range(6)] + ["+amrX"] + [f"+g{i}" for i in range(6, 12)]
    reads = {f"r{i}": list(genes) for i in range(30)}
    positions = {r: [(j * 10, j * 10 + 9) for j in range(len(genes))] for r in reads}
    k = choose_kmer_size(50.0, reads, 1, positions, {"amrX"})
    # 13 genes per read: 2k-1 <= 13 holds through k=7
    assert k == 7


def test_overall_mean_node_coverages_monotone():
    reads = {}
    for i in range(10):
        reads[f"long{i}"] = [f"+g{j}" for j in range(9)]
    for i in range(10):
        reads[f"short{i}"] = ["+g0", "+g1", "+g2"]
    g = GeneMerGraph(reads, 3)
    covs = get_overall_mean_node_coverages(g)
    assert set(covs) == {3, 5, 7, 9, 11, 13, 15}
    # coverage contribution shrinks as the k threshold grows
    assert covs[3] >= covs[9] >= covs[15]


# ---------------------------------------------------------------------------
# lazy-table paths == object paths (VERDICT r2 #8: k selection and per-k mean
# coverages must not materialize the object graph)


def _fixture_reads():
    import json

    calls = json.load(open("/root/reference/tests/complex_gene_calls_three.json"))
    positions = {
        r: [(i * 100, i * 100 + 99) for i in range(len(g))]
        for r, g in calls.items()
    }
    return calls, positions


def test_mean_node_coverages_lazy_matches_object():
    from amira_tpu.graph_cache import GraphBuildCache

    calls, positions = _fixture_reads()
    g_obj = GeneMerGraph(dict(calls), 3, dict(positions))
    got_obj = get_overall_mean_node_coverages(g_obj)
    g_lazy = GeneMerGraph(dict(calls), 3, dict(positions), cache=GraphBuildCache())
    assert g_lazy.is_lazy
    got_lazy = get_overall_mean_node_coverages(g_lazy)
    assert g_lazy.is_lazy, "lazy path must not materialize"
    assert set(got_obj) == set(got_lazy)
    for k in got_obj:
        assert abs(got_obj[k] - got_lazy[k]) < 1e-9, (k, got_obj[k], got_lazy[k])


def test_choose_kmer_size_lazy_matches_object():
    from amira_tpu.graph_cache import GraphBuildCache
    from amira_tpu.vocab import GeneVocab

    calls, positions = _fixture_reads()
    amr = set()
    for genes in calls.values():
        for g in genes:
            if "bla" in g or "aac" in g or "aph" in g:
                amr.add(g[1:])
    assert amr, "fixture should contain AMR-like genes"
    k_obj = choose_kmer_size(50.0, calls, 1, positions, amr, vocab=GeneVocab())
    k_lazy = choose_kmer_size(
        50.0, calls, 1, positions, amr, vocab=GeneVocab(), cache=GraphBuildCache()
    )
    assert k_obj == k_lazy


def test_choose_kmer_size_lazy_matches_object_synthetic():
    from amira_tpu.graph_cache import GraphBuildCache
    from amira_tpu.vocab import GeneVocab

    # mixed read lengths so higher k invalidates some components
    reads = {}
    for i in range(25):
        reads[f"long{i}"] = [f"+g{j}" for j in range(5)] + ["+amrX"] + [
            f"+g{j}" for j in range(5, 10)
        ]
    for i in range(25):
        reads[f"short{i}"] = ["+h0", "+amrY", "+h1", "+h2"]
    positions = {
        r: [(j * 10, j * 10 + 9) for j in range(len(g))] for r, g in reads.items()
    }
    k_obj = choose_kmer_size(
        50.0, reads, 1, positions, {"amrX", "amrY"}, vocab=GeneVocab()
    )
    k_lazy = choose_kmer_size(
        50.0, reads, 1, positions, {"amrX", "amrY"},
        vocab=GeneVocab(), cache=GraphBuildCache(),
    )
    assert k_obj == k_lazy
