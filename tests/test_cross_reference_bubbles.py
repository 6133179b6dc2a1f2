"""Cross-implementation parity for the LAST two un-compared layers: bubble
popping (correct_low_coverage_paths, construct_graph.py:1482-2265) and AMR
path clustering (assign_reads_to_genes, construct_graph.py:2880-2939).

The upstream implementation runs IN-PROCESS from the read-only reference
checkout via faithful stand-ins for its external deps (tests/ref_shims.py):
a substring-search `suffix_tree.Tree` with the library's find_all/str(path)
semantics, and a `sourmash.MinHash` that wraps this repo's FracMinHash so
both implementations share the sketch primitive — containment-gate
decisions are then identical by construction and every difference observed
is a difference in graph/path/splice logic.
"""

import copy
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ref_shims import install_reference_shims  # noqa: E402

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/test_path_calls.json"),
    reason="reference checkout unavailable",
)


def _load(name):
    with open(f"{REF}/{name}") as i:
        return json.load(i)


def _master_slice_fastq(positions, seed=5):
    """Per-read sequences sliced from one random master string: sketches
    are non-empty and varied (degenerate all-A sequences collapse every
    sketch to at most one hash, which the upstream gate divides by)."""
    import random as _random

    import numpy as np

    rng = np.random.RandomState(seed)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    master = lut[rng.randint(0, 4, size=4_000_000)].tobytes().decode()
    py_rng = _random.Random(13)
    fastq = {}
    for r, pos in positions.items():
        span = (max(p[1] for p in pos) + 1) if pos else 1
        off = py_rng.randrange(0, max(1, len(master) - span))
        fastq[r] = {"sequence": master[off : off + span]}
    return fastq


def _norm_positions(pos_dict):
    return {r: [tuple(p) for p in v] for r, v in pos_dict.items()}


def _run_bubble_pop(graph_cls_or_graph, calls, positions, fastq, k,
                    min_cov, min_path_cov, genes=frozenset()):
    g = graph_cls_or_graph(dict(calls), k, copy.deepcopy(positions))
    if min_cov:
        g.filter_graph(min_cov, 1)
    reads, pos, covs, mpc = g.correct_low_coverage_paths(
        fastq, set(genes), 1, min_path_cov, set(), True
    )
    return dict(reads), _norm_positions(pos), sorted(covs), mpc


@pytest.mark.parametrize("min_path_cov", [5, 10])
def test_bubble_popping_matches_upstream_junction_fixture(min_path_cov):
    """test_path_calls.json + the real test_1.fastq.gz sequences: the
    containment gate sees realistic ~0.91 containment between the two
    bubble arms, and the corrected reads/positions must match the upstream
    implementation byte-for-byte."""
    RefGraph = install_reference_shims()
    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.io import parse_fastq

    calls = _load("test_path_calls.json")
    positions = _load("test_path_positions.json")
    fastq = parse_fastq(f"{REF}/test_1.fastq.gz")

    ref = _run_bubble_pop(
        RefGraph, calls, positions, fastq, 3, 3, min_path_cov
    )
    ours = _run_bubble_pop(
        GeneMerGraph, calls, positions, fastq, 3, 3, min_path_cov
    )
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]
    assert ours[2] == ref[2]
    assert ours[3] == ref[3]


@pytest.mark.parametrize(
    "name,k,min_path_cov",
    [("three", 3, 5), ("five", 3, 5)],
)
def test_bubble_popping_matches_upstream_complex(name, k, min_path_cov):
    """Real complex fixtures with per-read random master-string slices:
    exercises junction enumeration, path filtering, sketch-gate decisions,
    operation selection, and read splicing end-to-end against the upstream
    implementation."""
    RefGraph = install_reference_shims()
    from amira_tpu.graph import GeneMerGraph

    calls = _load(f"complex_gene_calls_{name}.json")
    pos_path = f"{REF}/complex_gene_positions_{name}.json"
    if os.path.exists(pos_path):
        positions = _load(f"complex_gene_positions_{name}.json")
    else:
        positions = {
            r: [[i * 100, i * 100 + 99] for i in range(len(g))]
            for r, g in calls.items()
        }
    fastq = _master_slice_fastq(positions)

    ref = _run_bubble_pop(RefGraph, calls, positions, fastq, k, 3, min_path_cov)
    ours = _run_bubble_pop(
        GeneMerGraph, calls, positions, fastq, k, 3, min_path_cov
    )
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]
    assert ours[2] == ref[2]


def test_bubble_popping_fixture_nine_enumeration_exact_filter_bounded():
    """Fixture nine: the junction-path ENUMERATION layer is exact — the
    canonical pre-filter path sets are identical — but the upstream
    containment filter (filter_paths_between_bubble_starts,
    construct_graph.py:2125-2146) picks each path's stored representative
    by sorting its (node_hash, dir) tuple against its reversal
    (construct_graph.py:2094-2096) and then matches LITERAL pair
    subsequences (the reversed probe does not flip directions), so which
    containments are detected depends on the hash values themselves. Any
    reimplementation with a different node hash therefore diverges on
    hash-order ties; this test pins the enumeration parity exactly and
    bounds the end-to-end read divergence."""
    RefGraph = install_reference_shims()
    from amira_tpu.bubbles import (
        filter_paths_between_bubble_starts,
        get_all_paths_between_junctions_in_component,
        identify_potential_bubble_starts,
    )
    from amira_tpu.graph import GeneMerGraph

    calls = _load("complex_gene_calls_nine.json")
    positions = {
        r: [[i * 100, i * 100 + 99] for i in range(len(g))]
        for r, g in calls.items()
    }

    rg = RefGraph(dict(calls), 3, copy.deepcopy(positions))
    rg.filter_graph(3, 1)
    og = GeneMerGraph(dict(calls), 3, copy.deepcopy(positions))
    og.filter_graph(3, 1)

    def canon_paths_ref():
        out = set()
        for _c, sl in rg.identify_potential_bubble_starts().items():
            for p in rg.get_all_paths_between_junctions_in_component(
                sl, rg.get_kmerSize() * 4, 1
            ):
                gs = rg.get_genes_in_unitig([n[0] for n in p])
                out.add(tuple(sorted([gs, rg.reverse_list_of_genes(gs)])[0]))
        return out

    def canon_paths_ours():
        out = set()
        for _c, sl in identify_potential_bubble_starts(og).items():
            for p in get_all_paths_between_junctions_in_component(
                og, sl, og.get_kmerSize() * 4
            ):
                gs = og.get_genes_in_unitig([n[0] for n in p])
                out.add(tuple(sorted([gs, og.reverse_list_of_genes(gs)])[0]))
        return out

    assert canon_paths_ref() == canon_paths_ours()

    # end-to-end divergence stays bounded: the hash-order ties affect only
    # which of several mutually-contained alternatives is corrected
    fastq = _master_slice_fastq(positions)
    ref = _run_bubble_pop(RefGraph, calls, positions, fastq, 3, 3, 10)
    ours = _run_bubble_pop(GeneMerGraph, calls, positions, fastq, 3, 3, 10)
    differing = sum(1 for r in ref[0] if ours[0].get(r) != ref[0][r])
    assert differing / len(ref[0]) < 0.06  # measured 216/4832 = 4.5%


def test_bubble_popping_amr_guard_matches_upstream():
    """AMR genes are never deleted by a correction
    (construct_graph.py:1877-1881) — parity with genesOfInterest set."""
    RefGraph = install_reference_shims()
    from amira_tpu.graph import GeneMerGraph

    calls = _load("complex_gene_calls_three.json")
    positions = _load("complex_gene_positions_three.json")
    fastq = _master_slice_fastq(positions)
    genes = {"mphANG_0479861"}

    ref = _run_bubble_pop(
        RefGraph, calls, positions, fastq, 3, 3, 5, genes
    )
    ours = _run_bubble_pop(
        GeneMerGraph, calls, positions, fastq, 3, 3, 5, genes
    )
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]


def _normalize_clusters(clustered_reads):
    """Allele NUMBERING follows dict/anchor iteration order upstream
    (split_into_subpaths insertion order), which is node-hash-order
    dependent — compare the partition of read spans per (component, gene)
    instead of the arbitrary _N suffixes."""
    out = {}
    for component, genes in clustered_reads.items():
        for gene, alleles in genes.items():
            part = sorted(
                tuple(sorted(members)) for members in alleles.values()
            )
            out[(component, gene)] = part
    return out


def _normalize_path_reads(path_reads, genes):
    """Path keys embed per-occurrence ``_N`` suffixes on the gene of
    interest (split_into_subpaths naming), assigned in hash-dependent
    iteration order — strip them before comparing."""
    import re

    pats = [
        (re.compile(rf"^([+-]){re.escape(g)}_\d+$"), g) for g in genes
    ]

    def norm_tok(tok):
        for pat, g in pats:
            m = pat.match(tok)
            if m:
                return m.group(1) + g
        return tok

    return {
        tuple(norm_tok(t) for t in key): sorted(reads)
        for key, reads in path_reads.items()
    }


@pytest.mark.parametrize(
    "name,genes",
    [
        ("three", ["mphANG_0479861"]),
        ("five", ["dfrA17NG_0481541"]),
    ],
)
def test_assign_reads_to_genes_matches_upstream(name, genes):
    """Read->allele clustering parity on real fixtures: identical cluster
    structure, member read spans, and path_reads support sets. (Fixture
    nine carries the documented reverse-orientation context divergence —
    bounded separately by tests/test_cluster_divergence.py.)"""
    RefGraph = install_reference_shims()
    from amira_tpu.graph import GeneMerGraph

    calls = _load(f"complex_gene_calls_{name}.json")
    pos_path = f"{REF}/complex_gene_positions_{name}.json"
    if os.path.exists(pos_path):
        positions = _load(f"complex_gene_positions_{name}.json")
    else:
        positions = {
            r: [[i * 100, i * 100 + 99] for i in range(len(g))]
            for r, g in calls.items()
        }

    rg = RefGraph(dict(calls), 3, copy.deepcopy(positions))
    ref_clusters, ref_path_reads = rg.assign_reads_to_genes(genes, 1, {})

    og = GeneMerGraph(dict(calls), 3, copy.deepcopy(positions))
    our_clusters, our_path_reads = og.assign_reads_to_genes(genes, 1, {})

    assert _normalize_clusters(our_clusters) == _normalize_clusters(
        ref_clusters
    )
    assert _normalize_path_reads(
        our_path_reads, genes
    ) == _normalize_path_reads(ref_path_reads, genes)
