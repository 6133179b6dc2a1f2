"""Cross-implementation parity: run the UPSTREAM implementation (from the
read-only reference checkout, with its binary-needing imports stubbed) next
to this repo's on the same real fixtures, and require byte-identical
corrected gene calls and positions.

This is the strongest parity statement available without the external
binaries (pandora/minimap2/racon): the reference's graph build, coverage
filter, read correction and tip trimming are pure Python and run directly.
Covers construct_graph.py:31-102 (build), :496-540 (filter), :1123-1480
(correction), :679-720 (tip trimming)."""

import copy
import importlib
import json
import os
import sys
import types

import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_ROOT, "amira", "construct_graph.py")),
    reason="reference checkout not available",
)


def _load_reference_graph_class():
    """Import the upstream GeneMerGraph, stubbing only modules that are NOT
    installed in this environment (sourmash, suffix_tree, pysam...)."""
    for name in (
        "sourmash", "suffix_tree", "joblib", "tqdm", "pysam",
    ):
        try:
            importlib.import_module(name)
        except ImportError:
            mod = types.ModuleType(name)
            if name == "joblib":
                mod.Parallel = lambda *a, **k: None
                mod.delayed = lambda f: f
            if name == "tqdm":
                mod.tqdm = lambda x, **k: x
            if name == "suffix_tree":
                mod.Tree = object
            sys.modules[name] = mod
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from amira.construct_graph import GeneMerGraph as RefGraph

    return RefGraph


def _fixture(name):
    calls = json.load(
        open(f"{REF_ROOT}/tests/complex_gene_calls_{name}.json")
    )
    pos_path = f"{REF_ROOT}/tests/complex_gene_positions_{name}.json"
    if os.path.exists(pos_path):
        positions = json.load(open(pos_path))
    else:
        positions = {
            r: [[i * 100, i * 100 + 99] for i in range(len(g))]
            for r, g in calls.items()
        }
    entry = {"sequence": "A" * 2_000_000, "quality": "I" * 10}
    fastq = {r: entry for r in calls}
    return calls, positions, fastq


def _norm_positions(pos_dict):
    return {r: [tuple(p) for p in v] for r, v in pos_dict.items()}


@pytest.mark.parametrize(
    "name,k,min_cov",
    [("nine", 3, 2), ("nine", 5, 3), ("five", 3, 2), ("three", 3, 3)],
)
def test_filter_and_correct_matches_upstream(name, k, min_cov):
    RefGraph = _load_reference_graph_class()
    from amira_tpu.graph import GeneMerGraph

    calls, positions, fastq = _fixture(name)

    rg = RefGraph(dict(calls), k, copy.deepcopy(positions))
    rg.filter_graph(min_cov, 1)
    ref_out = rg.correct_reads(fastq)
    ref_genes, ref_pos = (
        ref_out if isinstance(ref_out, tuple) else (ref_out, None)
    )

    og = GeneMerGraph(dict(calls), k, copy.deepcopy(positions))
    og.filter_graph(min_cov, 1)
    assert len(og.get_nodes()) == len(rg.get_nodes())
    our_genes, our_pos = og.correct_reads(fastq)

    assert list(our_genes.keys()) == list(ref_genes.keys())
    assert our_genes == ref_genes
    if ref_pos is not None:
        assert _norm_positions(our_pos) == _norm_positions(ref_pos)


@pytest.mark.parametrize("name,k", [("nine", 3), ("five", 3)])
def test_tip_trim_and_correct_matches_upstream(name, k):
    RefGraph = _load_reference_graph_class()
    from amira_tpu.graph import GeneMerGraph

    calls, positions, fastq = _fixture(name)

    rg = RefGraph(dict(calls), k, copy.deepcopy(positions))
    rg.remove_short_linear_paths(k)
    ref_out = rg.correct_reads(fastq)
    ref_genes = ref_out[0] if isinstance(ref_out, tuple) else ref_out

    og = GeneMerGraph(dict(calls), k, copy.deepcopy(positions))
    og.remove_short_linear_paths(k)
    our_genes, _ = og.correct_reads(fastq)

    assert our_genes == ref_genes


def test_chained_cleaning_matches_upstream():
    """Two chained iterations of {build, filter, correct, build, tips,
    correct} — the cleaning loop's shape — stay byte-identical, through this
    repo's TENSOR path (the one the pipeline actually runs)."""
    RefGraph = _load_reference_graph_class()
    from amira_tpu import clean
    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.graph_cache import GraphBuildCache
    from amira_tpu.vocab import GeneVocab

    calls, positions, fastq = _fixture("nine")
    k, min_cov = 3, 2

    ref_reads, ref_pos = dict(calls), copy.deepcopy(positions)
    for _ in range(2):
        rg = RefGraph(ref_reads, k, ref_pos)
        rg.filter_graph(min_cov, 1)
        out = rg.correct_reads(fastq)
        ref_reads, ref_pos = out if isinstance(out, tuple) else (out, ref_pos)
        rg = RefGraph(ref_reads, k, ref_pos)
        rg.remove_short_linear_paths(k)
        out = rg.correct_reads(fastq)
        ref_reads, ref_pos = out if isinstance(out, tuple) else (out, ref_pos)

    vocab, cache = GeneVocab(), GraphBuildCache()
    our_reads, our_pos = dict(calls), copy.deepcopy(positions)
    for _ in range(2):
        g = GeneMerGraph(our_reads, k, our_pos, vocab=vocab, cache=cache)
        our_reads, our_pos = clean.filter_and_correct(g, min_cov, fastq)
        g = GeneMerGraph(our_reads, k, our_pos, vocab=vocab, cache=cache)
        our_reads, our_pos = clean.tip_trim_and_correct(g, k, fastq)

    assert our_reads == ref_reads
    assert _norm_positions(our_pos) == _norm_positions(ref_pos)
