"""Tensor cleaning phases == object-graph cleaning phases, exactly.

The lazy table path (amira_tpu/clean.py) must reproduce the object path
(graph.filter_graph + correct_reads, remove_short_linear_paths +
correct_reads) byte-for-byte on real fixtures: same corrected gene lists,
same remapped positions, across chained iterations."""

import copy
import json
import os

import pytest

from amira_tpu import clean
from amira_tpu.graph import GeneMerGraph
from amira_tpu.graph_cache import GraphBuildCache
from amira_tpu.vocab import GeneVocab

REF = "/root/reference/tests"


def _fixture(name):
    calls = json.load(open(f"{REF}/complex_gene_calls_{name}.json"))
    pos_path = f"{REF}/complex_gene_positions_{name}.json"
    if os.path.exists(pos_path):
        positions = json.load(open(pos_path))
        positions = {r: [tuple(p) for p in positions[r]] for r in positions}
    else:
        positions = {
            r: [(i * 100, i * 100 + 99) for i in range(len(g))]
            for r, g in calls.items()
        }
    entry = {"sequence": "A" * 1_000_000, "quality": "I" * 10}
    fastq = {r: entry for r in calls}  # shared: only the length is read
    return calls, positions, fastq


def _object_filter_correct(calls, positions, fastq, k, min_cov, vocab):
    g = GeneMerGraph(dict(calls), k, copy.deepcopy(positions), vocab=vocab)
    g.filter_graph(min_cov, 1)
    return g.correct_reads(fastq)

def _tensor_filter_correct(calls, positions, fastq, k, min_cov, vocab):
    cache = GraphBuildCache()
    g = GeneMerGraph(dict(calls), k, copy.deepcopy(positions), vocab=vocab, cache=cache)
    assert g.is_lazy
    return clean.filter_and_correct(g, min_cov, fastq)


def _object_tips_correct(calls, positions, fastq, k, vocab):
    g = GeneMerGraph(dict(calls), k, copy.deepcopy(positions), vocab=vocab)
    g.remove_short_linear_paths(k)
    return g.correct_reads(fastq)

def _tensor_tips_correct(calls, positions, fastq, k, vocab):
    cache = GraphBuildCache()
    g = GeneMerGraph(dict(calls), k, copy.deepcopy(positions), vocab=vocab, cache=cache)
    assert g.is_lazy
    return clean.tip_trim_and_correct(g, k, fastq)


def _assert_same(a, b):
    genes_a, pos_a = a
    genes_b, pos_b = b
    assert list(genes_a.keys()) == list(genes_b.keys())
    for r in genes_a:
        assert genes_a[r] == genes_b[r], r
    assert list(pos_a.keys()) == list(pos_b.keys())
    for r in pos_a:
        assert [tuple(p) for p in pos_a[r]] == [tuple(p) for p in pos_b[r]], r


@pytest.mark.parametrize(
    "name,k,min_cov",
    [("nine", 3, 2), ("nine", 3, 3), ("five", 3, 2), ("five", 5, 2), ("three", 3, 3)],
)
def test_filter_correct_parity(name, k, min_cov):
    calls, positions, fastq = _fixture(name)
    vocab = GeneVocab()
    obj = _object_filter_correct(calls, positions, fastq, k, min_cov, vocab)
    ten = _tensor_filter_correct(calls, positions, fastq, k, min_cov, vocab)
    _assert_same(obj, ten)


@pytest.mark.parametrize("name,k", [("nine", 3), ("five", 3), ("five", 5), ("three", 3)])
def test_tip_trim_correct_parity(name, k):
    calls, positions, fastq = _fixture(name)
    vocab = GeneVocab()
    obj = _object_tips_correct(calls, positions, fastq, k, vocab)
    ten = _tensor_tips_correct(calls, positions, fastq, k, vocab)
    _assert_same(obj, ten)


@pytest.mark.parametrize("name", ["nine", "five"])
def test_chained_iterations_parity(name):
    """Two full cleaning iterations (filter+correct, rebuild, tips+correct,
    rebuild) chained through both paths give identical read sets."""
    calls, positions, fastq = _fixture(name)
    k, min_cov = 3, 2

    # object path
    vocab_o = GeneVocab()
    reads_o, pos_o = dict(calls), copy.deepcopy(positions)
    for _ in range(2):
        g = GeneMerGraph(reads_o, k, pos_o, vocab=vocab_o)
        g.filter_graph(min_cov, 1)
        reads_o, pos_o = g.correct_reads(fastq)
        g = GeneMerGraph(reads_o, k, pos_o, vocab=vocab_o)
        g.remove_short_linear_paths(k)
        reads_o, pos_o = g.correct_reads(fastq)

    # tensor path (shared incremental cache, as the pipeline runs it)
    vocab_t = GeneVocab()
    cache = GraphBuildCache()
    reads_t, pos_t = dict(calls), copy.deepcopy(positions)
    for _ in range(2):
        g = GeneMerGraph(reads_t, k, pos_t, vocab=vocab_t, cache=cache)
        reads_t, pos_t = clean.filter_and_correct(g, min_cov, fastq)
        g = GeneMerGraph(reads_t, k, pos_t, vocab=vocab_t, cache=cache)
        reads_t, pos_t = clean.tip_trim_and_correct(g, k, fastq)

    _assert_same((reads_o, pos_o), (reads_t, pos_t))
