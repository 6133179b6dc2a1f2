"""The incremental build cache must produce graphs identical to the direct
device build — same dict insertion orders, coverages, read lists, edge
endpoint records — across repeated rebuilds and read mutations."""

import json
import os

import pytest

from amira_tpu.graph import GeneMerGraph
from amira_tpu.graph_cache import GraphBuildCache
from amira_tpu.vocab import GeneVocab

REF = "/root/reference/tests"


def assert_graphs_identical(a, b):
    assert list(a.get_nodes().keys()) == list(b.get_nodes().keys())
    for h, na in a.get_nodes().items():
        nb = b.get_nodes()[h]
        assert na.coverage == nb.coverage
        assert na.tokens.tolist() == nb.tokens.tolist()
        assert na.reads == nb.reads
        assert na.fwd_edges == nb.fwd_edges
        assert na.bwd_edges == nb.bwd_edges
        assert na.component == nb.component
    assert list(a.get_edges().keys()) == list(b.get_edges().keys())
    for k, ea in a.get_edges().items():
        eb = b.get_edges()[k]
        assert (ea.src, ea.tgt, ea.src_dir, ea.tgt_dir, ea.coverage) == (
            eb.src, eb.tgt, eb.src_dir, eb.tgt_dir, eb.coverage
        )
    assert a.get_readNodes() == b.get_readNodes()
    assert a.get_readNodeDirections() == b.get_readNodeDirections()
    assert a.get_readNodePositions() == b.get_readNodePositions()
    assert a.get_short_read_annotations() == b.get_short_read_annotations()


def _fixture(name):
    calls = json.load(open(f"{REF}/complex_gene_calls_{name}.json"))
    pos_path = f"{REF}/complex_gene_positions_{name}.json"
    if os.path.exists(pos_path):
        positions = json.load(open(pos_path))
    else:
        positions = {
            r: [[i * 100, i * 100 + 99] for i in range(len(g))]
            for r, g in calls.items()
        }
    return calls, positions


@pytest.mark.parametrize("name,k", [("nine", 3), ("five", 5)])
def test_cached_build_matches_device_build(name, k):
    calls, positions = _fixture(name)
    vocab = GeneVocab()
    plain = GeneMerGraph(calls, k, positions, vocab=vocab)
    cache = GraphBuildCache()
    cached = GeneMerGraph(calls, k, positions, vocab=vocab, cache=cache)
    assert_graphs_identical(plain, cached)
    assert cache.misses == len(
        [r for r in calls if len(calls[r]) >= k]
    ), "first build must miss every kept read"

    # identical rebuild: every kept read is a hit, graph unchanged
    cache.hits = cache.misses = 0
    again = GeneMerGraph(calls, k, positions, vocab=vocab, cache=cache)
    assert cache.misses == 0
    assert_graphs_identical(plain, again)


def test_cached_rebuild_after_correction_cycle():
    """filter -> correct -> rebuild with the warm cache must equal a cold
    device rebuild of the corrected reads."""
    calls, positions = _fixture("nine")
    vocab = GeneVocab()
    cache = GraphBuildCache()
    g = GeneMerGraph(calls, 3, positions, vocab=vocab, cache=cache)
    g.filter_graph(3, 1)
    new_reads, new_pos = g.correct_reads({})
    assert len(new_reads) > 0
    plain = GeneMerGraph(dict(new_reads), 3, dict(new_pos), vocab=vocab)
    cache.hits = cache.misses = 0
    cached = GeneMerGraph(dict(new_reads), 3, dict(new_pos), vocab=vocab, cache=cache)
    assert_graphs_identical(plain, cached)
    # most reads are untouched by the correction -> mostly hits
    assert cache.hits > cache.misses


def test_cache_detects_in_value_changes():
    """A read whose genes changed (same id) must be recomputed, and a read
    whose position list object was replaced gets fresh windowed positions."""
    reads = {
        "r1": ["+a", "+b", "+c", "+d"],
        "r2": ["+b", "+c", "+d", "+e"],
    }
    pos = {
        "r1": [[0, 9], [10, 19], [20, 29], [30, 39]],
        "r2": [[0, 9], [10, 19], [20, 29], [30, 39]],
    }
    vocab = GeneVocab()
    cache = GraphBuildCache()
    GeneMerGraph(reads, 3, pos, vocab=vocab, cache=cache)
    reads2 = dict(reads, r2=["+b", "+c", "-x", "+e"])
    pos2 = dict(pos, r2=[[0, 9], [10, 19], [22, 31], [32, 41]])
    plain = GeneMerGraph(reads2, 3, pos2, vocab=vocab)
    cached = GeneMerGraph(reads2, 3, pos2, vocab=vocab, cache=cache)
    assert_graphs_identical(plain, cached)


def test_cache_is_per_k():
    calls, positions = _fixture("nine")
    vocab = GeneVocab()
    cache = GraphBuildCache()
    for k in (3, 5, 7):
        plain = GeneMerGraph(calls, k, positions, vocab=vocab)
        cached = GeneMerGraph(calls, k, positions, vocab=vocab, cache=cache)
        assert_graphs_identical(plain, cached)


def test_cache_rejects_foreign_vocab():
    """Cached token/hash vectors are vocab-specific; reusing the cache with a
    different GeneVocab must fail loudly instead of building a wrong graph."""
    calls, positions = _fixture("nine")
    cache = GraphBuildCache()
    v1 = GeneVocab()
    GeneMerGraph(calls, 3, positions, vocab=v1, cache=cache)
    GeneMerGraph(calls, 3, positions, vocab=v1, cache=cache)  # same vocab ok
    with pytest.raises(ValueError):
        GeneMerGraph(calls, 3, positions, vocab=GeneVocab(), cache=cache)


def test_flat_device_branch_matches_host_branch(monkeypatch):
    """The single-dispatch flat window kernel (large miss batches) produces
    the same graph as the host NumPy mirror (small batches)."""
    import amira_tpu.ops.host_tables as ht

    calls, positions = _fixture("nine")
    v = GeneVocab()
    host_g = GeneMerGraph(calls, 3, positions, vocab=v, cache=GraphBuildCache())
    monkeypatch.setattr(ht, "HOST_BATCH_GENE_LIMIT", 0)
    flat_g = GeneMerGraph(calls, 3, positions, vocab=v, cache=GraphBuildCache())
    assert list(host_g.get_nodes().keys()) == list(flat_g.get_nodes().keys())
    assert list(host_g.get_edges().keys()) == list(flat_g.get_edges().keys())
    for h, n in host_g.get_nodes().items():
        m = flat_g.get_nodes()[h]
        assert n.coverage == m.coverage and n.reads == m.reads
        assert n.fwd_edges == m.fwd_edges and n.bwd_edges == m.bwd_edges
    assert host_g.get_readNodes() == flat_g.get_readNodes()
