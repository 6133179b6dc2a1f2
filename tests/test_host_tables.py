"""The host NumPy window/edge-key mirror must be bit-identical to the device
kernel path (amira_tpu/ops/host_tables.py vs ops/graph_tables +
ops/hashing), and graphs built through either route must be equal down to
dict insertion order."""

import random

import numpy as np
import pytest

import amira_tpu.ops.host_tables as host_tables
from amira_tpu.graph import GeneMerGraph
from amira_tpu.graph_cache import GraphBuildCache
from amira_tpu.ops.graph_tables import join_u64, pack_windows_edges
from amira_tpu.ops.host_tables import host_windows_edges
from amira_tpu.vocab import GeneVocab


def _random_reads(rng, n_reads, n_genes, max_len):
    reads = {}
    for i in range(n_reads):
        length = rng.randint(3, max_len)
        reads[f"r{i}"] = [
            rng.choice("+-") + f"g{rng.randint(1, n_genes)}" for _ in range(length)
        ]
    return reads


@pytest.mark.parametrize("k", [3, 5])
def test_host_kernel_bit_identical(k):
    rng = random.Random(19)
    vocab = GeneVocab()
    reads = _random_reads(rng, 60, 25, 40)
    tok_list = vocab.encode_reads_batch(
        [g for g in reads.values() if len(g) >= k]
    )
    host = host_windows_edges(tok_list, k)
    # device route: pad each read alone (shape variety is irrelevant to values)
    for t, (wh, wd, ek) in zip(tok_list, host):
        L = len(t)
        W = L - k + 1
        buf = np.asarray(
            pack_windows_edges(
                np.asarray(t, np.int32)[None, :],
                np.asarray([L], np.int32),
                k,
            )
        )
        n1 = W
        dev_h = join_u64(buf[:n1], buf[n1 : 2 * n1])
        dev_d = buf[2 * n1 : 3 * n1].astype(np.int8) - 1
        if W >= 2:
            n2 = 2 * (W - 1)
            dev_ek = join_u64(buf[3 * n1 : 3 * n1 + n2], buf[3 * n1 + n2 :])
        else:
            dev_ek = np.zeros((0,), np.uint64)
        np.testing.assert_array_equal(wh, dev_h)
        np.testing.assert_array_equal(wd, dev_d)
        np.testing.assert_array_equal(ek, dev_ek)


def test_graphs_identical_through_either_route(monkeypatch):
    rng = random.Random(23)
    reads = _random_reads(rng, 120, 30, 35)
    pos = {
        r: [[i * 100, i * 100 + 90] for i in range(len(g))]
        for r, g in reads.items()
    }

    def build(limit):
        monkeypatch.setattr(host_tables, "HOST_BATCH_GENE_LIMIT", limit)
        return GeneMerGraph(
            {r: list(g) for r, g in reads.items()},
            3,
            {r: [list(p) for p in ps] for r, ps in pos.items()},
            vocab=GeneVocab(),
            cache=GraphBuildCache(),
        )

    g_dev = build(0)  # force the device kernel route
    g_host = build(1 << 60)  # force the host mirror
    assert list(g_dev.get_nodes()) == list(g_host.get_nodes())
    assert list(g_dev.get_edges()) == list(g_host.get_edges())
    for h, n in g_dev.get_nodes().items():
        m = g_host.get_node_by_hash(h)
        assert n.coverage == m.coverage
        assert n.reads == m.reads
        assert n.fwd_edges == m.fwd_edges
        assert n.bwd_edges == m.bwd_edges
    assert g_dev.get_readNodes() == g_host.get_readNodes()
    assert g_dev.get_readNodeDirections() == g_host.get_readNodeDirections()
    assert g_dev.get_readNodePositions() == g_host.get_readNodePositions()
