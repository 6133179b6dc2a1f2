"""Multi-device sharded gene-mer counting on the virtual 8-device CPU mesh."""

import json
import os
import sys

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from amira_tpu.parallel.distgraph import (
    bounded_count,
    distributed_node_counts,
    local_genemer_tables,
)
from amira_tpu.vocab import GeneVocab, pack_reads

sys.path.insert(0, os.path.dirname(__file__))


def _mesh(n):
    devices = jax.devices()
    if len(devices) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.array(devices[:n]).reshape(n), ("data",))


def test_bounded_count_basic():
    keys = np.array([5, 3, 5, 0, 3, 3, 9], dtype=np.uint64)
    w = np.ones(7, dtype=np.int32)
    tk, tc = bounded_count(keys, w, 8)
    tk, tc = np.asarray(tk), np.asarray(tc)
    table = dict(zip(tk[tk != 0].tolist(), tc[tk != 0].tolist()))
    assert table == {3: 3, 5: 2, 9: 1}


def test_bounded_count_weighted_merge():
    keys = np.array([7, 7, 2], dtype=np.uint64)
    w = np.array([4, 1, 10], dtype=np.int32)
    tk, tc = bounded_count(keys, w, 4)
    tk, tc = np.asarray(tk), np.asarray(tc)
    table = dict(zip(tk[tk != 0].tolist(), tc[tk != 0].tolist()))
    assert table == {7: 5, 2: 10}


def test_distributed_matches_single_chip():
    calls = json.load(
        open("/root/reference/tests/complex_gene_calls_one.json")
    )
    sub = dict(list(calls.items())[:2000])
    v = GeneVocab()
    toks = [v.encode_read(g)[:64] for g in sub.values()]
    toks = [t for t in toks if len(t) >= 3]
    tokens, lengths = pack_reads(toks, pad_to=64)
    mesh = _mesh(8)
    keys, counts, total = distributed_node_counts(
        tokens, lengths, 3, mesh, capacity=1 << 13
    )
    k2, c2, _, _ = local_genemer_tables(tokens, lengths, 3, 1 << 13)
    k2, c2 = np.asarray(k2), np.asarray(c2)
    dist = dict(zip(keys[keys != 0].tolist(), counts[keys != 0].tolist()))
    local = dict(zip(k2[k2 != 0].tolist(), c2[k2 != 0].tolist()))
    assert dist == local
    assert total == sum(local.values())


def test_distributed_matches_graph_coverages():
    """Collective count tables reproduce GeneMerGraph node coverages."""
    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.ops.hashing import genemer_windows  # noqa: F401

    reads = {
        "r1": ["+a", "+b", "+c", "+d"],
        "r2": ["+a", "+b", "+c", "+d"],
        "r3": ["-d", "-c", "-b", "-a"],
    }
    g = GeneMerGraph(reads, 3)
    toks = [g.vocab.encode_read(reads[r]) for r in reads]
    tokens, lengths = pack_reads(toks)
    mesh = _mesh(2)
    keys, counts, _total = distributed_node_counts(
        tokens, lengths, 3, mesh, capacity=64
    )
    table = dict(zip(keys[keys != 0].tolist(), counts[keys != 0].tolist()))
    expected = {n.hash: n.coverage for n in g.all_nodes()}
    assert table == expected


def test_distributed_2d_mesh_matches_single_chip():
    """(data x table) 2D mesh: all_to_all hash routing + per-partition count
    + data-axis merge reproduces the single-chip table exactly."""
    from amira_tpu.parallel.distgraph import distributed_node_counts_2d

    calls = json.load(
        open("/root/reference/tests/complex_gene_calls_one.json")
    )
    sub = dict(list(calls.items())[:2000])
    v = GeneVocab()
    toks = [v.encode_read(g)[:64] for g in sub.values()]
    toks = [t for t in toks if len(t) >= 3]
    tokens, lengths = pack_reads(toks, pad_to=64)
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("need 8 devices")
    mesh = Mesh(np.array(devices[:8]).reshape(4, 2), ("data", "table"))
    keys, counts, total = distributed_node_counts_2d(
        tokens, lengths, 3, mesh, capacity=1 << 13
    )
    k2, c2, _, _ = local_genemer_tables(tokens, lengths, 3, 1 << 13)
    k2, c2 = np.asarray(k2), np.asarray(c2)
    dist = dict(zip(keys.tolist(), counts.tolist()))
    local = dict(zip(k2[k2 != 0].tolist(), c2[k2 != 0].tolist()))
    assert dist == local
    assert total == sum(local.values())


def test_graft_entry():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert all(o.shape[0] > 0 for o in out)
    n = min(4, len(jax.devices()))
    ge.dryrun_multichip(n)


def test_3d_mesh_hierarchical_merge_matches_serial():
    """("host", "data", "table") hierarchical merge returns the same global
    count table as a single-device count."""
    from amira_tpu.parallel.distgraph import distributed_node_counts_3d

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("need 8 devices")
    mesh = Mesh(np.array(devices[:8]).reshape(2, 2, 2), ("host", "data", "table"))
    rng = np.random.RandomState(7)
    R, L, k = 64, 12, 3
    tokens = (
        rng.randint(1, 30, size=(R, L)).astype(np.int32)
        * rng.choice([-1, 1], size=(R, L)).astype(np.int32)
    )
    lengths = rng.randint(k, L + 1, size=(R,)).astype(np.int32)
    keys, counts, total = distributed_node_counts_3d(
        tokens, lengths, k, mesh, capacity=1 << 10
    )
    expected_total = int(np.maximum(lengths - (k - 1), 0).sum())
    assert total == expected_total
    # serial oracle on one device
    tk, tc, _ek, _ec = local_genemer_tables(tokens, lengths, k, 1 << 12)
    tk, tc = np.asarray(tk), np.asarray(tc)
    serial = dict(zip(tk[tk != 0].tolist(), tc[tk != 0].tolist()))
    dist = dict(zip(keys.tolist(), counts.tolist()))
    assert dist == serial


def test_scaling_report_shape():
    from amira_tpu.parallel.distgraph import scaling_report

    if len(jax.devices()) < 2:
        pytest.skip("need 2 devices")
    rng = np.random.RandomState(1)
    tokens = (
        rng.randint(1, 30, size=(32, 12)).astype(np.int32)
        * rng.choice([-1, 1], size=(32, 12)).astype(np.int32)
    )
    lengths = rng.randint(3, 13, size=(32,)).astype(np.int32)
    rows = scaling_report(tokens, lengths, k=3, capacity=1 << 10, repeats=1)
    assert rows[0]["n_devices"] == 1
    assert rows[0]["efficiency"] == 1.0
    assert all(r["reads_per_sec"] > 0 for r in rows)
    assert len(rows) >= 2


def test_distributed_full_graph_build_equals_single_device():
    """The collective-merged FULL graph (nodes, coverage, reads, edges,
    endpoints, insertion order, incidence) equals a single-device build on a
    real fixture — the pipeline's distributed build mode
    (distgraph.distributed_graph_build)."""
    import json

    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.parallel.distgraph import distributed_graph_build
    from amira_tpu.vocab import GeneVocab

    calls = json.load(
        open("/root/reference/tests/complex_gene_calls_nine.json")
    )
    positions = json.load(
        open("/root/reference/tests/complex_gene_positions_nine.json")
    )
    mesh = Mesh(np.array(jax.devices()).reshape(len(jax.devices())), ("data",))
    vocab = GeneVocab()
    g1 = GeneMerGraph(dict(calls), 3, positions, vocab=vocab)
    g2 = distributed_graph_build(
        dict(calls), 3, mesh, vocab=vocab, gene_positions=positions
    )
    sn, dn = g1.get_nodes(), g2.get_nodes()
    assert list(sn.keys()) == list(dn.keys())
    for h in sn:
        a, b = sn[h], dn[h]
        assert a.coverage == b.coverage
        assert a.reads == b.reads
        assert a.fwd_edges == b.fwd_edges and a.bwd_edges == b.bwd_edges
        assert (a.tokens == b.tokens).all()
    se, de = g1.get_edges(), g2.get_edges()
    assert list(se.keys()) == list(de.keys())
    for key in se:
        a, b = se[key], de[key]
        assert (a.src, a.tgt, a.src_dir, a.tgt_dir, a.coverage) == (
            b.src, b.tgt, b.src_dir, b.tgt_dir, b.coverage
        )
    assert g1.get_readNodes() == g2.get_readNodes()
    assert g1.get_readNodePositions() == g2.get_readNodePositions()


def _graphs_equal(g1, g2):
    assert list(g1.get_nodes().keys()) == list(g2.get_nodes().keys())
    for h, a in g1.get_nodes().items():
        b = g2.get_nodes()[h]
        assert a.coverage == b.coverage and a.reads == b.reads
        assert a.fwd_edges == b.fwd_edges and a.bwd_edges == b.bwd_edges
    assert list(g1.get_edges().keys()) == list(g2.get_edges().keys())
    for key, a in g1.get_edges().items():
        b = g2.get_edges()[key]
        assert (a.src, a.tgt, a.src_dir, a.tgt_dir, a.coverage) == (
            b.src, b.tgt, b.src_dir, b.tgt_dir, b.coverage
        )
    assert g1.get_readNodes() == g2.get_readNodes()


@pytest.mark.parametrize("family", ["2d", "3d"])
def test_distributed_full_graph_build_table_meshes(family):
    """The FULL graph build on the hash-routed ("data", "table") and
    hierarchical ("host", "data", "table") meshes equals the single-device
    build — the per-partition tables concatenate back into the same key-
    sorted global table (distgraph.make_distributed_graph_step merge
    families; reference merge semantics amira/graph_utils.py:17-102)."""
    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.parallel.distgraph import distributed_graph_build

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("need 8 devices")
    if family == "2d":
        mesh = Mesh(np.array(devices[:8]).reshape(4, 2), ("data", "table"))
    else:
        mesh = Mesh(
            np.array(devices[:8]).reshape(2, 2, 2), ("host", "data", "table")
        )
    rng = np.random.RandomState(5)
    k = 3
    reads = {
        f"r{i}": [
            ("+" if rng.rand() < 0.5 else "-") + f"g{rng.randint(1, 40)}"
            for _ in range(rng.randint(k, 14))
        ]
        for i in range(80)
    }
    vocab = GeneVocab()
    g1 = GeneMerGraph(dict(reads), k, vocab=vocab)
    g2 = distributed_graph_build(dict(reads), k, mesh, vocab=vocab)
    _graphs_equal(g1, g2)


def test_distributed_build_capacity_autosizes_past_16k_nodes():
    """A build whose unique-node count exceeds the old fixed 16k cap must
    succeed via stream-sized capacities + retry-with-doubling (VERDICT r02:
    the bench's own 28k-node graph crashed the fixed caps). ~32k unique
    nodes here."""
    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.parallel.distgraph import distributed_graph_build

    mesh = _mesh(min(8, len(jax.devices())))
    rng = np.random.RandomState(11)
    k = 3
    reads = {
        f"b{i}": [
            ("+" if rng.rand() < 0.5 else "-") + f"g{rng.randint(1, 400)}"
            for _ in range(10)
        ]
        for i in range(4000)
    }
    vocab = GeneVocab()
    g1 = GeneMerGraph(dict(reads), k, vocab=vocab)
    assert len(g1.get_nodes()) > (1 << 14)  # past the old fixed cap
    g2 = distributed_graph_build(dict(reads), k, mesh, vocab=vocab)
    assert list(g1.get_nodes().keys()) == list(g2.get_nodes().keys())
    assert list(g1.get_edges().keys()) == list(g2.get_edges().keys())
    assert g1.get_readNodes() == g2.get_readNodes()


def test_distributed_kmer_count_matches_host_counter():
    """The mesh-distributed dense DNA k-mer table (per-device scatter-add +
    ONE bin-sharded psum_scatter over the data axis) equals the host
    counter bin-for-bin — including N bases, sequence boundaries, and a
    sequence long enough to span device shards."""
    import numpy as np

    from amira_tpu.ops import kmer as K
    from amira_tpu.parallel.distgraph import distributed_kmer_count

    rng = np.random.RandomState(6)
    bases = np.array(list("ACGTN"))
    seqs = [
        "".join(rng.choice(bases, size=int(rng.randint(30, 600)),
                           p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        for _ in range(80)
    ]
    seqs.append("".join(rng.choice(bases[:4], size=5000)))
    seqs += seqs[:25]  # duplicates: counts above 1
    codes = K._concat_codes(seqs)
    for k in (7, 9):
        table = distributed_kmer_count(codes, k)
        os.environ["AMIRA_TPU_KMER_BACKEND"] = "host"
        try:
            K._HOST_SORT_THRESHOLD, old = 1, K._HOST_SORT_THRESHOLD
            host = K.KmerCounter.from_sequences(seqs, k)
        finally:
            K._HOST_SORT_THRESHOLD = old
            os.environ.pop("AMIRA_TPU_KMER_BACKEND", None)
        kmers = np.nonzero(table[:-1])[0]
        assert np.array_equal(kmers.astype(np.uint32), host.kmers)
        assert np.array_equal(table[kmers], host.counts.astype(np.uint32))


def test_distributed_kmer_count_mid_sequence_cuts():
    """One 20k-base sequence over 8 devices forces every shard boundary to
    fall mid-sequence (no separator to back up to); the k-1 chunk overlap
    must keep the boundary-spanning windows, so total window count and
    per-bin counts match the host counter exactly. Before the overlap fix
    this lost (D-1)*(k-1) windows."""
    import numpy as np

    from amira_tpu.ops import kmer as K
    from amira_tpu.parallel.distgraph import distributed_kmer_count

    rng = np.random.RandomState(11)
    seqs = ["".join(rng.choice(list("ACGT"), size=20000))]
    codes = K._concat_codes(seqs)
    for k in (7, 9):
        table = distributed_kmer_count(codes, k)
        assert int(np.asarray(table[:-1]).sum()) == 20000 - k + 1
        os.environ["AMIRA_TPU_KMER_BACKEND"] = "host"
        try:
            K._HOST_SORT_THRESHOLD, old = 1, K._HOST_SORT_THRESHOLD
            host = K.KmerCounter.from_sequences(seqs, k)
        finally:
            K._HOST_SORT_THRESHOLD = old
            os.environ.pop("AMIRA_TPU_KMER_BACKEND", None)
        kmers = np.nonzero(table[:-1])[0]
        assert np.array_equal(kmers.astype(np.uint32), host.kmers)
        assert np.array_equal(table[kmers], host.counts.astype(np.uint32))
