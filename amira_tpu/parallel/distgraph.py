"""Data-parallel gene-mer graph statistics over a device mesh.

The reference's only distribution story is joblib shard-merge on one host
(amira/graph_utils.py:17-124): per-shard graphs are built and node coverages
added, edges unioned, read tables unioned. Here the same merge semantics run
as XLA collectives: every device builds a bounded count table (sorted unique
hashes + segment-summed coverages) for its read shard, the tables are
all-gathered over the `data` mesh axis, and a second bounded count merges
them — so gene-mer counting scales over ICI/DCN without any host round-trip.

This module provides the device-side table kernels (also used single-chip by
bench.py) and the shard_map-based distributed step used by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from amira_tpu.ops.hashing import edge_key, genemer_windows

P = jax.sharding.PartitionSpec


def bounded_count(keys, weights, capacity: int):
    """Sorted unique keys + summed weights with a static output capacity.

    keys:     (N,) uint64 (0 = invalid/padding, excluded from the table)
    weights:  (N,) int32
    Returns (table_keys, table_counts): (capacity,) each; unused slots hold
    key 0 / count 0. Requires #unique <= capacity (overflow slots are
    dropped deterministically from the end of the sorted order).
    """
    n = keys.shape[0]
    order = jnp.argsort(keys)
    sk = keys[order]
    sw = weights[order]
    valid = sk != 0
    boundary = jnp.concatenate(
        [valid[:1], (sk[1:] != sk[:-1]) & valid[1:]]
    )
    run_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # -1 for invalid prefix
    run_id = jnp.where(valid, run_id, capacity)  # invalid -> overflow slot
    run_id = jnp.minimum(run_id, capacity)
    counts = jax.ops.segment_sum(
        jnp.where(valid, sw, 0), run_id, num_segments=capacity + 1
    )[:capacity]
    table_keys = jnp.zeros((capacity + 1,), dtype=keys.dtype)
    table_keys = table_keys.at[jnp.where(boundary, run_id, capacity)].set(
        jnp.where(boundary, sk, 0)
    )[:capacity]
    return table_keys, counts.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "capacity"))
def local_genemer_tables(tokens, lengths, k: int, capacity: int):
    """Per-shard node and edge count tables from a padded read batch."""
    win = genemer_windows(tokens, lengths, k)
    nh = jnp.where(win["valid"], win["node_hash"], 0)
    node_keys, node_counts = bounded_count(
        nh.reshape(-1), jnp.ones(nh.size, jnp.int32), capacity
    )
    nd = win["direction"]
    if nh.shape[1] >= 2:
        src_h, tgt_h = win["node_hash"][:, :-1], win["node_hash"][:, 1:]
        src_d, tgt_d = nd[:, :-1], nd[:, 1:]
        ev = win["valid"][:, :-1] & win["valid"][:, 1:]
        e1 = jnp.where(ev, edge_key(src_h, src_d, tgt_h, tgt_d), 0)
        e2 = jnp.where(ev, edge_key(tgt_h, -tgt_d, src_h, -src_d), 0)
        ekeys = jnp.concatenate([e1.reshape(-1), e2.reshape(-1)])
    else:
        ekeys = jnp.zeros((2,), jnp.uint64)
    edge_keys, edge_counts = bounded_count(
        ekeys, jnp.ones(ekeys.shape[0], jnp.int32), capacity
    )
    return node_keys, node_counts, edge_keys, edge_counts


def make_distributed_genemer_step(mesh, k: int, capacity: int):
    """Build the jitted multi-chip step: reads sharded over the `data` axis,
    per-shard tables merged via all_gather + re-count (the collective
    equivalent of the reference's merge_nodes/merge_edges coverage adds)."""
    shard_map = jax.shard_map

    def shard_step(tokens, lengths):
        win = genemer_windows(tokens, lengths, k)
        nh = jnp.where(win["valid"], win["node_hash"], 0)
        local_keys, local_counts = bounded_count(
            nh.reshape(-1), jnp.ones(nh.size, jnp.int32), capacity
        )
        # merge shard tables over ICI: gather every shard's table, re-count
        all_keys = jax.lax.all_gather(local_keys, "data").reshape(-1)
        all_counts = jax.lax.all_gather(local_counts, "data").reshape(-1)
        merged_keys, merged_counts = bounded_count(all_keys, all_counts, capacity)
        # total gene-mer occurrences across the slice (psum sanity statistic)
        total = jax.lax.psum(
            jnp.sum(jnp.where(win["valid"], 1, 0)), "data"
        )
        return merged_keys, merged_counts, total

    step = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(Pspec_data(), Pspec_data()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


def Pspec_data():
    return P("data")


def make_distributed_genemer_step_2d(mesh, k: int, capacity: int):
    """2D-parallel gene-mer counting over a ("data", "table") mesh.

    Reads shard over BOTH axes (maximum data parallelism); the hash space
    shards over the "table" axis: every device routes each gene-mer hash to
    its owning table shard (hash mod T) with an all_to_all over ICI, counts
    its partition, then merges partial tables across the "data" axis with an
    all_gather + re-count. Each device ends up holding the global count table
    for its hash partition — the table-parallel analogue of TP for a count
    table that would not fit one chip's HBM at pod scale.
    """
    shard_map = jax.shard_map
    T = mesh.shape["table"]

    def shard_step(tokens, lengths):
        win = genemer_windows(tokens, lengths, k)
        nh = jnp.where(win["valid"], win["node_hash"], 0).reshape(-1)
        # route hashes to their owning table shard: bucket by dest with a
        # fixed per-destination capacity, then all_to_all over "table"
        dest = (nh % jnp.uint64(T)).astype(jnp.int32)
        dest = jnp.where(nh == 0, T, dest)  # invalid -> dropped bucket
        send_cap = max(nh.shape[0] // T * 2, 128)
        order = jnp.argsort(dest, stable=True)
        sd = dest[order]
        sh_sorted = nh[order]
        # position of each element within its destination bucket
        first_of_dest = jnp.searchsorted(sd, jnp.arange(T + 1, dtype=jnp.int32))
        send = jnp.zeros((T, send_cap + 1), dtype=jnp.uint64)
        idx_in_bucket = jnp.arange(sd.shape[0]) - first_of_dest[
            jnp.clip(sd, 0, T)
        ]
        ok = (sd < T) & (idx_in_bucket < send_cap)
        # invalid/overflow elements scatter into the dump column send_cap
        send = send.at[
            jnp.where(ok, sd, 0), jnp.where(ok, idx_in_bucket, send_cap)
        ].set(jnp.where(ok, sh_sorted, 0))
        send = send[:, :send_cap]
        recv = jax.lax.all_to_all(send, "table", 0, 0, tiled=False)
        mine = recv.reshape(-1)
        local_keys, local_counts = bounded_count(
            mine, jnp.ones(mine.shape[0], jnp.int32), capacity
        )
        # merge the data-axis shards of this table partition
        all_keys = jax.lax.all_gather(local_keys, "data").reshape(-1)
        all_counts = jax.lax.all_gather(local_counts, "data").reshape(-1)
        merged_keys, merged_counts = bounded_count(all_keys, all_counts, capacity)
        # every occurrence lands on exactly one (data, table) device after the
        # all_to_all, so the global total sums the pre-merge local tables
        total = jax.lax.psum(
            jax.lax.psum(jnp.sum(local_counts), "table"), "data"
        )
        return merged_keys[None, :], merged_counts[None, :], total

    step = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(("data", "table")), P(("data", "table"))),
        out_specs=(P("table"), P("table"), P()),
        check_vma=False,
    )
    return jax.jit(step)


def make_distributed_genemer_step_3d(mesh, k: int, capacity: int):
    """Hierarchical gene-mer counting over a ("host", "data", "table") mesh —
    the multi-host (BASELINE config 5) layout.

    Axis roles: "host" models the DCN boundary between v5e hosts; "data" and
    "table" are the intra-host ICI axes. Reads shard data-parallel over all
    three axes. Each device routes hashes to the table-partition owner inside
    its host (all_to_all over "table", rides ICI), counts its partition, then
    merges the data-axis partials over ICI — producing one deduplicated
    per-host table per partition. Only THEN does the "host" axis merge run
    (all_gather over DCN + re-count): hierarchical merging ships deduplicated
    tables across the slow axis instead of raw occurrence streams, which is
    the collective equivalent of the reference's shard merge
    (amira/graph_utils.py:17-102) with its coverage adds.
    """
    shard_map = jax.shard_map
    T = mesh.shape["table"]

    def shard_step(tokens, lengths):
        win = genemer_windows(tokens, lengths, k)
        nh = jnp.where(win["valid"], win["node_hash"], 0).reshape(-1)
        dest = (nh % jnp.uint64(T)).astype(jnp.int32)
        dest = jnp.where(nh == 0, T, dest)
        send_cap = max(nh.shape[0] // T * 2, 128)
        order = jnp.argsort(dest, stable=True)
        sd = dest[order]
        sh_sorted = nh[order]
        first_of_dest = jnp.searchsorted(sd, jnp.arange(T + 1, dtype=jnp.int32))
        send = jnp.zeros((T, send_cap + 1), dtype=jnp.uint64)
        idx_in_bucket = jnp.arange(sd.shape[0]) - first_of_dest[
            jnp.clip(sd, 0, T)
        ]
        ok = (sd < T) & (idx_in_bucket < send_cap)
        send = send.at[
            jnp.where(ok, sd, 0), jnp.where(ok, idx_in_bucket, send_cap)
        ].set(jnp.where(ok, sh_sorted, 0))
        send = send[:, :send_cap]
        recv = jax.lax.all_to_all(send, "table", 0, 0, tiled=False)
        mine = recv.reshape(-1)
        local_keys, local_counts = bounded_count(
            mine, jnp.ones(mine.shape[0], jnp.int32), capacity
        )
        # intra-host merge over ICI
        d_keys = jax.lax.all_gather(local_keys, "data").reshape(-1)
        d_counts = jax.lax.all_gather(local_counts, "data").reshape(-1)
        host_keys, host_counts = bounded_count(d_keys, d_counts, capacity)
        # cross-host merge over DCN (deduplicated tables only)
        h_keys = jax.lax.all_gather(host_keys, "host").reshape(-1)
        h_counts = jax.lax.all_gather(host_counts, "host").reshape(-1)
        merged_keys, merged_counts = bounded_count(h_keys, h_counts, capacity)
        total = jax.lax.psum(
            jax.lax.psum(
                jax.lax.psum(jnp.sum(local_counts), "table"), "data"
            ),
            "host",
        )
        return merged_keys[None, :], merged_counts[None, :], total

    step = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(("host", "data", "table")), P(("host", "data", "table"))),
        out_specs=(P("table"), P("table"), P()),
        check_vma=False,
    )
    return jax.jit(step)


def distributed_node_counts_3d(
    read_tokens: np.ndarray, lengths: np.ndarray, k: int, mesh,
    capacity: int = 1 << 16,
):
    """Host entry for the ("host", "data", "table") mesh."""
    n_dev = mesh.devices.size
    R = read_tokens.shape[0]
    pad = (-R) % n_dev
    if pad:
        read_tokens = np.vstack(
            [read_tokens, np.zeros((pad, read_tokens.shape[1]), read_tokens.dtype)]
        )
        lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])
    step = make_distributed_genemer_step_3d(mesh, k, capacity)
    sharding = jax.sharding.NamedSharding(mesh, P(("host", "data", "table")))
    keys, counts, total = step(
        jax.device_put(read_tokens, sharding),
        jax.device_put(lengths, sharding),
    )
    keys = np.asarray(keys).reshape(-1)
    counts = np.asarray(counts).reshape(-1)
    mask = keys != 0
    return keys[mask], counts[mask], int(np.asarray(total).reshape(-1)[0])


def scaling_report(
    read_tokens: np.ndarray,
    lengths: np.ndarray,
    k: int = 3,
    capacity: int = 1 << 14,
    repeats: int = 3,
):
    """Weak-scaling efficiency over 1, 2, 4, ... available devices across
    ALL mesh layouts (BASELINE config 5's scaling-efficiency report): the
    pure data-parallel mesh, the 2D (data x table) hash-routed mesh, and the
    3D (host x data x table) hierarchical-merge mesh where enough devices
    exist.

    Returns a list of {mesh, n_devices, reads_per_sec, efficiency} dicts;
    efficiency = throughput / (n * single-device throughput) within each
    mesh family.
    """
    import time

    from jax.sharding import Mesh

    devices = jax.devices()
    rows = []

    def timed(fn, tok, lens):
        fn(tok, lens)  # warm/compile
        best = None
        for _ in range(repeats):
            t0 = time.time()
            fn(tok, lens)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return tok.shape[0] / best

    # 1D data-parallel
    base = None
    n = 1
    while n <= len(devices):
        mesh = Mesh(np.array(devices[:n]).reshape(n), ("data",))
        tok = np.tile(read_tokens, (n, 1))
        lens = np.tile(lengths, n)
        rps = timed(
            lambda t, ln: distributed_node_counts(t, ln, k, mesh, capacity),
            tok, lens,
        )
        if base is None:
            base = rps
        rows.append(
            {
                "mesh": f"{n} (data)",
                "n_devices": n,
                "reads_per_sec": round(rps, 1),
                "efficiency": round(rps / (n * base), 3),
            }
        )
        n *= 2

    # 2D data x table
    n = 4
    base2 = base  # efficiency vs the same single-device baseline
    while n <= len(devices):
        mesh = Mesh(
            np.array(devices[:n]).reshape(n // 2, 2), ("data", "table")
        )
        tok = np.tile(read_tokens, (n, 1))
        lens = np.tile(lengths, n)
        rps = timed(
            lambda t, ln: distributed_node_counts_2d(t, ln, k, mesh, capacity),
            tok, lens,
        )
        rows.append(
            {
                "mesh": f"{n // 2}x2 (data x table)",
                "n_devices": n,
                "reads_per_sec": round(rps, 1),
                "efficiency": round(rps / (n * base2), 3),
            }
        )
        n *= 2

    # 3D host x data x table
    n = 8
    while n <= len(devices):
        mesh = Mesh(
            np.array(devices[:n]).reshape(2, n // 4, 2),
            ("host", "data", "table"),
        )
        tok = np.tile(read_tokens, (n, 1))
        lens = np.tile(lengths, n)
        rps = timed(
            lambda t, ln: distributed_node_counts_3d(t, ln, k, mesh, capacity),
            tok, lens,
        )
        rows.append(
            {
                "mesh": f"2x{n // 4}x2 (host x data x table)",
                "n_devices": n,
                "reads_per_sec": round(rps, 1),
                "efficiency": round(rps / (n * base2), 3),
            }
        )
        n *= 2
    return rows


def distributed_node_counts_2d(
    read_tokens: np.ndarray, lengths: np.ndarray, k: int, mesh,
    capacity: int = 1 << 16,
):
    """Host entry for the 2D mesh: returns the concatenated per-partition
    tables as one (hashes, counts) table plus the global occurrence total."""
    n_dev = mesh.devices.size
    R = read_tokens.shape[0]
    pad = (-R) % n_dev
    if pad:
        read_tokens = np.vstack(
            [read_tokens, np.zeros((pad, read_tokens.shape[1]), read_tokens.dtype)]
        )
        lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])
    step = make_distributed_genemer_step_2d(mesh, k, capacity)
    sharding = jax.sharding.NamedSharding(mesh, P(("data", "table")))
    keys, counts, total = step(
        jax.device_put(read_tokens, sharding),
        jax.device_put(lengths, sharding),
    )
    keys = np.asarray(keys).reshape(-1)
    counts = np.asarray(counts).reshape(-1)
    mask = keys != 0
    return keys[mask], counts[mask], int(np.asarray(total).reshape(-1)[0])


def distributed_node_counts(read_tokens: np.ndarray, lengths: np.ndarray, k: int, mesh, capacity: int = 1 << 16):
    """Host entry: shard (R, L) reads over the mesh's data axis, run the
    collective count step, return the merged (hashes, counts) table."""
    n_dev = mesh.devices.size
    R = read_tokens.shape[0]
    pad = (-R) % n_dev
    if pad:
        read_tokens = np.vstack(
            [read_tokens, np.zeros((pad, read_tokens.shape[1]), read_tokens.dtype)]
        )
        lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])
    step = make_distributed_genemer_step(mesh, k, capacity)
    sharding = jax.sharding.NamedSharding(mesh, P("data"))
    tokens_sharded = jax.device_put(read_tokens, sharding)
    lengths_sharded = jax.device_put(lengths, sharding)
    keys, counts, total = step(tokens_sharded, lengths_sharded)
    return np.asarray(keys), np.asarray(counts), int(np.asarray(total).reshape(-1)[0])


# --------------------------------------------------------- full graph build


def bounded_count_min(keys, weights, orderkeys, capacity: int):
    """bounded_count plus the MINIMUM orderkey per unique key.

    keys:      (N,) uint64 (0 = invalid)
    weights:   (N,) int32
    orderkeys: (N,) uint64 (global first-occurrence order; ties impossible)
    Returns (table_keys, table_counts, table_first): (capacity,) each; unused
    slots hold key 0 / count 0 / first UINT_MAX.
    """
    # lexsort by (key, orderkey): stable argsort of key over orderkey order
    perm1 = jnp.argsort(orderkeys)
    k1 = keys[perm1]
    perm2 = jnp.argsort(k1, stable=True)
    order = perm1[perm2]
    sk = keys[order]
    sw = weights[order]
    so = orderkeys[order]
    valid = sk != 0
    boundary = jnp.concatenate([valid[:1], (sk[1:] != sk[:-1]) & valid[1:]])
    run_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    run_id = jnp.where(valid, run_id, capacity)
    run_id = jnp.minimum(run_id, capacity)
    counts = jax.ops.segment_sum(
        jnp.where(valid, sw, 0), run_id, num_segments=capacity + 1
    )[:capacity]
    firsts = jax.ops.segment_min(
        jnp.where(valid, so, jnp.uint64(0xFFFFFFFFFFFFFFFF)),
        run_id,
        num_segments=capacity + 1,
    )[:capacity]
    table_keys = jnp.zeros((capacity + 1,), dtype=keys.dtype)
    table_keys = table_keys.at[jnp.where(boundary, run_id, capacity)].set(
        jnp.where(boundary, sk, 0)
    )[:capacity]
    return table_keys, counts.astype(jnp.int32), firsts


def make_distributed_graph_step(mesh, k: int, node_cap: int, edge_cap: int):
    """Full-graph distributed build step over the `data` mesh axis.

    Each device windows its read shard, forms node occurrences
    (key, orderkey) and edge records (canonical edge key, orderkey for the
    interleaved fwd/rc-companion stream), reduces them to bounded local
    tables, then merges across the mesh with all_gather + re-reduce. The
    merged tables carry everything the reference graph needs beyond raw
    counts: per-node and per-edge COVERAGE plus the GLOBAL first-occurrence
    order key, from which the host reconstructs canonical tokens, edge
    endpoints/orientations and the reference's read-major insertion order
    (construct_graph.py:31-102 semantics). The per-shard window streams
    returned alongside ARE the read->node incidence.

    orderkey convention: node occ -> global_window_position; edge record ->
    2*global_pair_position + slot (0 fwd, 1 rc companion) — identical to the
    single-host lazy tables (amira_tpu/graph.py)."""
    shard_map = jax.shard_map

    def shard_step(tokens, lengths, win_base, pair_base):
        win = genemer_windows(tokens, lengths, k)
        nh_raw, nd, valid = win["node_hash"], win["direction"], win["valid"]
        R, W = nh_raw.shape
        nh = jnp.where(valid, nh_raw, 0)
        # win_base carries each row's GLOBAL valid-window offset already
        widx = jnp.arange(W, dtype=jnp.uint64)[None, :]
        occ_ok = win_base[:, None] + widx
        node_keys, node_covs, node_first = bounded_count_min(
            nh.reshape(-1),
            jnp.ones(nh.size, jnp.int32),
            occ_ok.reshape(-1),
            node_cap,
        )
        g_nk = jax.lax.all_gather(node_keys, "data").reshape(-1)
        g_nc = jax.lax.all_gather(node_covs, "data").reshape(-1)
        g_nf = jax.lax.all_gather(node_first, "data").reshape(-1)
        m_nk, m_nc, m_nf = bounded_count_min(g_nk, g_nc, g_nf, node_cap)

        if W >= 2:
            src_h, tgt_h = nh_raw[:, :-1], nh_raw[:, 1:]
            src_d, tgt_d = nd[:, :-1], nd[:, 1:]
            ev = valid[:, :-1] & valid[:, 1:]
            e1 = jnp.where(ev, edge_key(src_h, src_d, tgt_h, tgt_d), 0)
            e2 = jnp.where(ev, edge_key(tgt_h, -tgt_d, src_h, -src_d), 0)
            pidx = jnp.arange(W - 1, dtype=jnp.uint64)[None, :]
            pair_pos = pair_base[:, None] + pidx
            ek = jnp.stack([e1, e2], axis=-1).reshape(-1)
            eok = jnp.stack(
                [pair_pos * jnp.uint64(2), pair_pos * jnp.uint64(2) + jnp.uint64(1)],
                axis=-1,
            ).reshape(-1)
        else:
            ek = jnp.zeros((2,), jnp.uint64)
            eok = jnp.zeros((2,), jnp.uint64)
        edge_keys, edge_covs, edge_first = bounded_count_min(
            ek, jnp.ones(ek.shape[0], jnp.int32), eok, edge_cap
        )
        g_ek = jax.lax.all_gather(edge_keys, "data").reshape(-1)
        g_ec = jax.lax.all_gather(edge_covs, "data").reshape(-1)
        g_ef = jax.lax.all_gather(edge_first, "data").reshape(-1)
        m_ek, m_ec, m_ef = bounded_count_min(g_ek, g_ec, g_ef, edge_cap)

        return (
            m_nk, m_nc, m_nf, m_ek, m_ec, m_ef,
            jnp.where(valid, nh_raw, 0),
            jnp.where(valid, nd, 0).astype(jnp.int8),
        )

    step = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=(P(), P(), P(), P(), P(), P(), P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(step)


def distributed_graph_build(
    read_dict, k: int, mesh, vocab=None, gene_positions=None,
    node_cap: int = 1 << 14, edge_cap: int = 1 << 15,
):
    """Build a GeneMerGraph by sharding reads over the mesh's `data` axis and
    collective-merging the full node/edge/incidence tables. The result is
    IDENTICAL (node hashes, coverages, read lists, edge endpoints, insertion
    order) to a single-device GeneMerGraph of the same read dict — verified
    by tests/test_parallel.py and __graft_entry__.dryrun_multichip."""
    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.vocab import GeneVocab, pack_reads

    if vocab is None:
        vocab = GeneVocab()
    n_dev = mesh.shape["data"] if "data" in mesh.shape else mesh.devices.size
    graph = GeneMerGraph.__new__(GeneMerGraph)
    graph._reads = dict(read_dict)
    graph._kmerSize = int(k)
    graph._genePositions = gene_positions
    graph._minNodeCoverage = 1
    graph._minEdgeCoverage = 1
    graph.vocab = vocab
    graph._cache = None
    graph._nodes_d = {}
    graph._edges_d = {}
    graph._readNodes_d = {}
    graph._readNodeDirections_d = {}
    graph._readNodePositions_d = {}
    graph._shortReads = {}
    graph._readsToCorrect = set()
    graph._lazy = None

    kept_ids = []
    tok_list = []
    for rid, genes in read_dict.items():
        toks = vocab.encode_reads_batch([genes])[0]
        if len(toks) < k:
            graph._shortReads[rid] = genes
            continue
        kept_ids.append(rid)
        tok_list.append(toks)
    if not kept_ids:
        return graph

    lens = np.fromiter((len(t) for t in tok_list), np.int64, len(tok_list))
    L = int(lens.max())
    tokens, lengths = pack_reads(tok_list, pad_to=L)
    R = tokens.shape[0]
    pad = (-R) % n_dev
    if pad:
        tokens = np.vstack([tokens, np.zeros((pad, L), tokens.dtype)])
        lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])
    wlens = np.maximum(lens - (k - 1), 0)
    offs = np.zeros(len(kept_ids) + 1, np.int64)
    np.cumsum(wlens, out=offs[1:])
    plens = np.maximum(lens - k, 0)
    poffs = np.zeros(len(kept_ids) + 1, np.int64)
    np.cumsum(plens, out=poffs[1:])
    win_base = np.concatenate(
        [offs[:-1], np.full(pad, offs[-1], np.int64)]
    ).astype(np.uint64)
    pair_base = np.concatenate(
        [poffs[:-1], np.full(pad, poffs[-1], np.int64)]
    ).astype(np.uint64)
    step = make_distributed_graph_step(mesh, k, node_cap, edge_cap)
    sharding = jax.sharding.NamedSharding(mesh, P("data"))
    out = step(
        jax.device_put(tokens, sharding),
        jax.device_put(lengths, sharding),
        jax.device_put(win_base, sharding),
        jax.device_put(pair_base, sharding),
    )
    (m_nk, m_nc, m_nf, m_ek, m_ec, m_ef, wh_full, wd_full) = (
        np.asarray(x) for x in out
    )

    graph._finish_from_distributed_tables(
        kept_ids, tok_list, lens, offs,
        m_nk, m_nc, m_nf, m_ek, m_ec, m_ef,
        wh_full[: len(kept_ids)], wd_full[: len(kept_ids)],
    )
    return graph
