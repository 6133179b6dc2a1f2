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
    """Weak-scaling efficiency over 1, 2, 4, ... available devices
    (BASELINE config 5's scaling-efficiency report).

    Returns a list of {n_devices, reads_per_sec, efficiency} dicts;
    efficiency = throughput / (n * single-device throughput).
    """
    import time

    from jax.sharding import Mesh

    devices = jax.devices()
    rows = []
    base = None
    n = 1
    while n <= len(devices):
        mesh = Mesh(np.array(devices[:n]).reshape(n), ("data",))
        # replicate the workload per shard: weak scaling
        tok = np.tile(read_tokens, (n, 1))
        lens = np.tile(lengths, n)
        distributed_node_counts(tok, lens, k, mesh, capacity)  # warm/compile
        best = None
        for _ in range(repeats):
            t0 = time.time()
            distributed_node_counts(tok, lens, k, mesh, capacity)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rps = tok.shape[0] / best
        if base is None:
            base = rps
        rows.append(
            {
                "n_devices": n,
                "reads_per_sec": round(rps, 1),
                "efficiency": round(rps / (n * base), 3),
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
