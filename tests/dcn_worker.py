"""Worker for the true two-process DCN test (tests/test_dcn_multiprocess.py).

Each OS process owns 4 virtual CPU devices and joins a
`jax.distributed.initialize` cluster of 2 processes; the ("host", "data",
"table") mesh's "host" axis then falls exactly on the REAL process
boundary, so the hierarchical merge's cross-host all_gather executes as a
genuine cross-process collective (the DCN path the single-process virtual
mesh only models). Reference merge semantics: amira/graph_utils.py:17-124.

Usage: python dcn_worker.py <process_id> <coordinator_port> <out_json>
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # gloo is the cross-process CPU collectives backend in this jaxlib
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 — older/newer config name; let init try
        pass
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )

    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from amira_tpu.parallel.distgraph import (
        local_genemer_tables,
        make_distributed_genemer_step_3d,
    )

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    assert len(devices) == 8, f"expected 8 global devices, got {len(devices)}"
    assert devices[0].process_index != devices[4].process_index, (
        "the mesh host axis must straddle the two processes"
    )
    mesh = Mesh(np.array(devices).reshape(2, 2, 2), ("host", "data", "table"))

    rng = np.random.RandomState(7)
    R, L, k = 64, 12, 3
    tokens = (
        rng.randint(1, 30, size=(R, L)).astype(np.int32)
        * rng.choice([-1, 1], size=(R, L)).astype(np.int32)
    )
    lengths = rng.randint(k, L + 1, size=(R,)).astype(np.int32)
    capacity = 1 << 10

    sharding = NamedSharding(mesh, P(("host", "data", "table")))
    gtok = jax.make_array_from_callback(
        (R, L), sharding, lambda idx: tokens[idx]
    )
    glen = jax.make_array_from_callback(
        (R,), sharding, lambda idx: lengths[idx]
    )
    step = make_distributed_genemer_step_3d(mesh, k, capacity)
    keys, counts, total = step(gtok, glen)

    def fetch(garr):
        first = np.asarray(garr.addressable_shards[0].data)
        out = np.zeros(garr.shape, first.dtype)
        for s in garr.addressable_shards:
            out[s.index] = np.asarray(s.data)
        return out

    k_np = fetch(keys).reshape(-1)
    c_np = fetch(counts).reshape(-1)
    total_np = int(fetch(total).reshape(-1)[0])
    mask = k_np != 0
    dist = dict(
        zip(k_np[mask].astype(np.uint64).tolist(), c_np[mask].tolist())
    )

    result = {"process": pid, "total": total_np, "n_keys": len(dist)}
    if pid == 0:
        tk, tc, _ek, _ec = local_genemer_tables(tokens, lengths, k, 1 << 12)
        tk, tc = np.asarray(tk), np.asarray(tc)
        serial = dict(zip(tk[tk != 0].tolist(), tc[tk != 0].tolist()))
        result["matches_serial"] = dist == serial
        result["expected_total"] = int(
            np.maximum(lengths - (k - 1), 0).sum()
        )

    # ---- second cross-process collective: the bin-sharded DNA k-mer
    # table (psum_scatter over the data axis spans the process boundary)
    from amira_tpu.ops import kmer as KM
    from amira_tpu.parallel.distgraph import make_distributed_kmer_step

    kk = 7
    rng2 = np.random.RandomState(5)
    bases = np.array(list("ACGTN"))
    seqs = [
        "".join(rng2.choice(bases, size=int(rng2.randint(30, 400)),
                            p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        for _ in range(40)
    ]
    seqs.append("".join(rng2.choice(bases[:4], size=9000)))
    codes = KM._concat_codes(seqs)
    kmesh = Mesh(np.array(devices), ("kdata",))
    D = 8
    n = len(codes)
    starts_b, ends_b = [0], []
    for di in range(1, D):
        cut = max(min(n, (n * di) // D), starts_b[-1])
        next_start = cut
        if 0 < cut < n:
            seps = np.nonzero(codes[starts_b[-1] : cut] == KM._SENTINEL)[0]
            if len(seps):
                cut = starts_b[-1] + int(seps[-1]) + 1
                next_start = cut
            elif codes[cut - 1] != KM._SENTINEL:
                next_start = max(cut - (kk - 1), starts_b[-1])
        ends_b.append(cut)
        starts_b.append(next_start)
    ends_b.append(n)
    chunks = [codes[starts_b[d] : ends_b[d]] for d in range(D)]
    chunk_len = ((max(max(len(c) for c in chunks), kk) + 15) // 16 * 16) + 16
    words_rows, bad_rows = [], []
    for c in chunks:
        if len(c) < chunk_len:
            c = np.concatenate(
                [c, np.full(chunk_len - len(c), KM._SENTINEL, np.uint8)]
            )
        w, b2 = KM._pack_codes_2bit(c)
        words_rows.append(w)
        bad_rows.append(b2)
    words = np.stack(words_rows)
    bad = np.stack(bad_rows)
    kstep = make_distributed_kmer_step(kmesh, kk, chunk_len)
    kshard = NamedSharding(kmesh, P("kdata"))
    gw = jax.make_array_from_callback(words.shape, kshard,
                                      lambda idx: words[idx])
    gb = jax.make_array_from_callback(bad.shape, kshard,
                                      lambda idx: bad[idx])
    ktable = kstep(gw, gb)
    # the result is BIN-SHARDED: each process holds only its devices'
    # bin ranges, so each process validates ITS half against the host
    # counter (the test asserts both halves)
    T = 4**kk + 1
    covered = np.zeros(ktable.shape[0], bool)
    local = np.zeros(ktable.shape[0], np.uint32)
    for s in ktable.addressable_shards:
        local[s.index] = np.asarray(s.data)
        covered[s.index] = True
    import os as _os

    _os.environ["AMIRA_TPU_KMER_BACKEND"] = "host"
    old = KM._HOST_SORT_THRESHOLD
    KM._HOST_SORT_THRESHOLD = 1
    try:
        host = KM.KmerCounter.from_sequences(seqs, kk)
    finally:
        KM._HOST_SORT_THRESHOLD = old
        _os.environ.pop("AMIRA_TPU_KMER_BACKEND", None)
    expected = np.zeros(ktable.shape[0], np.uint32)
    expected[host.kmers.astype(np.int64)] = host.counts.astype(np.uint32)
    mask = covered.copy()
    mask[T - 1 :] = False  # ignore the invalid-window slot + padding
    result["kmer_matches_host"] = bool(
        np.array_equal(local[mask], expected[mask])
    )
    result["kmer_bins_covered"] = int(mask.sum())
    with open(out_path, "w") as fh:
        json.dump(result, fh)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
