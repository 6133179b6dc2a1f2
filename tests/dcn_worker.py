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
    with open(out_path, "w") as fh:
        json.dump(result, fh)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
