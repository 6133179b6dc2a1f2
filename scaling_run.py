"""BASELINE config 5 deliverable: the weak-scaling efficiency report.

Runs distgraph.scaling_report (1/2/4/8 devices across the data-parallel,
2D hash-routed, and 3D hierarchical-merge meshes) on a realistic
occurrence stream — the reference repo's real 21k-read fixture, tiled —
with a CONSTANT per-device workload (weak scaling), and separately times
the same single-device step on the real TPU chip. Reference merge
semantics being scaled: /root/reference/amira/graph_utils.py:17-124.

Usage:
  python scaling_run.py            # virtual 8-device CPU mesh table
  python scaling_run.py --tpu      # single real chip timing (one row)
Prints a markdown table + one JSON line per row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_workload(per_device_reads: int):
    import numpy as np

    from amira_tpu.vocab import GeneVocab, pack_reads

    with open("/root/reference/tests/complex_gene_calls_one.json") as fh:
        calls = json.load(fh)
    v = GeneVocab()
    toks = []
    t = 0
    while len(toks) < per_device_reads:
        for genes in calls.values():
            enc = v.encode_read(genes)[:64]
            if len(enc) >= 3:
                toks.append(enc)
            if len(toks) >= per_device_reads:
                break
        t += 1
    tokens, lengths = pack_reads(toks, pad_to=64)
    return np.asarray(tokens), np.asarray(lengths)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="time the single real chip instead of the "
                    "virtual CPU mesh")
    ap.add_argument("--per-device-reads", type=int, default=8192)
    ap.add_argument("--capacity", type=int, default=1 << 15)
    args = ap.parse_args()

    if not args.tpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from amira_tpu.parallel.distgraph import (
        distributed_node_counts,
        scaling_report,
    )

    tokens, lengths = _load_workload(args.per_device_reads)
    platform = jax.devices()[0].platform
    sys.stderr.write(
        f"[scaling] {platform}: {tokens.shape[0]} reads/device, "
        f"k=3, capacity={args.capacity}\n"
    )
    if args.tpu:
        import time

        from jax.sharding import Mesh

        import numpy as np

        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("data",))
        distributed_node_counts(tokens, lengths, 3, mesh, args.capacity)
        best = None
        for _ in range(3):
            t0 = time.time()
            distributed_node_counts(tokens, lengths, 3, mesh, args.capacity)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        row = {
            "mesh": "1 (real chip)",
            "n_devices": 1,
            "reads_per_sec": round(tokens.shape[0] / best, 1),
            "efficiency": 1.0,
            "platform": platform,
        }
        print(json.dumps(row))
        return

    rows = scaling_report(
        tokens, lengths, k=3, capacity=args.capacity, repeats=3
    )
    print("| mesh | devices | reads/s | weak-scaling efficiency |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['mesh']} | {r['n_devices']} | {r['reads_per_sec']:,} |"
            f" {r['efficiency']:.2f} |"
        )
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
