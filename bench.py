"""Benchmark: gene-mer graph build throughput (reads/sec) on the local
device, against a reference-style pure-Python baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

The workload is the reference repo's real 21k-read fixture
(complex_gene_calls_one.json), tiled to ~85k reads. The baseline is a
faithful re-creation of the reference's per-window construction cost model
(sha256-of-pickle per gene per window, per-object dict/list updates —
construct_graph.py:31-102), timed on a subsample and scaled per-read.
"""

import hashlib
import json
import pickle
import sys
import time

TILE = 4
BASELINE_SAMPLE = 1500


def _load_reads():
    with open("/root/reference/tests/complex_gene_calls_one.json") as fh:
        calls = json.load(fh)
    reads = {}
    for t in range(TILE):
        for r, genes in calls.items():
            reads[f"{r}_t{t}"] = genes
    return reads


def _baseline_reads_per_sec(reads):
    """Reference-style graph build: sha256 hashing + per-object updates."""

    def h(value):
        return int(hashlib.sha256(pickle.dumps(value)).hexdigest(), 16)

    sample = dict(list(reads.items())[:BASELINE_SAMPLE])
    k = 3
    start = time.time()
    nodes = {}
    edges = {}
    read_nodes = {}
    for rid, genes in sample.items():
        parsed = [(g[1:], 1 if g[0] == "+" else -1) for g in genes]
        gene_hashes = [h(name) * strand for name, strand in parsed]
        mers = []
        for i in range(len(genes) - k + 1):
            fwd = gene_hashes[i : i + k]
            rc = [-x for x in reversed(fwd)]
            canonical = min(fwd, rc)
            node_hash = h(tuple(canonical))
            mers.append((node_hash, 1 if canonical == fwd else -1))
            entry = nodes.setdefault(node_hash, {"cov": 0, "reads": []})
            entry["cov"] += 1
            if rid not in entry["reads"]:
                entry["reads"].append(rid)
        read_nodes[rid] = [m[0] for m in mers]
        for i in range(len(mers) - 1):
            (s, sd), (t, td) = mers[i], mers[i + 1]
            for key_tuple in (
                min((s * sd, t * td), (-s * sd, -t * td)),
                min((t * -td, s * -sd), (t * td, s * sd)),
            ):
                ekey = h(key_tuple)
                edges[ekey] = edges.get(ekey, 0) + 1
    dt = time.time() - start
    return len(sample) / dt


def _timed_builds(reads):
    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.vocab import GeneVocab

    vocab = GeneVocab()
    # warm-up build compiles every (k, bucket) kernel shape
    GeneMerGraph(dict(list(reads.items())[:2000]), 3, vocab=vocab)
    GeneMerGraph(reads, 3, vocab=vocab)
    best = None
    g = None
    for _ in range(3):
        start = time.time()
        g = GeneMerGraph(reads, 3, vocab=vocab)
        dt = time.time() - start
        best = dt if best is None else min(best, dt)
    return best, g


def main():
    """Supervisor: run the measurement in a child with a hard timeout (the
    TPU tunnel can wedge mid-run, hanging forever in-process); on
    failure/hang, retry on the CPU backend."""
    import os
    import subprocess

    if os.environ.get("AMIRA_TPU_BENCH_STAGE") == "run":
        return _run_bench()
    env = dict(os.environ, AMIRA_TPU_BENCH_STAGE="run")
    try:
        r = subprocess.run([sys.executable, __file__], env=env, timeout=1500)
        if r.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        pass
    sys.stderr.write("[bench] device run failed or hung; CPU fallback\n")
    env["AMIRA_TPU_BENCH_CPU"] = "1"
    raise SystemExit(
        subprocess.run([sys.executable, __file__], env=env, timeout=3000).returncode
    )


def _run_bench():
    import os

    import jax

    if os.environ.get("AMIRA_TPU_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    reads = _load_reads()
    platform = jax.devices()[0].platform
    dt, g = _timed_builds(reads)
    if os.environ.get("AMIRA_TPU_BENCH_CPU"):
        platform = "cpu-fallback"
    reads_per_sec = len(reads) / dt
    n_nodes = g.get_total_number_of_nodes()

    baseline = _baseline_reads_per_sec(reads)
    result = {
        "metric": f"genemer_graph_build_reads_per_sec_{platform}",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / baseline, 2),
    }
    print(json.dumps(result))
    sys.stderr.write(
        f"[bench] {len(reads)} reads, {n_nodes} nodes, build {dt:.2f}s "
        f"({reads_per_sec:.0f} reads/s) vs reference-style baseline "
        f"{baseline:.0f} reads/s on {platform}\n"
    )


if __name__ == "__main__":
    main()
