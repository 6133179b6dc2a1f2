"""Benchmark: gene-mer graph build + cleaning-loop rebuild throughput on the
local device, against a reference-style pure-Python baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

The workload mirrors the pipeline's hot phase (SURVEY §3.3): one cold graph
build of the read set plus 11 cleaning-iteration rebuilds, with 2% of reads
perturbed before each rebuild (the typical per-iteration correction churn).
Our build path = device windowing/hashing kernels + the incremental build
cache (amira_tpu/graph_cache.py). The baseline is a faithful re-creation of
the reference's per-window construction cost model (sha256-of-pickle per
gene per window, per-object dict/list updates — construct_graph.py:31-102),
which pays the full cost on every rebuild; it is timed on a subsample and
scaled per-read.

The workload data is the reference repo's real 21k-read fixture
(complex_gene_calls_one.json), tiled to ~85k reads.
"""

import hashlib
import json
import pickle
import random
import sys
import time

TILE = 4
BASELINE_SAMPLE = 1500
REBUILDS = 11  # cleaning-loop iterations after the cold build
CHURN = 0.02  # fraction of reads perturbed per iteration


def _load_reads():
    with open("/root/reference/tests/complex_gene_calls_one.json") as fh:
        calls = json.load(fh)
    reads = {}
    for t in range(TILE):
        for r, genes in calls.items():
            reads[f"{r}_t{t}"] = genes
    return reads


def _perturb(reads, rng):
    """Simulate one cleaning iteration's read churn: re-thread ~2% of reads
    (drop one gene and flip one strand)."""
    ids = rng.sample(list(reads.keys()), max(1, int(len(reads) * CHURN)))
    for rid in ids:
        genes = list(reads[rid])
        if len(genes) > 4:
            del genes[rng.randrange(len(genes))]
        i = rng.randrange(len(genes))
        genes[i] = ("-" if genes[i][0] == "+" else "+") + genes[i][1:]
        reads[rid] = genes
    return reads


def _baseline_reads_per_sec(reads):
    """Reference-style graph build: sha256 hashing + per-object updates.

    Returns per-(re)build throughput — the reference rebuilds from scratch
    every cleaning iteration, so its pipeline throughput over 1+REBUILDS
    builds is this number divided by (1+REBUILDS)."""

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


def _timed_cycle(reads):
    """One cold build + REBUILDS perturbed warm rebuilds (fresh cache), after
    a full warm-up cycle that compiles every kernel shape."""
    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.graph_cache import GraphBuildCache
    from amira_tpu.vocab import GeneVocab

    vocab = GeneVocab()

    def cycle(rds):
        cache = GraphBuildCache()
        g = GeneMerGraph(rds, 3, vocab=vocab, cache=cache)
        rng = random.Random(7)
        for _ in range(REBUILDS):
            rds = _perturb(dict(rds), rng)
            g = GeneMerGraph(rds, 3, vocab=vocab, cache=cache)
        return g

    cycle(dict(list(reads.items())[:2000]))  # compile warm-up
    cycle(dict(reads))
    best = None
    g = None
    for _ in range(2):
        start = time.time()
        g = cycle(dict(reads))
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
    dt, g = _timed_cycle(reads)
    if os.environ.get("AMIRA_TPU_BENCH_CPU"):
        platform = "cpu-fallback"
    n_builds = 1 + REBUILDS
    reads_per_sec = len(reads) * n_builds / dt
    n_nodes = g.get_total_number_of_nodes()

    baseline_one_build = _baseline_reads_per_sec(reads)
    baseline = baseline_one_build  # per rebuild; same reads/s across builds
    result = {
        "metric": f"genemer_cleaning_cycle_reads_per_sec_{platform}",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / baseline, 2),
    }
    print(json.dumps(result))
    sys.stderr.write(
        f"[bench] {len(reads)} reads x {n_builds} builds in {dt:.2f}s "
        f"({reads_per_sec:.0f} reads/s incl. cleaning rebuilds) vs "
        f"reference-style baseline {baseline:.0f} reads/s on {platform}; "
        f"{n_nodes} nodes\n"
    )


if __name__ == "__main__":
    main()
