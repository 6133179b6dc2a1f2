"""Benchmark: the graph cleaning cycle — builds + coverage filtering + read
correction + tip trimming — on the local device, against a reference-style
pure-Python baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

The workload mirrors the pipeline's hot phase (SURVEY §3.3, the
iterative_bubble_popping loop): one cold graph build of the read set plus
CLEAN_ITERS full cleaning iterations, each = {perturb ~2% of reads (the
typical correction churn) → rebuild → coverage-filter + correct reads →
rebuild → tip-trim + correct reads}, exactly the tensor cleaning path the
pipeline runs (amira_tpu/clean.py + graph_utils.iterative_bubble_popping).
Our path = device windowing/hashing kernels + incremental build cache +
table-resident cleaning. The baseline is a faithful re-creation of the
reference's per-window construction cost model (sha256-of-pickle per gene
per window, per-object dict/list updates — construct_graph.py:31-102), which
pays the full build cost on every rebuild; it is timed on a subsample and
scaled per-read, and is *conservative*: the reference's own per-object
filter/correct cost on top of its rebuilds is not charged.

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
# Full cleaning iterations per cycle after the cold build. The reference's
# driver loop runs up to 30 iterations per k (graph_utils.py:127-181 +
# __main__.py:399); 10 approximates the pipeline's steady-state cold:warm
# build mix.
CLEAN_ITERS = 10
CHURN = 0.02  # fraction of reads perturbed per iteration
NODE_MIN_COV = 3  # pipeline default node_min_coverage
K = 3

# alleles/s stage: clusters polished in batched lockstep vs one-at-a-time
POLISH_CLUSTERS = 40
POLISH_READS = 16
POLISH_SERIAL_SAMPLE = 6


def _load_reads():
    with open("/root/reference/tests/complex_gene_calls_one.json") as fh:
        calls = json.load(fh)
    reads = {}
    for t in range(TILE):
        for r, genes in calls.items():
            reads[f"{r}_t{t}"] = genes
    positions = {
        r: [(i * 100, i * 100 + 99) for i in range(len(g))]
        for r, g in reads.items()
    }
    return reads, positions


def _perturb(reads, positions, rng):
    """Simulate one cleaning iteration's extra read churn: re-thread ~2% of
    reads (drop one gene and flip one strand), keeping positions aligned."""
    ids = rng.sample(list(reads.keys()), max(1, int(len(reads) * CHURN)))
    for rid in ids:
        genes = list(reads[rid])
        pos = list(positions[rid])
        if len(genes) > 4:
            j = rng.randrange(len(genes))
            del genes[j]
            del pos[j]
        i = rng.randrange(len(genes))
        genes[i] = ("-" if genes[i][0] == "+" else "+") + genes[i][1:]
        reads[rid] = genes
        positions[rid] = pos
    return reads, positions


def _baseline_reads_per_sec(reads):
    """Reference-style graph build: sha256 hashing + per-object updates.

    Returns per-(re)build throughput — the reference rebuilds from scratch
    every cleaning iteration (2 rebuilds per iteration plus the per-object
    filter/correct work, which we do NOT charge here)."""

    def h(value):
        return int(hashlib.sha256(pickle.dumps(value)).hexdigest(), 16)

    sample = dict(list(reads.items())[:BASELINE_SAMPLE])
    k = K
    best = None
    for _ in range(3):  # best-of-3: the shared 2-core host is noisy
        dt = _baseline_once(sample, k, h)
        best = dt if best is None else min(best, dt)
    return len(sample) / best


def _baseline_once(sample, k, h):
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
    return time.time() - start


def _timed_cycle(reads, positions):
    """One cold build + CLEAN_ITERS full tensor cleaning iterations (fresh
    cache), after a full warm-up cycle that compiles every kernel shape."""
    from amira_tpu import clean
    from amira_tpu.graph import GeneMerGraph
    from amira_tpu.graph_cache import GraphBuildCache
    from amira_tpu.vocab import GeneVocab

    vocab = GeneVocab()

    def cycle(rds, pos):
        cache = GraphBuildCache()
        fastq = {}  # no real sequences needed: positions stay in-bounds
        seq = {"sequence": "A" * 2_000_000}
        fastq = {r: seq for r in rds}
        g = GeneMerGraph(rds, K, pos, vocab=vocab, cache=cache)
        rng = random.Random(7)
        n_builds = 1
        for _ in range(CLEAN_ITERS):
            rds, pos = _perturb(dict(rds), dict(pos), rng)
            g = GeneMerGraph(rds, K, pos, vocab=vocab, cache=cache)
            rds, pos = clean.filter_and_correct(g, NODE_MIN_COV, fastq)
            g = GeneMerGraph(rds, K, pos, vocab=vocab, cache=cache)
            rds, pos = clean.tip_trim_and_correct(g, K, fastq)
            n_builds += 2
        return g, n_builds

    small = dict(list(reads.items())[:2000])
    small_pos = {r: positions[r] for r in small}
    cycle(small, small_pos)  # compile warm-up
    cycle(dict(reads), dict(positions))
    best = None
    g = None
    for _ in range(2):
        start = time.time()
        g, n_builds = cycle(dict(reads), dict(positions))
        dt = time.time() - start
        best = dt if best is None else min(best, dt)
    return best, g, n_builds


def _polish_workload(tmpdir):
    """POLISH_CLUSTERS allele clusters: per gene, a true allele + a 2%%
    diverged reference allele and POLISH_READS noisy read slices (the
    get_alleles input contract, result_utils.py:728-765)."""
    import numpy as np

    rng = np.random.RandomState(11)
    bases = np.array(list("ACGT"))

    def rand_seq(n):
        return "".join(rng.choice(bases, size=n))

    def mutate(seq, rate):
        out = []
        for ch in seq:
            r = rng.rand()
            if r < rate:
                out.append(str(rng.choice([c for c in "ACGT" if c != ch])))
            elif r < 1.5 * rate:
                continue
            else:
                out.append(ch)
        return "".join(out)

    reference_genes = {}
    clusters = {}
    fastq = {}
    phenos = {}
    for gi in range(POLISH_CLUSTERS):
        gene = f"gene{gi}"
        true_allele = rand_seq(800)
        reference_genes[gene] = {
            f"{gene}.a1": true_allele,
            f"{gene}.a2": mutate(true_allele, 0.02),
        }
        phenos[f"{gene}.a1"] = f"pheno {gene} a1"
        phenos[f"{gene}.a2"] = f"pheno {gene} a2"
        allele_name = f"{gene}_1"
        members = []
        for ri in range(POLISH_READS):
            rid = f"r{gi}_{ri}"
            flank_l, flank_r = rand_seq(150), rand_seq(150)
            read_seq = flank_l + mutate(true_allele, 0.03) + flank_r
            fastq[rid] = {"sequence": read_seq, "quality": "I" * len(read_seq)}
            members.append(f"{rid}_{150}_{len(read_seq) - 151}")
        clusters[allele_name] = members
    import json as _json
    import os as _os

    pheno_path = _os.path.join(tmpdir, "calls.json")
    with open(pheno_path, "w") as fh:
        _json.dump(phenos, fh)
    return clusters, reference_genes, fastq, pheno_path


def _bench_polish():
    """Batched allele polishing throughput (alleles/s) and its speedup over
    the serial per-allele pipeline (same kernels, one cluster at a time)."""
    import shutil
    import tempfile

    from amira_tpu.results import compare_reads_to_references, get_alleles

    tmpdir = tempfile.mkdtemp(prefix="amira_bench_polish_")
    try:
        clusters, reference_genes, fastq, pheno_path = _polish_workload(tmpdir)
        # warm-up (compiles)
        get_alleles(
            dict(list(clusters.items())[:2]), tmpdir, reference_genes,
            pheno_path, fastq, 0.9, 0.9,
        )
        t0 = time.time()
        df = get_alleles(
            clusters, tmpdir, reference_genes, pheno_path, fastq, 0.9, 0.9
        )
        dt = time.time() - t0
        assert len(df) == POLISH_CLUSTERS
        # serial path on a subsample
        with open(pheno_path) as fh:
            phenos = json.load(fh)
        serial_names = list(clusters.keys())[:POLISH_SERIAL_SAMPLE]
        t0 = time.time()
        for an in serial_names:
            compare_reads_to_references(
                an, clusters[an], tmpdir, reference_genes, fastq,
                phenos, 0.9, 0.9,
            )
        serial_dt = time.time() - t0
        alleles_per_sec = POLISH_CLUSTERS / dt
        serial_aps = POLISH_SERIAL_SAMPLE / serial_dt
        return alleles_per_sec, alleles_per_sec / serial_aps
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


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
    reads, positions = _load_reads()
    platform = jax.devices()[0].platform
    dt, g, n_builds = _timed_cycle(reads, positions)
    if os.environ.get("AMIRA_TPU_BENCH_CPU"):
        platform = "cpu-fallback"
    reads_per_sec = len(reads) * n_builds / dt
    n_nodes = g.get_total_number_of_nodes()

    baseline = _baseline_reads_per_sec(reads)  # per rebuild, build cost only

    # secondary metric: batched allele polishing (alleles/s, speedup vs the
    # serial per-allele pipeline on the same kernels)
    try:
        aps, polish_speedup = _bench_polish()
        print(
            json.dumps(
                {
                    "metric": f"allele_polish_alleles_per_sec_{platform}",
                    "value": round(aps, 2),
                    "unit": "alleles/s",
                    "vs_baseline": round(polish_speedup, 2),
                }
            )
        )
        sys.stderr.write(
            f"[bench] polish: {POLISH_CLUSTERS} clusters at {aps:.2f} "
            f"alleles/s, {polish_speedup:.2f}x the serial per-allele path\n"
        )
    except Exception as e:  # noqa: BLE001 — secondary metric must not kill the run
        sys.stderr.write(f"[bench] polish stage failed: {e}\n")

    # headline metric LAST on stdout
    result = {
        "metric": f"genemer_cleaning_cycle_reads_per_sec_{platform}",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / baseline, 2),
    }
    print(json.dumps(result))
    sys.stderr.write(
        f"[bench] {len(reads)} reads x {n_builds} builds "
        f"({CLEAN_ITERS} full cleaning iterations: filter+correct+tips) in "
        f"{dt:.2f}s ({reads_per_sec:.0f} reads/s) vs reference-style "
        f"baseline {baseline:.0f} reads/s on {platform}; {n_nodes} nodes\n"
    )


if __name__ == "__main__":
    main()
