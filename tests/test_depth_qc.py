"""Consensus-QC and depth-estimation parity with the reference.

Mirrors amira/pre_processing.py:126-187 (remove_poorly_mapped_genes: full
read set, per-base consensus pileup, AMR genes exempt) and :322-389
(samtools-coverage mean core-gene depth when the read set was NOT
subsampled; call-count depth when it was)."""

import numpy as np

from amira_tpu.preprocess import (
    get_core_gene_mean_depth,
    remove_poorly_mapped_genes,
    subsample_reads_and_estimate_read_depth,
)


def _mk_consensus(rng, genes, n=400):
    return {
        g: {"sequence": "".join(rng.choice(list("ACGT"), size=n))}
        for g in genes
    }


def test_qc_drops_uncovered_non_amr_gene_and_keeps_amr():
    rng = np.random.RandomState(3)
    consensus = _mk_consensus(rng, ["covered", "uncovered", "amrGene"])
    fastq = {}
    for i in range(8):
        # reads covering `covered` fully; nothing maps to the others
        fastq[f"r{i}"] = {"sequence": consensus["covered"]["sequence"]}
    depths = remove_poorly_mapped_genes(
        consensus, 0.2, {"amrGene"}, fastq
    )
    assert "covered" in consensus
    assert "uncovered" not in consensus  # >20% bases uncovered, non-AMR
    assert "amrGene" in consensus  # AMR genes are exempt from the QC drop
    assert "uncovered" not in depths
    # the pileup counted every read
    assert int(depths["covered"].max()) == 8


def test_qc_uses_full_read_set_by_default():
    rng = np.random.RandomState(4)
    consensus = _mk_consensus(rng, ["g1"])
    fastq = {
        f"r{i}": {"sequence": consensus["g1"]["sequence"]} for i in range(12)
    }
    depths = remove_poorly_mapped_genes(consensus, 0.2, set(), fastq)
    assert int(depths["g1"].max()) == 12


def test_core_gene_mean_depth(tmp_path):
    core = tmp_path / "core.txt"
    core.write_text("geneA\ngeneB\n")
    depths = {
        "geneA": np.full(100, 10, np.int32),  # mean 10
        "geneB": np.concatenate(
            [np.full(50, 4, np.int32), np.zeros(50, np.int32)]
        ),  # mean 2
        "notCore": np.full(100, 99, np.int32),
    }
    assert get_core_gene_mean_depth(depths, str(core)) == 6.0
    assert get_core_gene_mean_depth({}, str(core)) == 0


def test_depth_route_depends_on_subsampling(tmp_path):
    core = tmp_path / "core.txt"
    core.write_text("geneA\n")
    reads = {f"r{i}": ["+geneA", "+geneB", "+geneC"] for i in range(10)}
    depths = {"geneA": np.full(100, 7, np.int32)}
    # not subsampled -> consensus pileup depth (samtools-coverage route)
    kept, depth = subsample_reads_and_estimate_read_depth(
        dict(reads), 50, str(core), 0, depths
    )
    assert len(kept) == 10 and depth == 7.0
    # subsampled -> core-gene call counts over the subsample
    kept, depth = subsample_reads_and_estimate_read_depth(
        dict(reads), 4, str(core), 0, depths
    )
    assert len(kept) == 4 and depth == 4.0
