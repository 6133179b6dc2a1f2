"""End-to-end pipeline tests on synthetic isolates, driven through the CLI."""

import os

import pandas as pd
import pytest

from synthetic import make_isolate


def _run_cli(files, outdir, extra=()):
    from amira_tpu.__main__ import main

    argv = [
        "--pandoraJSON", files["calls"],
        "--gene-positions", files["positions"],
        "--reads", files["fastq"],
        "--species", "Escherichia_coli",
        "--amr-fasta", files["amr_fasta"],
        "--amr-calls", files["amr_calls"],
        "--core-genes", files["core_genes"],
        "--plasmid-genes", files["plasmid_genes"],
        "--output", outdir,
        "--quiet",
        *extra,
    ]
    try:
        main(argv)
    except SystemExit as e:
        assert e.code in (None, 0)
    return os.path.join(outdir, "amira_results.tsv")


def test_single_copy_amr_gene_end_to_end(tmp_path):
    files = make_isolate(str(tmp_path / "data"), seed=0, n_reads=80)
    tsv = _run_cli(files, str(tmp_path / "out"))
    df = pd.read_csv(tsv, sep="\t")
    assert len(df) == 1, df
    row = df.iloc[0]
    assert row["Determinant name"] == "amrX"
    # the polished allele matches the true reference allele (reference
    # semantics: "Closest reference" = allele name token after the first dot)
    assert row["Closest reference"] == "NG001"
    assert float(str(row["Identity (%)"]).split("/")[0]) >= 99.0
    assert float(str(row["Coverage (%)"]).split("/")[0]) >= 99.0
    cn = float(row["Approximate cellular copy number"])
    assert 0.5 <= cn <= 1.6
    assert row["Sequence name"] == "amrX reference phenotype"
    # artifacts follow the reference layout
    outdir = str(tmp_path / "out")
    assert os.path.exists(
        os.path.join(outdir, "AMR_allele_fastqs", row["Amira allele"],
                     "06.final_sequence.fasta")
    )
    assert os.path.exists(os.path.join(outdir, "corrected_gene_calls.json"))
    assert any(f.endswith(".gml") for f in os.listdir(outdir))


def test_no_amr_genes_empty_result(tmp_path):
    files = make_isolate(
        str(tmp_path / "data"), seed=1, n_reads=30,
        layout=["geneA", "geneB", "geneC", "geneD"], amr_genes=("amrZ",),
    )
    # amrZ is in the panel but absent from every read
    tsv = _run_cli(files, str(tmp_path / "out"))
    df = pd.read_csv(tsv, sep="\t")
    assert len(df) == 0


def test_two_copy_amr_gene_separated(tmp_path):
    """The same AMR gene at two genomic loci with different contexts is split
    into two alleles."""
    layout = [
        "geneA", "geneB", "amrX", "geneC", "geneD", "geneE", "geneF",
        "geneG", "geneK", "geneL", "amrX", "geneH", "geneI", "geneJ",
    ]
    files = make_isolate(
        str(tmp_path / "data"), seed=2, n_reads=160, layout=layout,
        genes_per_read=(4, 7),
    )
    tsv = _run_cli(files, str(tmp_path / "out"))
    df = pd.read_csv(tsv, sep="\t")
    assert len(df) == 2, df
    assert set(df["Determinant name"]) == {"amrX"}
    alleles = set(df["Amira allele"])
    assert alleles == {"amrX_1", "amrX_2"}


def test_results_tsv_matches_committed_golden(tmp_path):
    """Full-pipeline byte-parity regression: the two-AMR-gene seed-7 isolate
    must reproduce the committed amira_results.tsv exactly (columns, value
    formatting, row order — the reference's output contract,
    result_utils.py:124-207 + __main__.py:798-800)."""
    files = make_isolate(
        str(tmp_path / "data"),
        seed=7,
        n_reads=90,
        amr_genes=("amrX", "amrY"),
        layout=[
            "geneA", "geneB", "amrX", "geneC",
            "geneD", "amrY", "geneE", "geneF",
        ],
    )
    tsv = _run_cli(files, str(tmp_path / "out"))
    golden = os.path.join(
        os.path.dirname(__file__), "goldens", "amira_results_seed7.tsv"
    )
    assert open(tsv).read() == open(golden).read()


def test_dist_build_produces_identical_results(tmp_path):
    """--dist-build shards the initial/final graph builds over the 8-device
    test mesh; the TSV must be byte-identical to the single-device run."""
    files = make_isolate(str(tmp_path / "data"), seed=3, n_reads=70)
    tsv_single = _run_cli(files, str(tmp_path / "out_single"))
    tsv_dist = _run_cli(files, str(tmp_path / "out_dist"), extra=("--dist-build",))
    assert open(tsv_dist).read() == open(tsv_single).read()
