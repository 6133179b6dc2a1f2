"""Promoter genotyping end-to-end: SNP in the promoter region is reported
with the reference's mutation-string format."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from synthetic import make_isolate, mutate, random_seq


def test_promoter_snp_reported(tmp_path):
    rng = np.random.RandomState(21)
    datadir = tmp_path / "data"
    files = make_isolate(str(datadir), seed=21, n_reads=80)
    # craft a promoter reference for amrX that differs from the sampled
    # genome by one SNP at position 50: reads carry the genome version, so
    # the polished promoter should report that SNP.
    gene_seq = files["gene_seqs"]["amrX"]
    promoter_true = gene_seq  # reads cover the gene span; reuse as promoter
    promoter_ref = list(promoter_true)
    pos = 50
    orig = promoter_ref[pos]
    promoter_ref[pos] = next(c for c in "ACGT" if c != orig)
    promoter_ref = "".join(promoter_ref)
    with open(files["amr_fasta"], "a") as fh:
        fh.write(f"\n>amrX_promoter;amrX.NG003.1\n{promoter_ref}")
    from test_pipeline import _run_cli

    tsv = _run_cli(
        files, str(tmp_path / "out"), extra=("--promoter-mutations",)
    )
    df = pd.read_csv(tsv, sep="\t")
    promoter_rows = df[df["Amira allele"].astype(str).str.contains("promoter")]
    assert len(promoter_rows) >= 1, df
    name = promoter_rows.iloc[0]["Determinant name"]
    # mutation string: refbase, 1-based position 51, read base
    assert f"{promoter_ref[pos]}{pos + 1}{orig}" in name, name
