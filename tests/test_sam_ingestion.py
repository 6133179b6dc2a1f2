"""End-to-end over the production pandora-SAM ingestion path
(convert_pandora_output + consensus QC), using a synthetic pseudo-SAM."""

import gzip
import json
import os

import pandas as pd

from synthetic import make_isolate


def _write_pandora_sam(files, sam_path):
    """Pseudo-SAM in pandora's layout: one record per gene call, region
    encoded via leading hard clips (reference pre_processing.py:66-83
    convention: leading N hard clips -> region start N-1; we emit start+1)."""
    calls = json.load(open(files["calls"]))
    positions = json.load(open(files["positions"]))
    genes = set()
    for r in calls:
        for g in calls[r]:
            genes.add(g[1:])
    with open(sam_path, "w") as o:
        o.write("@HD\tVN:1.6\n")
        for g in sorted(genes):
            o.write(f"@SQ\tSN:{g}\tLN:{len(files['gene_seqs'][g])}\n")
        for r in calls:
            for g, (start, end) in zip(calls[r], positions[r]):
                flag = 0 if g[0] == "+" else 16
                L = end - start + 1
                cigar = (f"{start + 1}H" if start > 0 else "") + f"{L}M"
                o.write(
                    f"{r}\t{flag}\t{g[1:]}\t1\t60\t{cigar}\t*\t0\t0\t*\t*\n"
                )


def _write_consensus(files, path):
    with gzip.open(path, "wt") as o:
        for g, seq in files["gene_seqs"].items():
            o.write(f"@{g}\n{seq}\n+\n{'I' * len(seq)}\n")


def test_sam_ingestion_end_to_end(tmp_path):
    files = make_isolate(str(tmp_path / "data"), seed=41, n_reads=70)
    sam_path = str(tmp_path / "data" / "pandora.filtered.sam")
    consensus_path = str(tmp_path / "data" / "pandora.consensus.fq.gz")
    _write_pandora_sam(files, sam_path)
    _write_consensus(files, consensus_path)
    from amira_tpu.__main__ import main

    outdir = str(tmp_path / "out")
    try:
        main([
            "--pandoraSam", sam_path,
            "--pandoraConsensus", consensus_path,
            "--reads", files["fastq"],
            "--species", "Escherichia_coli",
            "--amr-fasta", files["amr_fasta"],
            "--amr-calls", files["amr_calls"],
            "--core-genes", files["core_genes"],
            "--plasmid-genes", files["plasmid_genes"],
            "--output", outdir,
            "--quiet",
        ])
    except SystemExit as e:
        assert e.code in (None, 0)
    df = pd.read_csv(
        os.path.join(outdir, "amira_results.tsv"), sep="\t",
        keep_default_na=False,
    )
    assert len(df) == 1, df
    row = df.iloc[0]
    assert row["Determinant name"] == "amrX"
    assert float(str(row["Identity (%)"]).split("/")[0]) >= 99.0
    # the SAM path writes its filtered-call checkpoint artifacts
    assert os.path.exists(
        os.path.join(outdir, "gene_calls_with_gene_filtering.json")
    )
