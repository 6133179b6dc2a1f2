"""Pipeline mode coverage: --assembly (FASTA input, N/A copy numbers) and
--meta (no coverage filtering)."""

import os

import pandas as pd

from synthetic import make_isolate


def _run(files, outdir, extra=()):
    from amira_tpu.__main__ import main

    argv = [
        "--pandoraJSON", files["calls"],
        "--gene-positions", files["positions"],
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


def test_assembly_mode(tmp_path):
    """FASTA input: thresholds drop to 1/0/0 and copy number is N/A."""
    files = make_isolate(
        str(tmp_path / "data"), seed=31, n_reads=20, sub=0.0, indel=0.0,
    )
    # reuse the reads fastq as a pseudo-assembly FASTA
    import gzip

    fasta = str(tmp_path / "data" / "assembly.fa")
    with gzip.open(files["fastq"], "rt") as fh, open(fasta, "w") as out:
        while True:
            h = fh.readline()
            if not h:
                break
            seq = fh.readline().strip()
            fh.readline()
            fh.readline()
            out.write(f">{h[1:].strip()}\n{seq}\n")
    tsv = _run(files, str(tmp_path / "out"), extra=("--assembly", fasta))
    df = pd.read_csv(tsv, sep="\t", keep_default_na=False)
    assert len(df) == 1
    assert df.iloc[0]["Determinant name"] == "amrX"
    assert str(df.iloc[0]["Approximate cellular copy number"]) == "N/A"


def test_component_fastqs_mode(tmp_path):
    files = make_isolate(str(tmp_path / "data"), seed=33, n_reads=40)
    outdir = str(tmp_path / "out")
    tsv = _run(
        files, outdir,
        extra=("--reads", files["fastq"], "--output-component-fastqs"),
    )
    df = pd.read_csv(tsv, sep="\t", keep_default_na=False)
    assert "Component ID" in df.columns
    comp_dir = os.path.join(outdir, "component_fastqs")
    assert os.path.isdir(comp_dir)
    assert any(f.endswith(".fastq.gz") for f in os.listdir(comp_dir))


def test_meta_mode(tmp_path):
    files = make_isolate(str(tmp_path / "data"), seed=32, n_reads=40)
    tsv = _run(
        files, str(tmp_path / "out"),
        extra=("--reads", files["fastq"], "--meta"),
    )
    df = pd.read_csv(tsv, sep="\t", keep_default_na=False)
    assert len(df) == 1
    assert df.iloc[0]["Determinant name"] == "amrX"
    assert str(df.iloc[0]["Approximate cellular copy number"]) == "N/A"
