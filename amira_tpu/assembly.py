"""Per-path assembly of the full reads assigned to each AMR gene copy.

The reference optionally shells out to Flye (`--assemble-paths`,
result_utils.py:1267-1288). Here assembly is backbone-polish: the longest
read of the path is taken as the draft and iteratively polished against the
remaining reads with the consensus kernel — appropriate for the locus/
plasmid-scale paths this feature targets, and it runs on-device.
"""

from __future__ import annotations

import glob
import os
import sys

from amira_tpu.io import parse_fastq, write_fasta
from amira_tpu.ops.consensus import polish


def assemble_path(fastq_path, out_dir, iterations=3, band_width=512):
    reads = parse_fastq(fastq_path)
    if not reads:
        return None
    backbone_id = max(reads, key=lambda r: len(reads[r]["sequence"]))
    backbone = reads[backbone_id]["sequence"]
    others = {
        r: v["sequence"] for r, v in reads.items() if r != backbone_id
    }
    if others:
        assembly = polish(backbone, others, iterations=iterations, band_width=band_width)
    else:
        assembly = backbone
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "assembly.fasta")
    write_fasta(out_path, [f">contig_1 backbone={backbone_id}\n{assembly}"])
    return out_path


def assemble_full_length_paths(output_dir, cores=1):
    """(result_utils.py:1267-1288)"""
    fastq_files = glob.glob(
        os.path.join(output_dir, "AMR_allele_fastqs", "path_reads", "*.fastq.gz")
    )
    assembly_dir = os.path.join(output_dir, "path_assemblies")
    os.makedirs(assembly_dir, exist_ok=True)
    for fastq_file in fastq_files:
        path_id = os.path.basename(fastq_file).replace(".fastq.gz", "")
        try:
            assemble_path(
                fastq_file, os.path.join(assembly_dir, f"path_{path_id}")
            )
        except Exception as e:  # match the reference's log-and-skip behavior
            sys.stderr.write(
                f"\namira-tpu: error assembling path {path_id}: {e}\n"
            )
            continue
