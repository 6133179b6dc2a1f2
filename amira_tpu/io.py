"""Host-side sequence I/O: FASTQ/FASTA/SAM parsing and writing.

Standalone replacements for the reference's pysam/gzip usage
(amira/read_utils.py:24-52, pre_processing.py:190-284). Parsers are plain
streaming Python over text/gzip files; they feed the host->device packing
layer.
"""

from __future__ import annotations

import gzip
import os


def _open_maybe_gzip(path, mode="rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def parse_fastq(fastq_file) -> dict:
    """{read_id: {"sequence": str, "quality": str}} (read_utils.py:24-30).

    Uses the native zlib-streamed parser when available."""
    from amira_tpu.native import load as _load_native

    native = _load_native()
    if native is not None:
        try:
            raw = native.parse_fastq(str(fastq_file))
            return {
                name: {"sequence": sq[0], "quality": sq[1]}
                for name, sq in raw.items()
            }
        except Exception:
            pass
    out = {}
    with _open_maybe_gzip(fastq_file) as fh:
        while True:
            header = fh.readline()
            if not header:
                break
            seq = fh.readline().rstrip("\n")
            fh.readline()  # +
            qual = fh.readline().rstrip("\n")
            name = header[1:].rstrip("\n").split()[0]
            out[name] = {"sequence": seq, "quality": qual}
    return out


def parse_fasta(fasta_file) -> dict:
    """{name: {"sequence": str, "quality": "III..."}} — FASTA entries get
    fake 'I' qualities (read_utils.py:32-38)."""
    out = {}
    name = None
    parts: list[str] = []
    with _open_maybe_gzip(fasta_file) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    seq = "".join(parts)
                    out[name] = {"sequence": seq, "quality": "I" * len(seq)}
                name = line[1:].split()[0]
                parts = []
            else:
                parts.append(line)
    if name is not None:
        seq = "".join(parts)
        out[name] = {"sequence": seq, "quality": "I" * len(seq)}
    return out


def write_fastq(fastq_file, data: dict):
    """gzip FASTQ writer (read_utils.py:41-52)."""
    with gzip.open(fastq_file, "wt") as fh:
        lines = []
        for identifier, value in data.items():
            lines.append(f"@{identifier}\n")
            lines.append(f"{value['sequence']}\n")
            lines.append("+\n")
            lines.append(f"{value['quality']}\n")
        fh.writelines(lines)


def write_fasta(file_path, sequences: list[str]):
    with open(file_path, "w") as fh:
        fh.write("\n".join(sequences))


class SamRecord:
    """One SAM alignment line (the fields the pipeline consumes)."""

    __slots__ = (
        "query_name", "flag", "reference_name", "pos", "mapq", "cigar",
        "seq",
    )

    def __init__(self, fields):
        self.query_name = fields[0]
        self.flag = int(fields[1])
        self.reference_name = fields[2]
        self.pos = int(fields[3]) - 1
        self.mapq = int(fields[4])
        self.cigar = _parse_cigar(fields[5])
        self.seq = fields[9]

    @property
    def is_mapped(self):
        return not (self.flag & 4) and self.reference_name != "*"

    @property
    def is_forward(self):
        return not (self.flag & 16)


_CIGAR_OPS = "MIDNSHP=X"
_CIGAR_CODE = {c: i for i, c in enumerate(_CIGAR_OPS)}


def _parse_cigar(cig: str):
    """SAM CIGAR string -> [(op_code, length)] pysam-style tuples."""
    if cig == "*" or not cig:
        return []
    out = []
    n = 0
    for ch in cig:
        if ch.isdigit():
            n = n * 10 + ord(ch) - 48
        else:
            out.append((_CIGAR_CODE[ch], n))
            n = 0
    return out


def parse_sam(sam_path):
    """Stream SamRecords from a SAM file (header lines skipped)."""
    with _open_maybe_gzip(sam_path) as fh:
        for line in fh:
            if line.startswith("@"):
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) < 10:
                continue
            yield SamRecord(fields)


def parse_sam_header_lengths(sam_path) -> dict:
    """Reference name -> length from @SQ header lines."""
    lengths = {}
    with _open_maybe_gzip(sam_path) as fh:
        for line in fh:
            if not line.startswith("@"):
                break
            if line.startswith("@SQ"):
                name = ln = None
                for field in line.rstrip("\n").split("\t")[1:]:
                    if field.startswith("SN:"):
                        name = field[3:]
                    elif field.startswith("LN:"):
                        ln = int(field[3:])
                if name is not None and ln is not None:
                    lengths[name] = ln
    return lengths


def downsample_reads(fastq_content, read_path, output_dir, max_reads=100000, seed=None):
    """Random subsample of the FASTQ to max_reads, written to
    subsampled_reads.fq.gz (read_utils.py:55-73; the `fastaq filter`
    subprocess is replaced by the in-process writer)."""
    import random

    total_reads = len(fastq_content)
    if total_reads <= max_reads:
        selected = list(fastq_content.keys())
    else:
        rng = random.Random(seed)
        selected = rng.sample(list(fastq_content.keys()), max_reads)
        fastq_content = {k: fastq_content[k] for k in selected}
    with open(os.path.join(output_dir, "selected_reads.txt"), "w") as o:
        o.write("\n".join(selected))
    out_path = os.path.join(output_dir, "subsampled_reads.fq.gz")
    write_fastq(out_path, fastq_content)
    return out_path


def write_modified_fastq(fastq_content, read_path, output_dir):
    """Ensure a gzipped copy of the input FASTQ exists
    (read_utils.py:76-82)."""
    if ".gz" not in str(read_path):
        gz_path = os.path.join(
            output_dir, os.path.basename(read_path) + ".gz"
        )
        if not os.path.exists(gz_path):
            with open(read_path, "rb") as src, gzip.open(gz_path, "wb", 1) as dst:
                dst.write(src.read())
        read_path = gz_path
    return read_path, fastq_content


def plot_read_length_distribution(annotatedReads, output_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    read_lengths = [len(v) for v in annotatedReads.values()]
    plt.figure(figsize=(10, 6))
    plt.hist(read_lengths, bins=50, edgecolor="black")
    plt.title("Number of genes per read")
    plt.xlabel("Number of genes")
    plt.ylabel("Absolute frequency")
    plt.savefig(os.path.join(output_dir, "read_lengths.png"), dpi=600)
    plt.close()
