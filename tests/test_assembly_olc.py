"""Greedy OLC assembler (amira_tpu/assembly.py): contigs must span CHAINS of
dovetail overlaps — past the longest read — which the earlier backbone-polish
stopgap could not do (reference equivalent: Flye, result_utils.py:1267-1288).
"""

import gzip
import os

import numpy as np
import pytest

from amira_tpu.assembly import assemble_path, assemble_reads
from amira_tpu.ops.align import reverse_complement


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _tile_reads(rng, truth, read_len, step, rc_fraction=0.3, sub=0.0):
    reads = {}
    i = 0
    start = 0
    while start < len(truth):
        seq = truth[start : start + read_len]
        if sub > 0:
            chars = list(seq)
            for p in range(len(chars)):
                if rng.rand() < sub:
                    chars[p] = rng.choice(list("ACGT"))
            seq = "".join(chars)
        if rng.rand() < rc_fraction:
            seq = reverse_complement(seq)
        reads[f"r{i}"] = seq
        i += 1
        if start + read_len >= len(truth):
            break
        start += step
    return reads


def test_assembles_past_longest_read_exact():
    rng = np.random.RandomState(7)
    truth = _genome(rng, 3000)
    reads = _tile_reads(rng, truth, read_len=700, step=250)
    assert max(len(s) for s in reads.values()) < len(truth)
    contigs = assemble_reads(reads, polish_iterations=2, band_width=256)
    assert contigs, "no contigs assembled"
    seq, members = contigs[0]
    # error-free overlapping tiles must reconstruct the genome exactly
    # (possibly reverse-complemented as a whole)
    assert seq == truth or reverse_complement(seq) == truth
    assert len(members) > 1


def test_assembles_noisy_reads_high_identity():
    rng = np.random.RandomState(3)
    truth = _genome(rng, 2500)
    reads = _tile_reads(rng, truth, read_len=800, step=200, sub=0.01)
    contigs = assemble_reads(reads, polish_iterations=3, band_width=256)
    assert contigs
    seq = contigs[0][0]
    if len(seq) < len(truth) * 0.95:
        pytest.fail(f"contig too short: {len(seq)} vs {len(truth)}")
    assert len(seq) < len(truth) * 1.05
    # k-mer identity proxy against either strand
    k = 15
    truth_kmers = {truth[i : i + k] for i in range(len(truth) - k + 1)}
    best = 0.0
    for cand in (seq, reverse_complement(seq)):
        kmers = {cand[i : i + k] for i in range(len(cand) - k + 1)}
        best = max(best, len(kmers & truth_kmers) / len(truth_kmers))
    assert best > 0.9, f"kmer identity {best:.3f}"


def test_two_components_two_contigs():
    rng = np.random.RandomState(11)
    t1, t2 = _genome(rng, 1500), _genome(rng, 1200)
    reads = _tile_reads(rng, t1, read_len=600, step=300)
    reads.update(
        {f"s{k}": v for k, v in _tile_reads(rng, t2, 500, 250).items()}
    )
    contigs = assemble_reads(reads, polish_iterations=2, band_width=256)
    assert len(contigs) >= 2
    lens = sorted(len(c[0]) for c in contigs)[-2:]
    assert lens[0] > 1000 and lens[1] > 1300


def test_assemble_path_writes_multifasta(tmp_path):
    rng = np.random.RandomState(5)
    truth = _genome(rng, 2000)
    reads = _tile_reads(rng, truth, read_len=600, step=250)
    fq = tmp_path / "reads.fastq.gz"
    with gzip.open(fq, "wt") as o:
        for rid, seq in reads.items():
            o.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = assemble_path(str(fq), str(tmp_path / "asm"), band_width=256)
    assert out is not None and os.path.exists(out)
    with open(out) as fh:
        text = fh.read()
    assert text.startswith(">contig_1")
    contig = text.split("\n")[1]
    assert contig == truth or reverse_complement(contig) == truth


def test_assembles_through_tandem_duplication():
    """A tandem repeat LONGER than any read (U1 R R U2, |R| > read length)
    must assemble THROUGH the duplication into one contig of the full
    doubled length: the layout walk places the repeat's ~2x-depth interior
    reads twice and takes the repeat re-entry junction before the exit
    (repeat-first traversal). The old one-link-per-read greedy collapsed
    this to one repeat copy."""
    rng = np.random.RandomState(11)
    U1 = _genome(rng, 700)
    R = _genome(rng, 900)
    U2 = _genome(rng, 700)
    truth = U1 + R + R + U2  # 3200 bp, reads 400 bp
    reads = _tile_reads(rng, truth, read_len=400, step=70, rc_fraction=0.0)
    contigs = assemble_reads(reads, min_votes=5)
    assert contigs, "no contigs assembled"
    longest, members = contigs[0]
    # through-the-repeat: the contig must cover ~the full doubled genome,
    # far past the collapsed single-copy length (2300)
    assert len(longest) >= len(truth) - 80, (
        f"repeat collapsed: contig {len(longest)} vs truth {len(truth)}"
    )
    assert len(longest) <= len(truth) + 80
    # and it must BE the doubled genome: exact containment of both unique
    # flanks and two R copies in order (error-free reads -> exact contig)
    assert U1[50:650] in longest
    assert U2[50:650] in longest
    first = longest.find(R)
    assert first != -1, "first repeat copy missing"
    assert longest.find(R, first + 1) != -1, "second repeat copy missing"


def test_interspersed_repeat_does_not_misjoin():
    """An interspersed repeat (A R B R C) with no spanning reads is
    genuinely unresolvable; the assembler must not fabricate a join that
    puts A's flank directly against C's (skipping B). Contigs may break at
    the repeat, but every assembled junction must exist in the truth."""
    rng = np.random.RandomState(13)
    A = _genome(rng, 600)
    R = _genome(rng, 900)
    B = _genome(rng, 600)
    C = _genome(rng, 600)
    truth = A + R + B + R + C
    reads = _tile_reads(rng, truth, read_len=400, step=60, rc_fraction=0.0)
    contigs = assemble_reads(reads, min_votes=5)
    assert contigs
    # every 500bp window of every contig must occur in the truth OR be a
    # repeat-boundary chimera only within R itself (identical copies make
    # R-internal placements interchangeable, never A|C junctions)
    for seq, _members in contigs:
        for s in range(0, max(1, len(seq) - 500), 100):
            win = seq[s : s + 500]
            assert win in truth, "fabricated junction not present in truth"


def test_interspersed_repeat_resolved_with_spanning_reads():
    """An interspersed repeat (A R B R C) IS resolvable when reads span a
    full repeat copy plus unique flanks (the spanning-read half of Flye's
    repeat resolution, result_utils.py:1267-1288): the assembly must cover
    the full genome and every junction must exist in the truth — on
    either strand."""
    rng = np.random.RandomState(29)
    A = _genome(rng, 600)
    R = _genome(rng, 900)
    B = _genome(rng, 600)
    C = _genome(rng, 600)
    truth = A + R + B + R + C
    both = truth + "#" + reverse_complement(truth)
    reads = _tile_reads(rng, truth, read_len=1050, step=80, rc_fraction=0.0)
    contigs = assemble_reads(reads, min_votes=5)
    contigs.sort(key=lambda c: -len(c[0]))
    longest = contigs[0][0]
    assert len(longest) >= len(truth) - 100
    for s in range(0, max(1, len(longest) - 500), 50):
        assert longest[s : s + 500] in both, "fabricated junction"


def test_interspersed_repeat_mixed_strand_no_chimera():
    """Half the spanning reads reverse-complemented (the regression case:
    extension used to fabricate an R|A junction present in no read, and
    the contig merge amplified it into a 4.4 kb chimera). Junction-crossing
    k-mer validation must keep every contig window on-genome."""
    for seed in (13, 3):
        rng = np.random.RandomState(seed)
        A = _genome(rng, 600)
        R = _genome(rng, 900)
        B = _genome(rng, 600)
        C = _genome(rng, 600)
        truth = A + R + B + R + C
        both = truth + "#" + reverse_complement(truth)
        reads = _tile_reads(
            rng, truth, read_len=1300, step=80, rc_fraction=0.5
        )
        contigs = assemble_reads(reads, min_votes=5)
        contigs.sort(key=lambda c: -len(c[0]))
        longest = contigs[0][0]
        assert len(longest) >= len(truth) - 100
        for s in range(0, max(1, len(longest) - 500), 50):
            assert longest[s : s + 500] in both, "fabricated junction"
