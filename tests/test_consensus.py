"""Consensus polishing: noisy ONT-like reads recover the true allele."""

import numpy as np

from amira_tpu.ops.align import reverse_complement
from amira_tpu.ops.consensus import polish, polish_once


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _noisy(rng, seq, sub=0.04, indel=0.03):
    out = []
    for ch in seq:
        r = rng.rand()
        if r < sub:
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        elif r < sub + indel / 2:
            continue
        elif r < sub + indel:
            out.append(ch)
            out.append(rng.choice(list("ACGT")))
        else:
            out.append(ch)
    return "".join(out)


def test_polish_recovers_truth_from_noisy_reads():
    rng = np.random.RandomState(11)
    truth = _random_seq(rng, 1200)
    # the draft is a diverged reference allele (1.5% SNPs)
    draft = _noisy(rng, truth, sub=0.015, indel=0.0)
    reads = {f"r{i}": _noisy(rng, truth) for i in range(30)}
    polished = polish(draft, reads, iterations=5, band_width=128)
    # nucleotide accuracy of the polished allele vs truth
    from amira_tpu.ops.align import Aligner

    aligner = Aligner({"truth": truth}, band_width=128)
    _, aln = aligner.map_sequence(polished)["truth"]
    identity = aln.identity()
    assert identity >= 0.999, identity
    assert abs(len(polished) - len(truth)) <= 2


def test_polish_handles_reverse_strand_reads():
    rng = np.random.RandomState(12)
    truth = _random_seq(rng, 800)
    draft = _noisy(rng, truth, sub=0.01, indel=0.0)
    reads = {}
    for i in range(20):
        r = _noisy(rng, truth)
        reads[f"r{i}"] = r if i % 2 == 0 else reverse_complement(r)
    polished = polish(draft, reads, iterations=5, band_width=128)
    from amira_tpu.ops.align import Aligner

    aligner = Aligner({"truth": truth}, band_width=128)
    _, aln = aligner.map_sequence(polished)["truth"]
    assert aln.identity() >= 0.999


def test_polish_no_reads_is_identity():
    draft = "ACGT" * 100
    assert polish(draft, {}, iterations=5) == draft


def test_polish_once_returns_alignments():
    rng = np.random.RandomState(13)
    truth = _random_seq(rng, 500)
    reads = {f"r{i}": truth for i in range(5)}
    consensus, alns = polish_once(truth, reads, band_width=64)
    assert consensus == truth
    assert len(alns) == 5
