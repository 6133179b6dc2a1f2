"""Racon-equivalent polishing golden on REAL fixture reads.

The reference polishes each allele cluster with 5 iterations of
minimap2+racon (result_utils.py:285-335, 541-556); its test fixtures
tests/test_allele_{1,2,3}/ ship real ONT read slices plus the gene's
reference-allele FASTA. Here the same inputs run through this repo's
aligner+consensus polisher and must (a) byte-match the pinned golden
(tests/goldens/polished_alleles.json), (b) pick the gene-correct closest
catalog allele at full coverage, and (c) be a polish fixpoint — racon's
convergence property. On two of the three fixtures the polished sequence
IS a catalog allele byte-for-byte (identity 1.0), the strongest parity
statement available without the racon binary."""

import glob
import gzip
import json
import os

import pytest

from amira_tpu.ops.align import Aligner
from amira_tpu.ops.consensus import polish

REF_ROOT = "/root/reference/tests"
GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "polished_alleles.json")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "test_allele_1")),
    reason="reference fixture checkout not available",
)

EXPECTED_CLOSEST = {
    "test_allele_1": ("sul2.NG_048116.1", 0.95),
    "test_allele_2": ("catB3.NG_052455.1", 1.0),
    "test_allele_3": ("sul1.NG_048082.1", 1.0),
}


def _load_fastq(path):
    with gzip.open(path, "rt") as f:
        lines = f.read().splitlines()
    return {lines[i][1:].split()[0]: lines[i + 1] for i in range(0, len(lines), 4)}


def _load_fasta(path):
    seqs, name = {}, None
    for line in open(path):
        if line.startswith(">"):
            name = line[1:].strip()
            seqs[name] = []
        else:
            seqs[name].append(line.strip())
    return {k: "".join(v) for k, v in seqs.items()}


import functools


@functools.lru_cache(maxsize=None)
def _polish_fixture(fixture):
    base = os.path.join(REF_ROOT, fixture)
    references = _load_fasta(os.path.join(base, "01.reference_alleles.fasta"))
    reads = _load_fastq(glob.glob(os.path.join(base, "*.fastq.gz"))[0])
    aligner = Aligner(references, band_width=256)
    coverage = {}
    for _rid, hits in aligner.map_reads(reads).items():
        for name, (_strand, aln) in hits.items():
            coverage[name] = coverage.get(name, 0) + aln.matching_bases
    start = max(coverage, key=coverage.get)
    polished = polish(references[start], reads, iterations=5)
    return aligner, references, reads, polished


@pytest.mark.parametrize("fixture", sorted(EXPECTED_CLOSEST))
def test_polish_real_fixture(fixture):
    aligner, references, reads, polished = _polish_fixture(fixture)
    golden = json.load(open(GOLDEN))
    assert polished == golden[fixture], "polished sequence drifted from golden"
    # closest catalog allele of the polished sequence (the reference's
    # get_closest_allele step, result_utils.py:345-420)
    hits = aligner.map_sequence(polished)
    name, (_strand, aln) = max(
        hits.items(), key=lambda kv: kv[1][1].matching_bases
    )
    expected_name, min_identity = EXPECTED_CLOSEST[fixture]
    assert name == expected_name
    assert aln.identity() >= min_identity
    assert (aln.q_end - aln.q_start) == len(polished)  # full coverage
    # racon's convergence property: one more polish round is a no-op
    assert polish(polished, reads, iterations=1) == polished


def test_two_fixtures_recover_exact_catalog_allele():
    """catB3/sul1 reads encode their catalog allele byte-for-byte: the
    polished sequence must EQUAL it (nucleotide-accuracy parity,
    README.md:172's 99.9% claim exercised at 100%)."""
    for fixture in ("test_allele_2", "test_allele_3"):
        aligner, references, _reads, polished = _polish_fixture(fixture)
        expected_name, _ = EXPECTED_CLOSEST[fixture]
        assert polished == references[expected_name]
