"""Seed-chain-extend robustness: structural gaps wider than the band,
two-piece affine gap costs, z-drop splitting, chain stitching.

Covers the minimap2 behaviors the reference relies on at
result_utils.py:259-276 that a single-diagonal banded extension misses."""

import numpy as np

from amira_tpu.ops.align import (
    GAP_EXT,
    GAP_EXT2,
    GAP_OPEN,
    GAP_OPEN2,
    MATCH,
    Aligner,
    _cigar_score,
    _seed_chains,
    _zdrop_split,
    build_ref_seed_index,
    gap_cost,
    reverse_complement,
)
from amira_tpu.sketch import encode_dna


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _check_consistent(aln):
    ql = sum(n for op, n in aln.cigar if op in "=XI")
    rl = sum(n for op, n in aln.cigar if op in "=XD")
    assert ql == aln.q_end - aln.q_start
    assert rl == aln.r_end - aln.r_start
    assert aln.cigar[0][0] not in "ID" and aln.cigar[-1][0] not in "ID"


def test_gap_cost_two_piece():
    # short gaps priced by the steep piece, long gaps by the shallow one
    assert gap_cost(1) == GAP_OPEN
    assert gap_cost(5) == GAP_OPEN + 4 * GAP_EXT
    assert gap_cost(100) == GAP_OPEN2 + 99 * GAP_EXT2
    g = 50
    assert gap_cost(g) == min(
        GAP_OPEN + (g - 1) * GAP_EXT, GAP_OPEN2 + (g - 1) * GAP_EXT2
    )


def test_medium_deletion_uses_long_gap_piece():
    """A 60 bp in-band deletion must be priced at O2+gE2, not O1+gE1."""
    rng = np.random.RandomState(11)
    ref = _random_seq(rng, 500)
    read = ref[:220] + ref[280:]
    aligner = Aligner({"r": ref}, band_width=256)
    _, aln = aligner.map_sequence(read)["r"]
    assert ("D", 60) in aln.cigar
    assert aln.score == MATCH * 440 - (GAP_OPEN2 + 59 * GAP_EXT2)
    _check_consistent(aln)


def test_deletion_wider_than_band_is_stitched():
    """A 1 kb deletion (band is 256) maps as ONE alignment with one long D
    run — two seed chains on distinct diagonals, stitched."""
    rng = np.random.RandomState(42)
    ref = _random_seq(rng, 3000)
    read = ref[100:1200] + ref[2200:2900]
    aligner = Aligner({"r": ref}, band_width=256)
    strand, aln = aligner.map_sequence(read)["r"]
    assert strand == "+"
    assert (aln.q_start, aln.q_end) == (0, len(read))
    assert (aln.r_start, aln.r_end) == (100, 2900)
    assert ("D", 1000) in aln.cigar
    assert aln.score == _cigar_score(aln.cigar)
    _check_consistent(aln)


def test_insertion_wider_than_band_is_stitched():
    rng = np.random.RandomState(7)
    ref = _random_seq(rng, 2500)
    ins = _random_seq(rng, 800)
    read = ref[100:1200] + ins + ref[1200:2000]
    aligner = Aligner({"r": ref}, band_width=256)
    _, aln = aligner.map_sequence(read)["r"]
    long_i = [n for op, n in aln.cigar if op == "I" and n >= 700]
    assert long_i, aln.cigar
    assert (aln.r_start, aln.r_end) == (100, 2000)
    _check_consistent(aln)


def test_stitched_reverse_strand():
    rng = np.random.RandomState(9)
    ref = _random_seq(rng, 2400)
    fwd = ref[0:1000] + ref[1800:2400]
    read = reverse_complement(fwd)
    aligner = Aligner({"r": ref}, band_width=256)
    strand, aln = aligner.map_sequence(read)["r"]
    assert strand == "-"
    assert ("D", 800) in aln.cigar
    _check_consistent(aln)


def test_seed_chains_finds_both_diagonals():
    rng = np.random.RandomState(3)
    ref = _random_seq(rng, 3000)
    read = ref[0:1000] + ref[2000:3000]
    idx = build_ref_seed_index(encode_dna(ref))
    chains = _seed_chains(encode_dna(read), idx, band_width=256)
    diags = sorted(d for d, _ in chains)
    assert len(diags) >= 2
    assert any(abs(d - 0) < 128 for d in diags)
    assert any(abs(d - 1000) < 128 for d in diags)


def test_zdrop_splits_bad_join():
    """An alignment bridging two good blocks through ~200 junk columns is
    split by z-drop into clean pieces."""
    from amira_tpu.ops.align import Alignment

    cigar = [("=", 500), ("X", 200), ("=", 500)]
    aln = Alignment(
        q_start=0, q_end=1200, r_start=0, r_end=1200,
        score=_cigar_score(cigar), cigar=cigar, q_len=1200, r_len=2000,
    )
    pieces = _zdrop_split(aln, z=400)
    assert len(pieces) == 2
    assert pieces[0].cigar == [("=", 500)]
    assert pieces[1].cigar == [("=", 500)]
    assert pieces[1].q_start == 700 and pieces[1].r_start == 700
    for p in pieces:
        _check_consistent(p)


def test_zdrop_keeps_clean_alignment_object():
    from amira_tpu.ops.align import Alignment

    cigar = [("=", 300), ("X", 5), ("=", 300)]
    aln = Alignment(
        q_start=0, q_end=605, r_start=0, r_end=605,
        score=_cigar_score(cigar), cigar=cigar, q_len=605, r_len=700,
    )
    assert _zdrop_split(aln) == [aln]


def test_inversion_does_not_bridge_garbage():
    """A read whose middle third is inverted: the forward mapping must keep
    the flanks as high-identity alignment, not bridge the inverted block
    with mismatch columns."""
    rng = np.random.RandomState(21)
    ref = _random_seq(rng, 2400)
    read = ref[0:800] + reverse_complement(ref[800:1600]) + ref[1600:2400]
    aligner = Aligner({"r": ref}, band_width=256)
    strand, aln = aligner.map_sequence(read)["r"]
    # matched columns dominate whatever span is kept: no 800-column
    # mismatch bridge survives z-drop + stitch-only-if-better
    n_eq = sum(n for op, n in aln.cigar if op == "=")
    n_x = sum(n for op, n in aln.cigar if op == "X")
    assert n_eq >= 790
    assert n_x <= 100
    _check_consistent(aln)


def test_noisy_structural_deletion():
    """ONT-like noise on top of a >band deletion still stitches."""
    rng = np.random.RandomState(5)
    ref = _random_seq(rng, 3000)
    raw = ref[50:1300] + ref[2100:2950]
    read = []
    for ch in raw:
        r = rng.rand()
        if r < 0.04:
            read.append(rng.choice([c for c in "ACGT" if c != ch]))
        elif r < 0.05:
            continue
        elif r < 0.06:
            read.append(ch)
            read.append(rng.choice(list("ACGT")))
        else:
            read.append(ch)
    read = "".join(read)
    aligner = Aligner({"r": ref}, band_width=256)
    _, aln = aligner.map_sequence(read)["r"]
    long_d = [n for op, n in aln.cigar if op == "D" and n >= 700]
    assert long_d, "deletion not stitched"
    assert aln.r_end - aln.r_start >= 2700
    _check_consistent(aln)


def test_bucket_properties():
    """Buckets always cover n, are monotonic, and the CPU fine ladder
    quarters the pow2 steps above the minimum."""
    from amira_tpu.ops import align as A

    old = A._FINE_BUCKETS
    try:
        for fine in (False, True):
            A._FINE_BUCKETS = fine
            prev = 0
            for n in [1, 63, 64, 65, 100, 255, 256, 257, 1000, 1100, 2047, 2048, 5000]:
                b = A._bucket(n)
                assert b >= n
                assert b >= prev or n <= prev
                prev = b
            if fine:
                assert A._bucket(1100) == 1536  # quarter-step of 2048
            else:
                assert A._bucket(1100) == 2048
    finally:
        A._FINE_BUCKETS = old
