"""Closest-allele selection from pre-computed SAM alignments — parity with
the reference's tests/test_gene_mer_graph.py:5083-5092 fixture."""

import os

import pytest

REF_SAM = "/root/reference/tests/test_allele.sam"


@pytest.mark.skipif(not os.path.exists(REF_SAM), reason="fixture unavailable")
def test_get_closest_allele_from_sam_fixture():
    from amira_tpu.results import get_closest_allele_from_sam

    validity, references, unique_reads = get_closest_allele_from_sam(
        REF_SAM, "allele", 0.9, 0.9
    )
    assert validity is True
    assert len(references) == 6
    # the best hit is first and fully covers its reference
    best = references[0]
    assert best[3] >= 0.85
    assert len(unique_reads) >= 1
