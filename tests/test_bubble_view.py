"""Table-backed bubble popping == object-graph bubble popping, exactly.

The lazy BubbleView path (amira_tpu/bubble_view.py) must reproduce the
materialized object path byte-for-byte: same corrected gene lists, same
remapped positions, same path-coverage samples — on synthetic bubbles AND
real fixtures, including chained cleaning iterations."""

import copy
import json
import os

import numpy as np
import pytest

from amira_tpu.bubble_view import BubbleView
from amira_tpu.graph import GeneMerGraph
from amira_tpu.graph_cache import GraphBuildCache
from amira_tpu.vocab import GeneVocab

REF = "/root/reference/tests"


def _fixture(name):
    calls = json.load(open(f"{REF}/complex_gene_calls_{name}.json"))
    pos_path = f"{REF}/complex_gene_positions_{name}.json"
    if os.path.exists(pos_path):
        positions = json.load(open(pos_path))
        positions = {r: [tuple(p) for p in positions[r]] for r in positions}
    else:
        positions = {
            r: [(i * 100, i * 100 + 99) for i in range(len(g))]
            for r, g in calls.items()
        }
    rng = np.random.RandomState(7)
    seq = "".join(rng.choice(list("ACGT"), size=200_000))
    entry = {"sequence": seq, "quality": "I" * 10}
    fastq = {r: entry for r in calls}
    return calls, positions, fastq


def _bubble_workload(n_high=6, n_low=2):
    high = ["+a", "+b", "+c", "+m", "+d", "+e", "+f"]
    low = ["+a", "+b", "+c", "+x", "+d", "+e", "+f"]
    reads = {}
    for i in range(n_high):
        reads[f"h{i}"] = list(high)
    for i in range(n_low):
        reads[f"l{i}"] = list(low)
    positions = {
        r: [(j * 100, j * 100 + 99) for j in range(len(reads[r]))] for r in reads
    }
    rng = np.random.RandomState(0)
    seq = "".join(rng.choice(list("ACGT"), size=1600))
    fastq = {r: {"sequence": seq, "quality": "I" * len(seq)} for r in reads}
    return reads, positions, fastq


def _run_object(calls, positions, fastq, k, amr, mpc):
    g = GeneMerGraph(dict(calls), k, copy.deepcopy(positions))
    assert not g.is_lazy or g._materialize() is None  # force object path
    reads, pos, covs, _ = g.correct_low_coverage_paths(
        fastq, amr, 1, mpc, set(), True
    )
    return dict(reads), {r: list(p) for r, p in pos.items()}, covs


def _run_view(calls, positions, fastq, k, amr, mpc):
    g = GeneMerGraph(
        dict(calls), k, copy.deepcopy(positions),
        vocab=GeneVocab(), cache=GraphBuildCache(),
    )
    assert g.is_lazy
    reads, pos, covs, _ = g.correct_low_coverage_paths(
        fastq, amr, 1, mpc, set(), True
    )
    assert g.is_lazy, "bubble view must not materialize the object graph"
    return dict(reads), {r: list(p) for r, p in pos.items()}, covs


def test_view_matches_object_synthetic_bubble():
    calls, positions, fastq = _bubble_workload()
    got_o = _run_object(calls, positions, fastq, 3, set(), 5)
    got_v = _run_view(calls, positions, fastq, 3, set(), 5)
    assert got_o[0] == got_v[0]
    assert got_o[1] == got_v[1]
    assert got_o[2] == got_v[2]


def test_view_matches_object_amr_guard():
    calls, positions, fastq = _bubble_workload()
    got_o = _run_object(calls, positions, fastq, 3, {"x"}, 5)
    got_v = _run_view(calls, positions, fastq, 3, {"x"}, 5)
    assert got_o == got_v


@pytest.mark.parametrize("name", ["three", "five", "nine"])
@pytest.mark.parametrize("k", [3, 5])
def test_view_matches_object_real_fixture(name, k):
    calls, positions, fastq = _fixture(name)
    amr = {g[1:] for genes in calls.values() for g in genes if "bla" in g}
    got_o = _run_object(calls, positions, fastq, k, amr, 5)
    got_v = _run_view(calls, positions, fastq, k, amr, 5)
    assert got_o[0] == got_v[0], "corrected reads differ"
    assert got_o[1] == got_v[1], "corrected positions differ"
    assert got_o[2] == got_v[2], "path coverages differ"


def test_view_matches_object_chained_iterations():
    """Two chained bubble sweeps (output of sweep 1 feeds sweep 2)."""
    calls, positions, fastq = _fixture("three")
    reads_o, pos_o, fastq_o = dict(calls), copy.deepcopy(positions), fastq
    reads_v, pos_v = dict(calls), copy.deepcopy(positions)
    for _ in range(2):
        reads_o, pos_o, _c = _run_object(reads_o, pos_o, fastq, 3, set(), 5)
        reads_v, pos_v, _c2 = _run_view(reads_v, pos_v, fastq, 3, set(), 5)
        assert reads_o == reads_v
        assert pos_o == pos_v
