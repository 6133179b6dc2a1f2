"""Phase-timing subsystem."""

import json
import os

from amira_tpu.tracing import PhaseTimer


def test_phase_timer_records_and_writes(tmp_path):
    t = PhaseTimer()
    with t.phase("stage_a", items=100, unit="reads"):
        pass
    with t.phase("stage_b"):
        pass
    t.finish(str(tmp_path), quiet=True)
    assert [p["phase"] for p in t.phases] == ["stage_a", "stage_b"]
    assert "items_per_sec" in t.phases[0]
    data = json.load(open(tmp_path / "phase_timings.json"))
    assert len(data) == 2


def test_pipeline_writes_phase_timings(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import make_isolate
    from test_pipeline import _run_cli

    files = make_isolate(str(tmp_path / "data"), seed=77, n_reads=40)
    _run_cli(files, str(tmp_path / "out"))
    timings = json.load(open(tmp_path / "out" / "phase_timings.json"))
    names = [p["phase"] for p in timings]
    assert "initial_graph_build" in names
    assert "allele_polishing" in names
