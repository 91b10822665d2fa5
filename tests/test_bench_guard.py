"""Unit net for bench.py's persistence escalation (r15 verdict #5).

The quiet-window gate mutes per-query flags while the host drifts, and
three consecutive noisy driver rounds proved drift can be the norm — so
a REAL regression could stay muted forever. ``_persistent_flags``
escalates a name flagged in the current run AND in both of the two most
recent same-environment driver records (drift inflates different
queries run to run; code inflates the same one every time), unless an
adjudication entry (bench_adjudicated.json, backed by an isolated
quiet-window A/B in SCALE.md) explains the earlier records as weather.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench

ENV = {"pyspark": "4.1.2", "cpus": 32, "jvm": "17.0.20"}


def _write_record(d: Path, rnd: int, flags: list[str], env=ENV) -> None:
    (d / f"BENCH_r{rnd:02d}.json").write_text(
        json.dumps(
            {
                "parsed": {
                    **env,
                    "regressions": {},
                    "regressions_drift_suspect": {
                        n: {"baseline": 1.0, "now": 2.0} for n in flags
                    },
                }
            }
        )
    )


def _run(tmp_path, monkeypatch, flagged, adjudicated=None):
    monkeypatch.setattr(bench, "REPO", tmp_path)
    monkeypatch.setattr(
        bench, "ADJUDICATED_PATH", tmp_path / "bench_adjudicated.json"
    )
    if adjudicated is not None:
        (tmp_path / "bench_adjudicated.json").write_text(
            json.dumps(adjudicated)
        )
    return bench._persistent_flags(set(flagged), dict(ENV))


def test_three_same_env_flags_escalate(tmp_path, monkeypatch):
    _write_record(tmp_path, 14, ["q_slow", "q_weather"])
    _write_record(tmp_path, 15, ["q_slow", "q_other"])
    assert _run(tmp_path, monkeypatch, {"q_slow", "q_new"}) == ["q_slow"]


def test_fewer_than_two_records_never_escalates(tmp_path, monkeypatch):
    _write_record(tmp_path, 15, ["q_slow"])
    assert _run(tmp_path, monkeypatch, {"q_slow"}) == []


def test_env_change_resets_the_streak(tmp_path, monkeypatch):
    _write_record(tmp_path, 14, ["q_slow"])
    _write_record(
        tmp_path, 15, ["q_slow"], env={**ENV, "pyspark": "4.0.0"}
    )
    assert _run(tmp_path, monkeypatch, {"q_slow"}) == []


def test_adjudicated_refutation_excuses_covered_rounds(tmp_path, monkeypatch):
    _write_record(tmp_path, 14, ["q_slow"])
    _write_record(tmp_path, 15, ["q_slow"])
    # refuted at r15: both prior records are explained weather
    assert _run(tmp_path, monkeypatch, {"q_slow"}, {"q_slow": 15}) == []
    # refuted only at r14: the r15 record still counts, streak broken at 14
    assert _run(tmp_path, monkeypatch, {"q_slow"}, {"q_slow": 14}) == []
    # stale refutation (r13) does not excuse r14/r15 records
    assert _run(tmp_path, monkeypatch, {"q_slow"}, {"q_slow": 13}) == [
        "q_slow"
    ]
