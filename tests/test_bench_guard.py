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


def test_evidence_format_adjudication_is_honored(tmp_path, monkeypatch):
    """The r17 format {name: {round, evidence}} refutes exactly like the
    legacy bare-int format; malformed entries count as never-refuted."""
    _write_record(tmp_path, 14, ["q_slow"])
    _write_record(tmp_path, 15, ["q_slow"])
    entry = {"round": 15, "evidence": "SCALE.md: some A/B section"}
    assert _run(tmp_path, monkeypatch, {"q_slow"}, {"q_slow": entry}) == []
    stale = {"round": 13, "evidence": "SCALE.md: some A/B section"}
    assert _run(tmp_path, monkeypatch, {"q_slow"}, {"q_slow": stale}) == [
        "q_slow"
    ]
    # malformed (no round key / non-numeric) never refutes
    assert _run(
        tmp_path, monkeypatch, {"q_slow"}, {"q_slow": {"evidence": "x"}}
    ) == ["q_slow"]
    assert _run(
        tmp_path, monkeypatch, {"q_slow"}, {"q_slow": {"round": "soon"}}
    ) == ["q_slow"]


def test_env_unknown_record_breaks_the_streak(tmp_path, monkeypatch):
    """A recorded round missing any fingerprint key (pre-fingerprint
    round or parsed:null recovery) is env-UNKNOWN, not same-env: it must
    not let a streak escalate across an unverified env change (r16
    advice — `if k in parsed` silently treated missing keys as equal)."""
    env_missing_jvm = {k: v for k, v in ENV.items() if k != "jvm"}
    _write_record(tmp_path, 14, ["q_slow"], env=env_missing_jvm)
    _write_record(tmp_path, 15, ["q_slow"])
    assert _run(tmp_path, monkeypatch, {"q_slow"}) == []


def test_committed_adjudications_carry_scale_md_evidence():
    """Every entry in the repo's bench_adjudicated.json must point at a
    SCALE.md anchor that actually exists — a blanket name list with no
    verifiable evidence could quietly mute the persistence escalation
    (r16 advice). Legacy bare-int entries are no longer allowed in the
    committed file."""
    repo = Path(bench.__file__).resolve().parent
    adjudicated = json.loads((repo / "bench_adjudicated.json").read_text())
    scale = (repo / "SCALE.md").read_text()
    assert adjudicated, "committed adjudication file unexpectedly empty"
    for name, entry in adjudicated.items():
        assert isinstance(entry, dict), f"{name}: legacy bare-int entry"
        assert bench._adjudicated_round(entry) >= 0, f"{name}: bad round"
        evidence = entry.get("evidence", "")
        anchor = evidence.split("SCALE.md:", 1)[-1].strip()
        assert anchor and anchor in scale, (
            f"{name}: evidence anchor not found in SCALE.md: {evidence!r}"
        )


def test_nonquiet_detail_never_mutates_the_ratchet(tmp_path, monkeypatch):
    """The structural fix for the r14-r16 restore ritual: a non-quiet
    run's detail record lands in BENCH_LAST_RUN.json and the ratchet
    file (BENCH_DETAIL.json) is untouched; a quiet run refreshes the
    ratchet."""
    detail_path = tmp_path / "BENCH_DETAIL.json"
    last_run_path = tmp_path / "BENCH_LAST_RUN.json"
    monkeypatch.setattr(bench, "DETAIL_PATH", detail_path)
    monkeypatch.setattr(bench, "LAST_RUN_PATH", last_run_path)
    pin = {"quiet": True, "value": 240.0}
    detail_path.write_text(json.dumps(pin))

    noisy = {"quiet": False, "value": 306.0}
    assert bench._persist_detail(noisy) == last_run_path
    assert json.loads(detail_path.read_text()) == pin  # ratchet untouched
    assert json.loads(last_run_path.read_text())["value"] == 306.0

    quiet = {"quiet": True, "value": 238.0}
    assert bench._persist_detail(quiet) == detail_path
    assert json.loads(detail_path.read_text())["value"] == 238.0


def test_quiet_run_on_other_env_never_mutates_the_ratchet(tmp_path, monkeypatch):
    """r17 verdict #2: the driver's quiet 8-core scaling run overwrote
    the 32-core pin (the old stamp recorded os.cpu_count(), so the
    fingerprints LOOKED identical). A quiet run whose cpus/pyspark/jvm
    fingerprint differs from the committed pin's must route to
    BENCH_LAST_RUN.json; a same-env quiet run still refreshes the pin."""
    detail_path = tmp_path / "BENCH_DETAIL.json"
    last_run_path = tmp_path / "BENCH_LAST_RUN.json"
    monkeypatch.setattr(bench, "DETAIL_PATH", detail_path)
    monkeypatch.setattr(bench, "LAST_RUN_PATH", last_run_path)
    pin = {"quiet": True, "value": 254.0, **ENV}
    detail_path.write_text(json.dumps(pin))

    eight_core = {"quiet": True, "value": 218.0, **{**ENV, "cpus": 8}}
    assert bench._persist_detail(eight_core) == last_run_path
    assert json.loads(detail_path.read_text()) == pin  # pin untouched
    assert json.loads(last_run_path.read_text())["value"] == 218.0

    same_env = {"quiet": True, "value": 250.0, **ENV}
    assert bench._persist_detail(same_env) == detail_path
    assert json.loads(detail_path.read_text())["value"] == 250.0


def test_unfingerprinted_pin_is_refreshable(tmp_path, monkeypatch):
    """A pin missing any fingerprint key (pre-fingerprint record, or a
    hand-restored stub) cannot veto a quiet refresh — same conservative
    env-UNKNOWN posture as _env_match_prev, pointed the other way: with
    no recorded env to compare, the quiet verdict alone governs."""
    detail_path = tmp_path / "BENCH_DETAIL.json"
    monkeypatch.setattr(bench, "DETAIL_PATH", detail_path)
    monkeypatch.setattr(bench, "LAST_RUN_PATH", tmp_path / "BENCH_LAST_RUN.json")
    detail_path.write_text(json.dumps({"quiet": True, "value": 254.0}))
    quiet = {"quiet": True, "value": 238.0, **ENV}
    assert bench._persist_detail(quiet) == detail_path
    assert json.loads(detail_path.read_text())["value"] == 238.0
