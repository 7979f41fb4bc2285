"""Unit tests for bench.py's measurement-hygiene helpers (no Spark): the
rolling-best canary lookup (host-scoped, torn-line tolerant) and the
numeric quiet-record sort (r8 review finding: lexicographic ordering
would misplace quiet_r100 before quiet_r99)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_rolling_best_is_host_scoped_and_torn_line_tolerant(
    tmp_path, monkeypatch
):
    hist = tmp_path / "hist.jsonl"
    me = bench._host_id()
    lines = [
        json.dumps({"host": me, "f32": 40.0, "phase": "pre"}),
        json.dumps({"host": "other-box|cpus=8", "f32": 99.0}),
        '{"torn": ',  # a run killed mid-append
        json.dumps({"host": me, "f32": 52.2, "phase": "post"}),
    ]
    hist.write_text("\n".join(lines) + "\n")
    monkeypatch.setattr(bench, "CANARY_HISTORY", str(hist))
    assert bench._rolling_best() == 52.2
    # no history file -> 0.0 (bootstrap floor takes over in _canary_suspect)
    monkeypatch.setattr(bench, "CANARY_HISTORY", str(tmp_path / "absent"))
    assert bench._rolling_best() == 0.0


def test_canary_suspect_appends_measurement_ts(tmp_path, monkeypatch):
    hist = tmp_path / "hist2.jsonl"
    monkeypatch.setattr(bench, "CANARY_HISTORY", str(hist))
    bench._canary_suspect(50.0, phase="pre", ts=123.456)
    bench._canary_suspect(49.0, phase="post")
    recs = [json.loads(l) for l in hist.read_text().splitlines()]
    assert recs[0]["phase"] == "pre" and recs[0]["ts"] == 123.456
    assert recs[1]["phase"] == "post" and recs[1]["ts"] != 123.456


def test_latest_quiet_record_sorts_numerically(tmp_path):
    bdir = tmp_path / "BENCH"
    bdir.mkdir()
    for n in (7, 99, 100):
        (bdir / f"quiet_r{n:02d}.json").write_text("{}")
    got = bench._latest_quiet_record(here=str(tmp_path))
    assert got.endswith("quiet_r100.json"), got
