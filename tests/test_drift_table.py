"""The drift-table generator (scale_bench.cmd_drift) must reproduce
bench.py's vs_prev flag rule and the round protocol's band
adjudication mechanically — DRIFT_NOTES_r{N}.md embeds its output, so
a rule drift here would silently change what future rounds call
noise vs regression. Pure-python (no Spark session)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_bench import cmd_drift  # noqa: E402


def _hist_row(ts, queries, commit="abc1234", isolated=None, samples=None):
    row = {"ts": ts, "sf": "0.1", "total": sum(queries.values()),
           "queries": queries, "commit": commit, "dirty": False}
    if isolated:
        row["isolated"] = isolated
    if samples:
        row["isolated_samples"] = samples
    return row


def test_drift_verdicts(tmp_path, capsys):
    hist = tmp_path / "hist.jsonl"
    rows = [
        # three prior runs: stable arm a; arm b historically [1.0, 3.4];
        # arm c historically [1.0, 1.1]; arm e historically [2.0, 3.0]
        _hist_row(1.0, {"a": 5.0, "b": 1.0, "c": 1.0, "e": 2.0}),
        _hist_row(2.0, {"a": 5.1, "b": 3.4, "c": 1.1, "e": 3.0}),
        _hist_row(3.0, {"a": 5.0, "b": 1.2, "c": 1.05, "e": 2.0},
                  isolated={"a": 4.0}),
        # latest: a stable; b trips vs_prev (1.2 -> 3.0, >1.3x and
        # >0.3s) but sits inside its band -> FLAG + in-band;
        # c outside its band high (1.05 -> 2.0) -> NEW-HIGH;
        # e regresses 1.4x (2.0 -> 2.8, +0.8s) — BETWEEN the 1.3x
        # shared rule and the old hard-coded 1.5x: bench.py flags it,
        # so the drift table must too (r11 ADVICE medium);
        # isolated a has prior 4.0 -> 4.1 within +-10% -> in-band
        _hist_row(4.0, {"a": 5.05, "b": 3.0, "c": 2.0, "e": 2.8},
                  isolated={"a": 4.1, "d": 7.0},
                  samples={"a": [4.6, 4.1, 4.3]}),
    ]
    with open(hist, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    out = tmp_path / "drift.md"
    cmd_drift(str(out), hist_path=str(hist))
    text = out.read_text()
    lines = {l.split("|")[1].strip(): l for l in text.splitlines()
             if l.startswith("| ") and "|" in l[2:]}
    # stable arm never appears in the flagged table
    assert "a" not in {k for k in lines if len(k) == 1 and k == "a"} or \
        "FLAG" not in lines.get("a", "")
    assert "b" in lines and "FLAG" in lines["b"] and "in-band" in lines["b"]
    assert "c" in lines and "NEW-HIGH" in lines["c"]
    # the 1.3-1.5x case: must FLAG under the shared bench.trips_vs_prev
    # rule (the old hard-coded 1.5x silently dropped it)
    assert "e" in lines and "FLAG" in lines["e"] and "in-band" in lines["e"]
    # isolated table: prior band -> in-band; first reading -> baseline
    iso_lines = [l for l in text.splitlines() if l.startswith("| a |") or
                 l.startswith("| d |")]
    assert any("in-band" in l and "4.6" in l.replace("4.60", "4.6")
               for l in iso_lines if l.startswith("| a |"))
    assert any("baseline" in l for l in iso_lines if l.startswith("| d |"))


def test_era_reset_bands(tmp_path):
    """A code change resets an arm's band (r12 verdict next #5): with
    an era floor, pre-era readings stop adjudicating — a reading the
    full-history band would call in-band becomes NEW-HIGH against the
    in-era band, and an arm with no in-era priors gets an explicit
    era-reset baseline row instead of a stale verdict."""
    hist = tmp_path / "hist.jsonl"
    rows = [
        _hist_row(1.0, {"x": 1.0, "y": 1.0}),
        _hist_row(2.0, {"x": 3.0, "y": 1.0}),
        _hist_row(3.0, {"x": 1.0, "y": 1.0}),
        # latest: x 1.0 -> 2.8 trips vs_prev; y 1.0 -> 2.0 trips
        _hist_row(4.0, {"x": 2.8, "y": 2.0}),
    ]
    with open(hist, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    out = tmp_path / "drift.md"
    # control: over full history x's band is [1.0, 3.0] -> in-band
    cmd_drift(str(out), hist_path=str(hist), era_ts={})
    ctl = [l for l in out.read_text().splitlines() if l.startswith("| x |")]
    assert ctl and "in-band" in ctl[0] and " era" not in ctl[0]
    # era floor 2.5 cuts x's ts<2.5 readings -> in-era band [1.0, 1.0]
    # -> the same reading is now NEW-HIGH, and the band cell is marked
    # as era-cut; y has NO in-era priors -> era-reset baseline row
    cmd_drift(str(out), hist_path=str(hist), era_ts={"x": 2.5, "y": 3.5})
    text = out.read_text()
    xl = [l for l in text.splitlines() if l.startswith("| x |")]
    assert xl and "NEW-HIGH" in xl[0] and " era" in xl[0]
    yl = [l for l in text.splitlines() if l.startswith("| y |")]
    assert yl and "era-reset" in yl[0]


def test_drift_empty_and_single_row_history(tmp_path):
    hist = tmp_path / "hist.jsonl"
    hist.write_text(json.dumps(_hist_row(1.0, {"a": 1.0})) + "\n")
    out = tmp_path / "drift.md"
    cmd_drift(str(out), hist_path=str(hist))  # must not raise
    assert "Drift table" in out.read_text()
    hist.write_text("")
    cmd_drift(str(out), hist_path=str(hist))
    assert "0 rows" in out.read_text()
