"""Bench stdout-line contract (VERDICT r8 #2): round 8's official bench
artifact recorded ``parsed: null`` because the final stdout line — per-
entry {med,lo,hi} dicts — outgrew the driver's bounded stdout tail
(~2000 chars). These tests pin the fix: the line is single-line JSON,
med-only floats, under a conservative size cap, shrinking gracefully as
the suite grows, with the full dispersion routed to a committed file.

No SparkSession needed — the formatter is pure."""

from __future__ import annotations

import json

import bench


def _result(n_entries: int, name_len: int = 24, errors: int = 0) -> dict:
    qs = {
        f"q_{'x' * name_len}_{i:03d}": {"med": 1.234, "lo": 1.1, "hi": 9.876}
        for i in range(n_entries)
    }
    r = {
        "metric": "gecko_spark bench: gen+mutate @1M rows + headline queries",
        "value": round(1.234 * n_entries, 3),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
        "headline25_total": 20.404,
        "headline25_n": 25,
        "env": {
            "cpus": 32,
            "platform": "Linux-6.18.5-fc-v20-x86_64-with-glibc2.39",
            "loadavg_start": 4.43,
            "mem_available_gb": 101.3,
            "cpu_busy_pct": 12.5,
            "cpu_steal_pct": 0.0,
        },
    }
    if errors:
        r["errors"] = {
            f"q_fail_{i}": "AnalysisException: " + "x" * 180 for i in range(errors)
        }
        r["partial"] = True
    return r


def test_line_parses_and_fits_at_current_suite_size():
    # 58 entries × ~17-char names ≈ the round-9 suite (52 real entries
    # measured 1679 chars) — must fit WITHOUT dropping any entry
    line = bench.compact_stdout_line(_result(58, name_len=11))
    assert "\n" not in line
    assert len(line) <= bench.STDOUT_LINE_CAP
    parsed = json.loads(line)
    assert "queries_dropped" not in parsed
    assert len(parsed["queries"]) == 58
    # driver spec shape: queries maps name -> seconds (float, not dict)
    assert all(isinstance(v, float) for v in parsed["queries"].values())
    assert parsed["unit"] == "sec" and isinstance(parsed["value"], float)
    assert parsed["dispersion_file"] == bench.DISPERSION_FILE


def test_oversized_suite_drops_to_headline_but_still_parses():
    line = bench.compact_stdout_line(_result(400, name_len=40))
    assert len(line) <= bench.STDOUT_LINE_CAP
    parsed = json.loads(line)
    assert parsed["queries_dropped"] == 400  # synthetic names ∉ HEADLINE_25
    assert parsed["value"] > 0  # totals survive the drop


def test_errors_are_summarized_not_dumped():
    line = bench.compact_stdout_line(_result(40, errors=30))
    assert len(line) <= bench.STDOUT_LINE_CAP
    parsed = json.loads(line)
    assert parsed["errors_n"] == 30 and len(parsed["errors"]) == 5
    assert parsed["partial"] is True


def test_plain_float_entries_pass_through():
    r = _result(10)
    r["queries"] = {k: v["med"] for k, v in r["queries"].items()}
    parsed = json.loads(bench.compact_stdout_line(r))
    assert all(isinstance(v, float) for v in parsed["queries"].values())


def test_detect_regressions_band_vs_band():
    """VERDICT r10 #8: an entry regresses iff its new dispersion band
    sits ENTIRELY above the prior band (lo > prior hi) — overlap is
    drift, disjoint is a shift; med-only priors and error-string
    entries are skipped, not crashed on."""
    prior = {
        "q_disjoint": {"med": 0.50, "lo": 0.45, "hi": 0.58},
        "q_overlap": {"med": 0.50, "lo": 0.45, "hi": 0.58},
        "q_faster": {"med": 0.50, "lo": 0.45, "hi": 0.58},
        "q_medonly": 0.50,
    }
    new = {
        "q_disjoint": {"med": 1.10, "lo": 0.99, "hi": 1.30},  # lo > 0.58
        "q_overlap": {"med": 0.60, "lo": 0.55, "hi": 0.80},   # 0.55 <= 0.58
        "q_faster": {"med": 0.30, "lo": 0.28, "hi": 0.35},
        "q_medonly": {"med": 9.9, "lo": 9.8, "hi": 9.95},     # prior med-only
        "q_new_entry": {"med": 1.0, "lo": 0.9, "hi": 1.1},    # no prior
    }
    reg = bench.detect_regressions(new, prior)
    assert set(reg) == {"q_disjoint"}
    assert reg["q_disjoint"] == {"lo": 0.99, "prior_hi": 0.58, "ratio": 2.2}
    assert bench.detect_regressions(new, {}) == {}


def test_regressions_summarized_on_line():
    r = _result(40)
    r["regressions"] = {
        f"q_reg_{i}": {"lo": 2.0, "prior_hi": 1.0, "ratio": 2.0} for i in range(9)
    }
    line = bench.compact_stdout_line(r)
    assert len(line) <= bench.STDOUT_LINE_CAP
    parsed = json.loads(line)
    assert parsed["regressions_n"] == 9 and len(parsed["regressions"]) == 5
    assert all(isinstance(x, str) for x in parsed["regressions"])


def _session(meds: dict, wall=600.0, partial=False) -> dict:
    qs = {
        q: {"med": m, "lo": round(m * 0.9, 3), "hi": round(m * 1.2, 3)}
        for q, m in meds.items()
    }
    r = {
        "metric": "gecko_spark bench: gen+mutate @1M rows + headline queries",
        "value": round(sum(meds.values()), 3),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
        "headline25_total": round(sum(meds.values()), 3),
        "headline25_n": len(meds),
        "env": {"cpus": 32},
        "wall_s": wall,
    }
    if partial:
        r["errors"] = {"q_dead": "Boom"}
        r["partial"] = True
    return r


def test_combine_sessions_cross_session_medians_and_bands():
    """Round 14: per entry med = median of session meds, band =
    [min session-lo, max session-hi], n_runs summed, session_meds
    recorded; totals recomputed from combined meds."""
    s1 = _session({"a": 1.0, "b": 4.0})
    s2 = _session({"a": 3.0, "b": 2.0})
    s3 = _session({"a": 2.0, "b": 6.0})
    c = bench._combine_sessions([s1, s2, s3])
    assert c["sessions_n"] == 3 and "3 fresh-JVM" in c["protocol"]
    a = c["queries"]["a"]
    assert a["med"] == 2.0 and a["session_meds"] == [1.0, 3.0, 2.0]
    assert a["lo"] == 0.9 and a["hi"] == 3.6 and a["n_sessions"] == 3
    assert c["value"] == round(2.0 + 4.0, 3)
    # per-session summaries ride along for the artifact
    assert [s["wall_s"] for s in c["sessions"]] == [600.0, 600.0, 600.0]


def test_combine_sessions_entry_missing_from_one_session():
    """An entry that errored in one session still aggregates over the
    sessions that have it; an entry failing EVERYWHERE lands in errors
    and flags the combined result partial."""
    s1 = _session({"a": 1.0, "b": 2.0})
    s2 = _session({"a": 3.0}, partial=True)
    s2["errors"] = {"b": "AnalysisException: boom"}
    c = bench._combine_sessions([s1, s2])
    assert c["queries"]["b"]["n_sessions"] == 1
    assert c["queries"]["a"]["n_sessions"] == 2
    assert "errors" not in c or "b" not in c.get("errors", {})
    s3 = _session({"a": 1.0}, partial=True)
    s3["errors"] = {"zz": "Kaboom"}
    c2 = bench._combine_sessions([s3])
    assert c2["errors"] == {"zz": "Kaboom"} and c2["partial"] is True


def test_stdout_line_drops_session_detail_keeps_count():
    """The driver line must stay bounded: the per-session list (env
    fingerprints, walls) is artifact-only; sessions_n survives."""
    c = bench._combine_sessions([_session({"a": 1.0}), _session({"a": 2.0})])
    line = bench.compact_stdout_line(c)
    doc = json.loads(line)
    assert doc["sessions_n"] == 2
    assert "sessions" not in doc
    assert doc["queries"]["a"] == 1.0 or doc["queries"]["a"] == 1.5


def test_load_prior_rejects_single_session_bands_for_cross_session(tmp_path, monkeypatch):
    """Round 14: a cross-session run must not band-compare against a
    single-session artifact (protocol transition produced 13 spurious
    flags) — but a same-protocol prior is accepted."""
    import os

    disp = tmp_path / bench.DISPERSION_FILE
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path)
    )
    single = {"sf": 0.1, "queries": {"a": {"med": 1, "lo": 1, "hi": 1}}}
    disp.write_text(json.dumps(single))
    assert bench._load_prior(0.1, cross_session=True) == {}
    assert bench._load_prior(0.1) == single["queries"]
    multi = dict(single, sessions_n=3)
    disp.write_text(json.dumps(multi))
    assert bench._load_prior(0.1, cross_session=True) == multi["queries"]
    # sf mismatch always rejects
    assert bench._load_prior(0.01, cross_session=True) == {}
