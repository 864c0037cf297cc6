"""Unit tests for the bench instrument itself (bench.py) — the file
the judge reads, so its adjudication math is pinned like any operator:
floors from committed history, delta gating, and the compact-line
budget discipline. Pure-function tests, no Spark session."""

import json

import bench


def _write(path, payload, wrapped=False):
    doc = {"parsed": payload} if wrapped else payload
    path.write_text(json.dumps(doc))


def test_bench_floors_min_across_history(tmp_path):
    _write(tmp_path / "BENCH_r01.json",
           {"sf": 0.1, "queries": {"q1": 2.0, "q2": 5.0}}, wrapped=True)
    _write(tmp_path / "BENCH_r02.json",
           {"sf": 0.1, "queries": {"q1": 1.4, "q2": 7.0, "q3": -1.0}},
           wrapped=True)
    _write(tmp_path / "BENCH_FULL.json",
           {"sf": 0.1, "queries": {"q1": 3.0, "q3": 2.5}})
    # wrong sf is ignored entirely
    _write(tmp_path / "BENCH_r03.json",
           {"sf": 0.01, "queries": {"q1": 0.1}}, wrapped=True)
    floors = bench.bench_floors(0.1, str(tmp_path))
    assert floors == {"q1": 1.4, "q2": 5.0, "q3": 2.5}
    # negative (crashed) readings never become a floor
    assert "q3" in floors and floors["q3"] == 2.5


def test_bench_floors_tolerates_garbage(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text("{not json")
    _write(tmp_path / "BENCH_r02.json", {"sf": 0.1, "queries": {"q": 1.0}},
           wrapped=True)
    assert bench.bench_floors(0.1, str(tmp_path)) == {"q": 1.0}
    assert bench.bench_floors(0.1, str(tmp_path / "missing")) == {}


def test_bench_deltas_gates_both_relative_and_absolute(tmp_path):
    _write(tmp_path / "BENCH_r05.json",
           {"sf": 0.1, "queries": {"cheap": 0.2, "big": 10.0,
                                   "mid": 2.0}}, wrapped=True)
    times = {"cheap": 0.9,   # +0.7 s but tiny absolute base: 4.5x -> flagged
             "big": 10.8,    # +0.8 s but only 1.08x -> NOT flagged
             "mid": 3.6}     # +1.6 s and 1.8x -> flagged
    d = bench.bench_deltas(times, 0.1, str(tmp_path))
    assert d["prev_file"] == "BENCH_r05.json"
    assert set(d["regressed"]) == {"cheap", "mid"}


def test_adjudicate_retime_rules():
    """VERDICT r8 ask #4 pinned: the r8 multimodal_resize capture
    ({4.46, 14.75, 2.97, 1.42} vs floor 0.8) must adjudicate its MIN —
    the old median rule kept 2.97, a phantom. Non-converged spreads
    adjudicate min; converged above-floor sets take median_low (an
    observed reading even for even counts); a dead rerun takes min."""
    # the r8 phantom, verbatim: spread 10x never converged -> min
    # (1.42 sits just outside the 0.8-floor tolerance, so the
    # non-converged rule is the one that fires; either way the min
    # is the adjudicated value — 2.97 must never survive)
    adj, rule = bench.adjudicate_retime([4.46, 14.75, 2.97, 1.42], 0.8)
    assert (adj, rule) == (1.42, "min(non-converged)")
    # min at floor within tolerance -> noise, min wins
    adj, rule = bench.adjudicate_retime([3.0, 2.9, 1.0], 0.9)
    assert (adj, rule) == (1.0, "min(floor-reached)")
    # spread > 2x, min well above floor -> still min (not converged)
    adj, rule = bench.adjudicate_retime([9.0, 4.0, 8.5], 1.0)
    assert (adj, rule) == (4.0, "min(non-converged)")
    # converged, genuinely above floor -> median_low (observed)
    adj, rule = bench.adjudicate_retime([5.0, 4.6, 4.8], 1.0)
    assert (adj, rule) == (4.8, "median_low")
    # even count stays an observed reading
    adj, rule = bench.adjudicate_retime([5.0, 4.6, 4.8, 4.7], 1.0)
    assert (adj, rule) == (4.7, "median_low")
    # no floor on record, converged -> median_low
    adj, rule = bench.adjudicate_retime([5.0, 4.6, 4.8], None)
    assert (adj, rule) == (4.8, "median_low")
    # rerun died (2 readings), above floor, converged -> min
    adj, rule = bench.adjudicate_retime([5.0, 4.6], 1.0)
    assert (adj, rule) == (4.6, "min(rerun-died)")


def test_compact_line_respects_budget_and_reconciles():
    times = {f"q{i:03d}": 1.0 + i * 0.01 for i in range(300)}
    total = round(sum(times.values()), 3)
    line = bench.compact_line(times, total, [], 0.1, None,
                              budget=1900, n_floor_retimed=4)
    assert len(line) <= 1900
    doc = json.loads(line)
    assert doc["floor_retimed"] == 4
    shown = sum(doc["queries"].values())
    assert abs(shown + doc["omitted_sec"] - total) < 0.5
    assert doc["omitted"] == 300 - len(doc["queries"])
