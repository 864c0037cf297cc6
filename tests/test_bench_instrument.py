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
