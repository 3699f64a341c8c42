"""Driver-contract test for bench.py: every emitted line must be a single
JSON object with exactly the keys the round driver records
(metric/value/unit/vs_baseline), and the frontier registry must expose
callables so a misnamed entry fails here instead of silently skipping on
the real chip (bench.py guards frontier failures with a broad except)."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emit_schema(capsys):
    bench = _load_bench()
    bench._emit("unit-test metric", 123.456, 10.0)
    line = capsys.readouterr().out.strip()
    row = json.loads(line)
    assert set(row) == {"metric", "value", "unit", "vs_baseline"}
    assert row["value"] == 123.5
    assert row["unit"] == "particle-steps/sec"
    assert row["vs_baseline"] == 12.35


def test_frontier_entries_are_callables():
    bench = _load_bench()
    entries = bench._frontier()
    names = [n for n, _ in entries]
    # the four frontier lines the round notes promise, in order
    assert names == ["bh_200k", "bh3_1m", "gnn_100k", "contconv_100k"]
    assert all(callable(fn) for _, fn in entries)


def test_primary_baseline_derivation():
    bench = _load_bench()
    # 500 bodies / 2.9 ms/step, O(N^2)-scaled to 10k (BASELINE.md)
    assert abs(bench.BASELINE_PSTEPS - 500 / 2.9e-3 / 20) < 1e-6
