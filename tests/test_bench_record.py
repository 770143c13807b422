"""The driver records only a bounded stdout tail; round 7's final bench
line (57 queries + spread map) outgrew it and the official record came
back `parsed: null` (VERDICT r7 item 1). These tests pin the contract:
bench.py's final stdout line stays parseable and under MAX_STDOUT_LINE
no matter how many queries the suite grows to — overflow detail moves
to the sidecar record instead.
"""

import json

import bench


def _fake_run(n):
    timings = {f"quite_long_query_name_number_{i:03d}": round(0.123 + i, 3) for i in range(n)}
    spreads = {k: 1.27 for k in timings}
    total = sum(timings.values())
    return timings, spreads, total


def test_current_suite_line_fits():
    """The real bench_queries list, with worst-case 8-char timings,
    must produce a stdout line under the cap WITH the queries map
    (so the driver keeps per-query visibility while it fits)."""
    timings = {name: 9999.999 for name in bench.bench_queries()}
    spreads = {name: 99.99 for name in timings}
    line, sidecar = bench.format_bench_record(timings, spreads, 0.1, 12345.678)
    assert len(line) <= bench.MAX_STDOUT_LINE, len(line)
    rec = json.loads(line)
    assert rec["metric"] == "headline_suite_total"
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.1
    assert rec["queries"] == timings  # still inline at today's suite size
    assert sidecar["spread"] == spreads


def test_overflow_moves_queries_to_sidecar():
    timings, spreads, total = _fake_run(200)  # far past any inline fit
    line, sidecar = bench.format_bench_record(timings, spreads, 1.0, total)
    assert len(line) <= bench.MAX_STDOUT_LINE, len(line)
    rec = json.loads(line)
    assert rec["value"] == round(total, 3)
    assert rec["queries_in_sidecar"] == 200
    assert "queries" not in rec
    assert sidecar["queries"] == timings and sidecar["spread"] == spreads


def test_line_is_single_line_json():
    timings, spreads, total = _fake_run(5)
    line, _ = bench.format_bench_record(timings, spreads, 0.01, total)
    assert "\n" not in line
    assert json.loads(line)["sf"] == 0.01
