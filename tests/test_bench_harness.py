"""Structure tests for bench.py's driver-survivable harness.

Round 3 lost its official perf record because bench.py printed the
required single JSON line only after ALL detail metrics finished and the
driver timeout fired first (BENCH_r03.json rc 124, empty tail). These
tests pin the round-4 contract: the north-star line is stdout's first
(and only JSON) line, detail metrics run under SBM_BENCH_BUDGET_S, and
BENCH_DETAIL.json is valid after every step with a `skipped` list.

No TPU / no JAX: metrics are stubbed in-process.
"""

import io
import json
import sys

import pytest

import bench


@pytest.fixture
def stub_bench(monkeypatch, tmp_path):
    """Replace the real metrics with instant stubs and cd to tmp."""
    def _boom():
        raise RuntimeError("boom")

    monkeypatch.setattr(bench, "_METRICS", {
        "e2e1000": lambda: 2.5,
        "e2e360": lambda: 2.0,
        "failing": _boom,
    })
    monkeypatch.setattr(bench, "_DETAIL_ORDER",
                        [("e2e360", 1), ("failing", 1)])
    monkeypatch.setattr(sys, "argv", ["bench.py", "--in-process"])
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _run_main(monkeypatch):
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    return out.getvalue()


def test_primary_line_is_first_and_only_stdout(stub_bench, monkeypatch):
    stdout = _run_main(monkeypatch)
    lines = stdout.strip().splitlines()
    assert len(lines) == 1, f"stdout must be exactly one line: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "match_1024x1024_1000templates_e2e_ms"
    assert rec["value"] == 2.5
    assert rec["unit"] == "ms"
    assert rec["vs_baseline"] == round(bench.BASELINE_1000_MS / 2.5, 2)


def test_detail_written_with_skipped_failures(stub_bench, monkeypatch):
    _run_main(monkeypatch)
    detail = json.loads((stub_bench / "BENCH_DETAIL.json").read_text())
    assert detail["match_1024x1024_1000templates_e2e_ms"] == 2.5
    assert detail["match_1024x1024_360templates_e2e_ms"] == 2.0
    assert detail["skipped"] == ["failing"]


def test_budget_zero_skips_all_detail_metrics(stub_bench, monkeypatch):
    monkeypatch.setenv("SBM_BENCH_BUDGET_S", "0")
    stdout = _run_main(monkeypatch)
    rec = json.loads(stdout.strip().splitlines()[0])
    assert rec["value"] == 2.5  # primary still runs and prints
    detail = json.loads((stub_bench / "BENCH_DETAIL.json").read_text())
    assert sorted(detail["skipped"]) == ["e2e360", "failing"]
    assert "match_1024x1024_360templates_e2e_ms" not in detail


def test_detail_order_covers_all_optional_metrics():
    names = {n for n, _ in bench._DETAIL_ORDER}
    assert names == set(bench._METRICS) - {"e2e1000"}
