"""Outage tolerance of the driver-facing bench entry point.

Round-3 VERDICT weak #1: BENCH_r03 was lost to one axon-tunnel outage
because bench.py had no retry and printed a raw traceback. The
supervisor must retry with backoff and, on persistent failure, emit a
structured JSON line the driver can parse.
"""

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


class _Proc:
    def __init__(self, rc, stdout="", stderr=""):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = stderr


def test_bench_module_is_light():
    """The supervisor must not touch the TPU backend itself: bench's
    module-level code has no jax import (jax loads inside the child)."""
    import ast

    tree = ast.parse(Path(bench.__file__).read_text())
    top_imports = [
        n for n in tree.body
        if isinstance(n, (ast.Import, ast.ImportFrom))
    ]
    names = []
    for n in top_imports:
        if isinstance(n, ast.Import):
            names += [a.name for a in n.names]
        else:
            names.append(n.module or "")
    assert not any(n.split(".")[0] in ("jax", "jaxlib") for n in names)


def test_supervisor_passes_through_success(monkeypatch, capsys):
    good = json.dumps({
        "metric": "sampled_patients_per_sec_1000step_ddpm",
        "value": 13088.0, "unit": "patients/sec", "vs_baseline": 3270.0,
    })

    def fake_run(*a, **kw):
        return _Proc(0, stdout=f"warmup noise\n{good}\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._run_supervised() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [good]


def test_supervisor_retries_then_succeeds(monkeypatch, capsys):
    calls = {"n": 0}
    good = json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                       "vs_baseline": 1.0})

    def fake_run(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise subprocess.TimeoutExpired(cmd="bench", timeout=1)
        return _Proc(0, stdout=good + "\n")

    sleeps = []
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    assert bench._run_supervised() == 0
    assert calls["n"] == 2
    assert sleeps == list(bench._BACKOFFS)
    assert capsys.readouterr().out.strip().splitlines()[-1] == good


def test_schedule_fits_driver_budget():
    """Round-4 lesson: the driver kills bench.py at ~1200 s, so the
    worst-case supervisor wall-clock (every attempt timing out, all
    backoffs slept) must leave headroom for the structured error line
    to reach the driver. Attempt 1 must still cover the measured
    healthy worst case (537 s init + compile + measurement)."""
    worst = sum(bench._ATTEMPT_TIMEOUTS) + sum(bench._BACKOFFS)
    assert worst <= 1100
    assert bench._ATTEMPT_TIMEOUTS[0] >= 620


def test_result_line_requires_metric_key():
    """Round-4 ADVICE: a stray single-line dict-like log after the
    metric line must not be published as the round's number."""
    good = json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                       "vs_baseline": 1.0})
    stdout = "\n".join([
        "warmup noise",
        good,
        "{'level': 'WARN', 'msg': 'not json'}",       # not valid JSON
        '{"cache_hits": 3}',                           # JSON, no metric
    ])
    assert bench._result_line(stdout) == good
    assert bench._result_line("no json here\n") is None


def test_supervisor_structured_error_on_persistent_outage(
    monkeypatch, capsys
):
    def fake_run(*a, **kw):
        return _Proc(1, stderr="RuntimeError: Unable to initialize "
                               "backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._run_supervised() == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["value"] is None
    assert parsed["metric"] == "sampled_patients_per_sec_1000step_ddpm"
    assert "UNAVAILABLE" in parsed["error"]
