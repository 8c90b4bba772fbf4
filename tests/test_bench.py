"""The bench orchestrator's deadline machinery, pinned.

Round 3's driver bench recorded NOTHING (`BENCH_r03.json`: rc=124,
parsed=null) because one slow stage starved the single end-of-process JSON
line. bench.py is now a parent orchestrator around a row-streaming child;
these tests pin its three survival guarantees on synthetic stages
(`_FAC_BENCH_FAKE_STAGES` — no TPU, no jax import, subprocess-real):

  1. an external SIGTERM (the driver's `timeout`) flushes every finished
     row as a valid partial JSON line before dying;
  2. a stage whose estimate exceeds the remaining budget is skipped and
     *recorded* as skipped — later stages still run;
  3. a stage that raises is recorded and never loses later stages.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _launch(stages: str, budget: float, touch: str = ""):
    env = dict(os.environ)
    env["_FAC_BENCH_FAKE_STAGES"] = stages
    env["FAC_BENCH_BUDGET_S"] = str(budget)
    if touch:
        env["_FAC_BENCH_FAKE_TOUCH"] = touch
    return subprocess.Popen([sys.executable, BENCH], stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True, env=env)


def _final_json(stdout: str) -> dict:
    lines = [l for l in stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in output: {stdout!r}"
    return json.loads(lines[-1])


def test_sigterm_flushes_partial_json(tmp_path):
    """The driver-timeout scenario: first stage done, second wedged, SIGTERM
    arrives → the finished row must already be a valid JSON line."""
    sentinel = str(tmp_path / "ok.done")
    proc = _launch("ok:1,hang:1", budget=600, touch=sentinel)
    try:
        deadline = time.time() + 30
        while not os.path.exists(sentinel):
            assert time.time() < deadline, "fake ok stage never ran"
            assert proc.poll() is None, "bench exited prematurely"
            time.sleep(0.1)
        # no settling sleep on purpose: the SIGTERM handler itself must
        # drain rows the reader thread hasn't consumed yet (bounded join
        # after the kill EOFs the pipe) — signal immediately to pin that
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=15)
    finally:
        if proc.poll() is None:
            proc.kill()
    parsed = _final_json(out)
    assert parsed["value"] == 1234.5
    assert parsed["secondary"]["interrupted"] == "SIGTERM"
    assert parsed["unit"] == "crops/s"


def test_budget_skips_oversized_stage_but_still_reports():
    """A stage that can't fit the remaining budget is skipped *on the
    record*; the line still prints (partial beats null)."""
    proc = _launch("ok:1,hang:9999", budget=20)
    out, _ = proc.communicate(timeout=30)
    parsed = _final_json(out)
    assert parsed["value"] == 1234.5
    assert parsed["secondary"]["skipped_hang"] == "budget"
    assert proc.returncode == 0


def test_stage_error_is_recorded_and_later_stages_run():
    proc = _launch("err:1,ok:1", budget=60)
    out, _ = proc.communicate(timeout=30)
    parsed = _final_json(out)
    assert "boom" in parsed["secondary"]["error_err"]
    assert parsed["value"] == 1234.5  # the later stage still ran


def test_internal_cap_kills_wedged_child_and_flushes():
    """Even without an external signal, a wedged child is killed at the
    parent's own deadline and the partial rows flush ("cap")."""
    proc = _launch("ok:1,hang:1", budget=12)  # child gets ~4 s, hang ignores
    out, _ = proc.communicate(timeout=40)
    parsed = _final_json(out)
    assert parsed["value"] == 1234.5
    assert parsed["secondary"]["interrupted"] == "cap"


def test_vs_baseline_math():
    proc = _launch("ok:1", budget=60)
    out, _ = proc.communicate(timeout=30)
    parsed = _final_json(out)
    assert parsed["vs_baseline"] == pytest.approx(1234.5 / 2000.0, abs=1e-3)
    assert parsed["metric"].startswith("face-crops/sec/chip")
