"""bench.py protocol unit tests (no JVM): the isolated spot pass is
diagnostic — a hung or failed spot subprocess must degrade to a missing
row, never sink the bench run (r6 advice)."""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_spot_isolated_timeout_returns_none(monkeypatch, capsys):
    def fake_run(*args, **kwargs):
        raise subprocess.TimeoutExpired(cmd=args[0], timeout=kwargs["timeout"])

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._spot_isolated("q1_pricing_summary", "/x", 42.0) is None
    assert "timed out" in capsys.readouterr().err


def test_spot_isolated_failure_returns_none(monkeypatch, capsys):
    class P:
        returncode = 1
        stdout = ""
        stderr = "boom"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: P())
    assert bench._spot_isolated("q1_pricing_summary", "/x") is None
    assert "failed" in capsys.readouterr().err


def test_spot_isolated_parses_result_line(monkeypatch):
    class P:
        returncode = 0
        stdout = "noise\nRESULT 1.234\n"
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: P())
    assert bench._spot_isolated("q1_pricing_summary", "/x") == 1.234


def test_spot_isolated_timeout_floor(monkeypatch):
    """A nearly-exhausted budget still grants the 30s floor — killing a
    JVM that is about to print its result wastes the whole run."""
    seen = {}

    def fake_run(*args, **kwargs):
        seen["timeout"] = kwargs["timeout"]
        raise subprocess.TimeoutExpired(cmd=args[0], timeout=kwargs["timeout"])

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._spot_isolated("q", "/x", timeout_sec=3.0)
    assert seen["timeout"] == 30.0


def test_draw_spot_clean_draw_stops_at_one():
    """Idle machine (load1 under the gate): one draw, no re-draws."""
    import time as _time

    calls = []

    def runner(name, sf_dir, timeout_sec):
        calls.append(timeout_sec)
        return 1.5

    draws, loads = bench._draw_spot(
        "q", "/x", _time.monotonic() + 100, load_gate=4.0,
        runner=runner, load_fn=lambda: 0.7)
    assert draws == [1.5] and loads == [0.7] and len(calls) == 1


def test_draw_spot_redraws_under_load_and_keeps_all_draws():
    """load1 over the gate at draw time: re-draw up to 3 total, every
    draw and its load1 recorded (the judge's adjudication data)."""
    import time as _time

    results = iter([4.7, 3.9, 3.6])
    loadseq = iter([9.4, 7.1, 6.0])
    draws, loads = bench._draw_spot(
        "q", "/x", _time.monotonic() + 100, load_gate=4.0,
        runner=lambda *a, **k: next(results), load_fn=lambda: next(loadseq))
    assert draws == [4.7, 3.9, 3.6]
    assert loads == [9.4, 7.1, 6.0]
    assert min(draws) == 3.6  # the recorded row


def test_draw_spot_load_drop_stops_redrawing():
    """A re-draw taken after the competing work finished (load back under
    the gate) ends the loop — no third draw burned for nothing."""
    import time as _time

    results = iter([4.7, 1.2])
    loadseq = iter([9.4, 0.9])
    draws, loads = bench._draw_spot(
        "q", "/x", _time.monotonic() + 100, load_gate=4.0,
        runner=lambda *a, **k: next(results), load_fn=lambda: next(loadseq))
    assert draws == [4.7, 1.2] and loads == [9.4, 0.9]


def test_draw_spot_budget_exhaustion_mid_redraw(capsys):
    """Budget running out between re-draws truncates the draw list but
    keeps what was measured."""
    import time as _time

    deadline = _time.monotonic() + 0.05

    def runner(name, sf_dir, timeout_sec):
        _time.sleep(0.1)  # burns past the deadline
        return 2.0

    draws, loads = bench._draw_spot(
        "q", "/x", deadline, load_gate=4.0,
        runner=runner, load_fn=lambda: 99.0)
    assert draws == [2.0]  # second iteration hit the deadline
    assert "budget exhausted" in capsys.readouterr().err


def test_draw_spot_failed_run_ends_loop():
    """A failed/timed-out draw (None) ends the loop without poisoning
    the recorded draws."""
    import time as _time

    results = iter([4.7, None])
    draws, loads = bench._draw_spot(
        "q", "/x", _time.monotonic() + 100, load_gate=4.0,
        runner=lambda *a, **k: next(results), load_fn=lambda: 9.0)
    assert draws == [4.7] and loads == [9.0]


def test_tree_cpu_seconds_monotone_and_covers_children():
    """The contention-stable bench series: /proc-walked CPU seconds for
    this process tree must be positive, monotone, and actually charge a
    child's burned CPU to the tree (r10 verdict item 3)."""
    c0 = bench._tree_cpu_seconds()
    assert c0 > 0.0
    # burn ~0.2s of CPU in a CHILD process
    subprocess.run([sys.executable, "-c",
                    "t=0\nfor i in range(4_000_000): t += i*i"],
                   check=True)
    c1 = bench._tree_cpu_seconds()
    assert c1 >= c0
    assert c1 - c0 > 0.05  # the child's CPU is visible in the delta


def test_idle_gate_records_telemetry(monkeypatch):
    """The idle-gate ships its adjudication data: released_idle flags
    whether the gate saw a quiet machine or timed out, and the wait is
    bounded by SPARK_GRAFT_IDLE_WAIT (0 disables)."""
    monkeypatch.setenv("SPARK_GRAFT_IDLE_WAIT", "0")
    monkeypatch.setenv("SPARK_GRAFT_IDLE_GATE", "2.0")
    g = bench._idle_gate()
    assert set(g) == {"threshold", "waited_sec", "load1_at_release",
                      "released_idle"}
    assert g["waited_sec"] < 1.0          # budget 0: no waiting
    assert g["threshold"] == 2.0
    # an impossible threshold with no budget reports released_idle=False
    monkeypatch.setenv("SPARK_GRAFT_IDLE_GATE", "0.0")
    assert bench._idle_gate()["released_idle"] is False


def test_composed_multijvm_spill_profile_wiring():
    """local_cluster_spill (r10 verdict item 2) must stay a REAL
    composition: the exact spill thresholds of spill_pressure (shared
    dict — no drift), a local-cluster master (real executor JVMs), and
    the spill vacuous-guard enabled for it."""
    import tools.hostile_conf_sim as hcs

    master, confs, _env = hcs.PROFILES["local_cluster_spill"]
    assert master.startswith("local-cluster[")
    spill_master, spill_confs, _ = hcs.PROFILES["spill_pressure"]
    threshold_keys = [k for k in spill_confs
                      if "threshold" in k or "FallbackStartsAt" in k]
    assert threshold_keys, "spill_pressure lost its thresholds?"
    for k in threshold_keys:
        assert confs.get(k) == spill_confs[k], k
    # executors must import the package (driver sys.path doesn't
    # propagate) and the UI must be on for the spill metrics
    assert "spark.executorEnv.PYTHONPATH" in confs
    assert confs.get("spark.ui.enabled") == "true"
    # the vacuous-guard actually covers the composed profile
    import inspect

    src = inspect.getsource(hcs.run_profile)
    assert '"local_cluster_spill"' in src.split("check_spill")[1].split(
        "\n")[0]
