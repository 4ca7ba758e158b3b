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
