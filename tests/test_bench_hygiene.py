"""Capture-hygiene contract of bench.py (RUNBOOK.md): bounded backend
probes, incremental evidence rows, SIGTERM drain flag.  These are the
pieces that must keep working for the driver's bench artifact to carry
evidence even when the remote chip is wedged."""

import json
import signal
import subprocess
import sys

import bench


def test_probe_backend_times_out_bounded(monkeypatch, capsys):
    calls = []

    def fake_run(cmd, capture_output, text, timeout):
        calls.append(timeout)
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.probe_backend(attempts=2, timeout_s=1) is False
    assert calls == [1, 1]  # exactly `attempts` bounded probes
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert all(r["row"] == "backend_probe" and r["ok"] is False for r in rows)
    assert len(rows) == 2


def test_probe_backend_success(monkeypatch, capsys):
    def fake_run(cmd, capture_output, text, timeout):
        return subprocess.CompletedProcess(cmd, 0, stdout="probe ok 64.0", stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.probe_backend(attempts=1, timeout_s=1) is True
    row = json.loads(capsys.readouterr().out.splitlines()[0])
    assert row["ok"] is True and "init_s" in row


def test_sigterm_sets_drain_flag(capsys):
    old = bench._STOP
    try:
        bench._on_sigterm(signal.SIGTERM, None)
        assert bench._STOP is True
        row = json.loads(capsys.readouterr().out.splitlines()[0])
        assert row["row"] == "signal"
    finally:
        bench._STOP = old


def test_failure_path_emits_headline_with_error(monkeypatch, capsys):
    """If the backend is unreachable, main() still prints a parseable
    headline JSON line (value null + error) and exits 1."""
    monkeypatch.setattr(bench, "probe_backend", lambda: False)
    import pytest

    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    lines = capsys.readouterr().out.splitlines()
    headline = json.loads(lines[-1])
    assert headline["value"] is None
    assert "metric" in headline and "error" in headline


def test_emit_rows_are_json_lines(capsys):
    bench.emit("melbourne", env_steps_per_s=1.0)
    row = json.loads(capsys.readouterr().out.strip())
    assert row == {"row": "melbourne", "env_steps_per_s": 1.0}
