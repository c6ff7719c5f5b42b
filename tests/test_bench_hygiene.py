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
    assert bench.probe_backend(attempts=2, timeout_s=1, backoff_s=0) is False
    assert calls == [1, 1]  # exactly `attempts` bounded probes
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert all(r["row"] == "backend_probe" and r["ok"] is False for r in rows)
    assert len(rows) == 2


def test_probe_backend_spaces_retries(monkeypatch, capsys):
    """Failed attempts are separated by a backoff sleep (wedge windows
    clear on their own after minutes; back-to-back retries land inside
    the same window — RUNBOOK.md)."""
    sleeps = []

    def fake_run(cmd, capture_output, text, timeout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_sleep_interruptible", sleeps.append)
    assert bench.probe_backend(attempts=3, timeout_s=1, backoff_s=7) is False
    assert sleeps == [7, 7]  # between attempts, never before the first
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert [r["row"] for r in rows] == [
        "backend_probe", "backend_probe_backoff",
        "backend_probe", "backend_probe_backoff", "backend_probe",
    ]


def test_probe_backend_success(monkeypatch, capsys):
    def fake_run(cmd, capture_output, text, timeout):
        return subprocess.CompletedProcess(cmd, 0, stdout="probe ok 64.0", stderr="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.probe_backend(attempts=1, timeout_s=1, backoff_s=0) is True
    row = json.loads(capsys.readouterr().out.splitlines()[0])
    assert row["ok"] is True and "init_s" in row


def test_probe_backend_sigterm_during_backoff_stops(monkeypatch, capsys):
    """SIGTERM landing in the backoff sleep must abort the probe loop
    without launching another subprocess."""
    launches = []

    def fake_run(cmd, capture_output, text, timeout):
        launches.append(timeout)
        raise subprocess.TimeoutExpired(cmd, timeout)

    def stopping_sleep(s):
        bench._STOP = True

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_sleep_interruptible", stopping_sleep)
    old = bench._STOP
    try:
        bench._STOP = False
        assert bench.probe_backend(attempts=3, timeout_s=1, backoff_s=5) is False
        assert launches == [1]  # attempt 2 never launched
    finally:
        bench._STOP = old


class _FakeTime:
    """Deterministic clock: sleep() advances time instead of waiting."""

    def __init__(self):
        self.now = 0.0
        self.sleeps = []

    def time(self):
        return self.now

    def sleep(self, s):
        self.sleeps.append(s)
        self.now += s


def test_sleep_interruptible_chunks(monkeypatch):
    """The backoff sleeps in ~1s chunks so a SIGTERM landing mid-backoff
    is observed within a chunk, not after the full backoff (PEP 475:
    time.sleep resumes after the handler returns)."""
    ft = _FakeTime()
    monkeypatch.setattr(bench, "time", ft)
    old = bench._STOP
    try:
        bench._STOP = False
        bench._sleep_interruptible(5.0)
        assert ft.sleeps == [1.0] * 5
    finally:
        bench._STOP = old


def test_sleep_interruptible_aborts_on_stop(monkeypatch):
    ft = _FakeTime()

    def sleep_then_stop(s):
        ft.sleeps.append(s)
        ft.now += s
        if len(ft.sleeps) == 2:
            bench._STOP = True

    ft.sleep = sleep_then_stop
    monkeypatch.setattr(bench, "time", ft)
    old = bench._STOP
    try:
        bench._STOP = False
        bench._sleep_interruptible(120.0)
        assert len(ft.sleeps) == 2  # aborted ~118s early
    finally:
        bench._STOP = old


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


def test_timed_runs_stop_before_first_run_returns_none():
    """SIGTERM before the first timed run must launch NO new device work
    (the docstring's drain contract) and report None, not crash on an
    empty times list."""
    old = bench._STOP
    try:
        bench._STOP = True
        launched = []
        best = bench._timed_runs(lambda s: launched.append(s),
                                 lambda i: (_ for _ in ()).throw(
                                     AssertionError("launched new work")),
                                 n=3)
        assert best is None and launched == []
    finally:
        bench._STOP = old


def test_sigterm_abort_is_not_reported_as_backend_failure(monkeypatch, capsys):
    """A SIGTERM during the probe must not mis-attribute the abort as a
    wedged chip in the persisted headline."""
    import pytest

    def stopping_probe():
        bench._STOP = True
        return False

    old = bench._STOP
    try:
        monkeypatch.setattr(bench, "probe_backend", stopping_probe)
        with pytest.raises(SystemExit):
            bench.main()
        headline = json.loads(capsys.readouterr().out.splitlines()[-1])
        assert "SIGTERM" in headline["error"]
        assert "unavailable" not in headline["error"]
    finally:
        bench._STOP = old
