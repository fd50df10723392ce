"""Unit tests for bench.py's TPU-relay resilience layer.

The round-3 postmortem: the driver's bench run returned rc=1 because the
axon relay (the tunnel to the one real chip) was down at dispatch time,
erasing the round's number of record. bench.py now waits for the relay
socket with backoff and re-execs on mid-run UNAVAILABLE errors — this file
pins that logic (it is the bench's safety net, so a regression here is a
silent single-point-of-failure for the whole round).
"""

import socket
import sys
import threading

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv(bench._DEADLINE_ENV, raising=False)
    monkeypatch.delenv("BENCH_RELAY_WAIT_S", raising=False)
    yield


def test_relay_not_requested_skips_wait(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not bench._relay_requested()
    # must return immediately without touching the network or the deadline
    bench._wait_for_relay()


def test_relay_up_against_live_socket(monkeypatch):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    monkeypatch.setattr(bench, "_RELAY_ADDR", ("127.0.0.1", port))
    t = threading.Thread(target=lambda: srv.accept(), daemon=True)
    t.start()
    try:
        assert bench._relay_up(timeout=2.0)
    finally:
        srv.close()


def test_relay_down_is_false(monkeypatch):
    # grab a port and close it so nothing listens there
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    monkeypatch.setattr(bench, "_RELAY_ADDR", ("127.0.0.1", port))
    assert not bench._relay_up(timeout=0.5)


def test_wait_for_relay_exits_past_deadline(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("BENCH_RELAY_WAIT_S", "0")
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    monkeypatch.setattr(bench, "_RELAY_ADDR", ("127.0.0.1", port))
    with pytest.raises(SystemExit) as exc:
        bench._wait_for_relay()
    assert exc.value.code == 1


def test_retry_or_exit_reraises_non_transient(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    err = RuntimeError("INVALID_ARGUMENT: shapes disagree")
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        bench._retry_or_exit(err)


def test_retry_or_exit_reraises_past_deadline(monkeypatch):
    # transient error text, but the wait window is exhausted -> re-raise
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("BENCH_RELAY_WAIT_S", "0")
    bench._deadline()  # materialize the (already-expired) deadline
    err = RuntimeError("UNAVAILABLE: relay gone")
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._retry_or_exit(err)


def test_retry_or_exit_reexecs_on_transient(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("BENCH_RELAY_WAIT_S", "3600")
    calls = {}
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_wait_for_relay", lambda: None)

    def fake_execv(exe, argv):
        calls["execv"] = (exe, argv)
        raise SystemExit(99)  # stop the test instead of replacing the process

    monkeypatch.setattr(bench.os, "execv", fake_execv)
    with pytest.raises(SystemExit):
        bench._retry_or_exit(RuntimeError("UNAVAILABLE: relay died mid-run"))
    assert calls["execv"][0] == sys.executable
    assert calls["execv"][1][1].endswith("bench.py")
