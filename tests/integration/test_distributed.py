"""Distributed/async entry points as suite-run integration tests.

The 2-process ``jax.distributed`` smoke (``scripts/multihost_smoke.py``, SURVEY.md §5.8
DCN axis) and the asynchronous Ask/Tell multiprocessing driver
(``scripts/async_multiprocessing_demo.py``, the reference's async notebooks
``docs/notebooks/asynchronous_greedy_multiprocessing.pct.py``) were previously manual
scripts run by nobody automatically; a regression in ``initialize_multi_host`` /
``create_multi_host_mesh`` or the pending-point flow would fail no test. Both now run
in subprocesses under the suite (auto-skipping where the environment cannot support
them, e.g. no free coordinator port or no multiprocessing semaphores).
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(script: str, *args: str, env: dict | None = None, timeout: int = 420):
    full_env = dict(os.environ)
    full_env["PYTHONPATH"] = str(REPO) + os.pathsep + full_env.get("PYTHONPATH", "")
    if env:
        full_env.update(env)
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=full_env,
        cwd=REPO,
    )


@pytest.mark.filterwarnings("ignore")
def test_multihost_smoke_two_processes():
    """Both processes must join one runtime, shard fit_gpr over the 8-device global
    mesh, and agree bit-for-bit on the training loss."""
    try:
        port = _free_port()
    except OSError as exc:  # pragma: no cover — sandboxed CI without sockets
        pytest.skip(f"cannot allocate a coordinator port: {exc}")
    try:
        proc = _run(
            "multihost_smoke.py", env={"TRIESTE_TPU_COORD": f"localhost:{port}"}
        )
    except subprocess.TimeoutExpired:  # pragma: no cover
        pytest.skip("multihost smoke timed out (overloaded/unsupported environment)")
    out = proc.stdout + proc.stderr
    if proc.returncode != 0 and "UNAVAILABLE" in out:  # pragma: no cover
        pytest.skip(f"distributed runtime unavailable here:\n{out[-2000:]}")
    assert proc.returncode == 0, out[-4000:]
    assert "MULTIHOST SMOKE PASSED" in out


@pytest.mark.filterwarnings("ignore")
def test_async_multiprocessing_ask_tell():
    """The async pending-point flow end-to-end: 2 worker processes with variable
    observation latency, out-of-order tells, and the run must improve on the
    initial design."""
    try:
        import multiprocessing

        multiprocessing.Semaphore(1)
    except (ImportError, OSError, PermissionError) as exc:  # pragma: no cover
        pytest.skip(f"multiprocessing unsupported here: {exc}")
    try:
        # 2 workers x 4 observations keeps the out-of-order tell coverage at half the
        # wall-clock of the original 6-observation run
        proc = _run("async_multiprocessing_demo.py", "2", "4")
    except subprocess.TimeoutExpired:  # pragma: no cover
        pytest.skip("async demo timed out (overloaded/unsupported environment)")
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "ASYNC DEMO DONE" in out
