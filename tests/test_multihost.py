"""Multi-host (multi-process) tests: spawn REAL OS processes joined through
jax.distributed over the CPU backend — the closest this environment gets to
multiple TPU hosts (SURVEY §5: multi-host tests via jax device emulation).

The contract under test: the interactive distributed prover produces
byte-identical proofs when its mesh spans processes (collectives ride the
inter-process Gloo transport, the multi-host stand-in for DCN)."""

import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_prover_byte_identical():
    port = _free_port()
    env = dict(os.environ)
    # fresh processes pick their own backend config; explicitly 4 virtual
    # CPU devices each (2 x 4 = 8 global), and skip the axon TPU plugin
    # registration so the test is independent of the tunnel's health
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    workers = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=1100)
            outs.append(out)
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    for i, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {i}" in out, f"worker {i} output:\n{out[-4000:]}"


def test_dead_peer_times_out_with_clear_error():
    """Failure detection (SURVEY §5): forming a process group with a peer
    that never shows up must surface a CLEAR error within the configured
    timeout instead of hanging (jax's default wait is 300 s). Depending on
    the jax version the coordination client either raises (catchable) or
    LOG(FATAL)s with DEADLINE_EXCEEDED — both are prompt, diagnosable
    failures; an indefinite hang is the bug this guards against. Runs in a
    subprocess because jax.distributed.initialize mutates process-global
    state (and may abort the process)."""
    import socket
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    code = (
        "from toyni_tpu.parallel import multihost\n"
        "try:\n"
        f"    multihost.initialize('127.0.0.1:{port}', num_processes=2,\n"
        "                          process_id=0, timeout_s=5)\n"
        "except Exception as e:\n"
        "    print('TIMEOUT_ERROR', type(e).__name__)\n"
        "else:\n"
        "    print('UNEXPECTED_SUCCESS')\n"
    )
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.monotonic()
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=_REPO,
        capture_output=True, text=True, timeout=120,
    )
    elapsed = time.monotonic() - t0
    assert "UNEXPECTED_SUCCESS" not in out.stdout
    clear_error = (
        "TIMEOUT_ERROR" in out.stdout
        or "DEADLINE_EXCEEDED" in out.stderr
        or "Deadline Exceeded" in out.stderr
    )
    assert clear_error, (
        f"expected a prompt timeout error, got:\n"
        f"{out.stdout}\n{out.stderr[-2000:]}"
    )
    assert elapsed < 90, f"dead peer took {elapsed:.0f}s to surface"
