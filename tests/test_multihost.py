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


def test_phase_watchdog_unit():
    """PhaseWatchdog mechanics without processes: fires after the timeout
    when no checkpoint lands, does NOT fire while checkpoints arrive, and
    stop() retires the monitor thread."""
    import time

    from toyni_tpu.parallel.multihost import PhaseWatchdog

    fired = []
    wd = PhaseWatchdog(0.5, poll_s=0.05, _exit=fired.append)
    with wd:
        for _ in range(4):  # 0.8 s of steady progress > timeout
            time.sleep(0.2)
            wd.checkpoint("busy")
        assert not fired, "watchdog fired despite steady checkpoints"
        time.sleep(1.0)  # now stall past the timeout
        assert fired == [87], f"expected one exit-code-87 fire, got {fired}"
    assert not wd._thread.is_alive()


def test_mid_proof_peer_death_bounded(monkeypatch=None):
    """Mid-run failure detection (SURVEY §5, the round-3 verdict's one
    'partial'): a worker dying INSIDE a proof — after the commit phase,
    leaving its peer blocked in the OOD collective — must surface on the
    SURVIVOR as a prompt, attributed termination, not an indefinite hang.

    Worker 1 (the non-coordinator) self-kills right after absorbing the
    commit roots of a second, warm proof; worker 0 runs that proof under a
    PhaseWatchdog (20 s). Expected on worker 0: the watchdog's diagnostic +
    exit code 87 within a bounded time. (If the transport notices the dead
    TCP peer first and raises its own error, that is an equally acceptable
    prompt failure — the watchdog is the guaranteed upper bound, not the
    only detector.)"""
    import time

    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["TOYNI_TEST_DIE_MID_PROOF"] = "1"  # victim = process 1
    env["TOYNI_TEST_PHASE_TIMEOUT"] = "20"
    workers = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = ["", ""]
    t0 = time.monotonic()
    try:
        # victim first: it must die by its own hand (exit code 1)
        outs[1], _ = workers[1].communicate(timeout=1100)
        t_died = time.monotonic()
        # survivor must terminate within the watchdog bound (+ slack for
        # the poll interval and teardown), NOT hang
        outs[0], _ = workers[0].communicate(timeout=120)
        t_survivor = time.monotonic()
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    assert "MULTIHOST_VICTIM_DYING 1" in outs[1], outs[1][-4000:]
    assert workers[1].returncode == 1, workers[1].returncode
    assert "MULTIHOST_OK 0" in outs[0], outs[0][-4000:]  # warm proof worked
    assert "MULTIHOST_UNEXPECTED_COMPLETION" not in outs[0]
    assert workers[0].returncode != 0, "survivor exited 0 after peer death"
    bounded = t_survivor - t_died
    assert bounded < 90, f"survivor took {bounded:.0f}s to notice the death"
    # the watchdog is the expected detector; a prompt transport error is the
    # acceptable alternative
    assert (
        "PhaseWatchdog" in outs[0]
        or workers[0].returncode == 87
        or "error" in outs[0].lower()
    ), outs[0][-4000:]


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
