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
