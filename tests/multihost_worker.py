"""Worker process for the multi-host prover test (spawned by
test_multihost.py — not collected by pytest).

Joins a 2-process jax.distributed group (CPU backend, 4 virtual devices per
process = 8 global), runs the interactive distributed prover over the global
mesh, and checks the proof is byte-identical to the single-process prover's
for the same seed. argv: <process_id> <num_processes> <coordinator_port>.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from toyni_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 4, len(jax.devices())
assert multihost.is_multiprocess()

from toyni_tpu import proof as proof_mod  # noqa: E402
from toyni_tpu.field.babybear import P  # noqa: E402
from toyni_tpu.parallel.prover_interactive import DistributedStarkProver  # noqa: E402
from toyni_tpu.prover import StarkProver  # noqa: E402
from toyni_tpu.trace import ExecutionTrace  # noqa: E402

fibs, a, b = [], 1, 1
for _ in range(64):
    fibs.append(a % P)
    a, b = b, (a + b) % P
trace = ExecutionTrace()
trace.insert_column(fibs)

# local (single-process) reference proof on this process's own CPU device
p_single = StarkProver(trace, seed=5).generate_proof()

# distributed proof over the 8-device global mesh spanning both processes
p_dist = DistributedStarkProver(trace, 8, seed=5).generate_proof()

assert proof_mod.serialize(p_dist) == proof_mod.serialize(p_single), (
    "multi-process proof differs from single-process proof"
)
print(f"MULTIHOST_OK {pid}", flush=True)

# ── optional second act: mid-run peer-death drill (test_multihost.py) ───────
# The first (successful) proof warmed every jitted phase, so the second
# proof's phases are fast and a small PhaseWatchdog timeout is safe. The
# designated victim process kills itself -9-style right after the commit
# phase (after absorbing both roots); the survivor then blocks in the OOD
# collective and its watchdog must terminate it promptly with a diagnostic.
_die_pid = os.environ.get("TOYNI_TEST_DIE_MID_PROOF")
if _die_pid is not None:
    wd_timeout = float(os.environ.get("TOYNI_TEST_PHASE_TIMEOUT", "20"))
    if int(_die_pid) == pid:
        from toyni_tpu import transcript as _tmod

        _orig_absorb = _tmod.Transcript.absorb_commitment
        _calls = {"n": 0}

        def _dying_absorb(self, root):
            _calls["n"] += 1
            if _calls["n"] == 2:  # right after the commit phase completes
                print(f"MULTIHOST_VICTIM_DYING {pid}", flush=True)
                os._exit(1)
            return _orig_absorb(self, root)

        _tmod.Transcript.absorb_commitment = _dying_absorb
        DistributedStarkProver(trace, 8, seed=6).generate_proof()
        raise SystemExit("victim unexpectedly survived")
    # survivor: watchdog-armed proof attempt; expected to be terminated by
    # the PhaseWatchdog (exit code 87) once the victim is gone
    print(f"MULTIHOST_SURVIVOR_ARMED {pid}", flush=True)
    DistributedStarkProver(
        trace, 8, seed=6, phase_timeout_s=wd_timeout
    ).generate_proof()
    print(f"MULTIHOST_UNEXPECTED_COMPLETION {pid}", flush=True)
