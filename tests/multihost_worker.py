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
