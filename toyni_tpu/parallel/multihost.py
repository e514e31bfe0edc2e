"""Multi-host (multi-process) runtime support.

The reference is strictly single-process (no threads, no MPI/NCCL — survey
of deps: rand + sha2 only). This module is the TPU-native multi-host story:
`jax.distributed` process groups + a global device mesh, with the SPMD
programs of `parallel/` running unchanged across hosts — collectives ride
ICI within a host/slice and DCN across hosts.

Design notes (DCN-aware layout):

* The flat host-major mesh below puts each host's local devices CONTIGUOUS
  on the shard axis. The distributed four-step NTT does exactly two
  all-to-alls regardless of depth (ntt_dist.py) — each is one global
  transpose, the information-theoretic minimum data movement for a global
  NTT — so host-major ordering means a D_local-sized block of every
  transpose stays on-host and only the remainder crosses DCN.
* Merkle sub-root all_gathers and OOD partial gathers move O(D * 32) bytes —
  negligible on DCN.
* The Fiat-Shamir transcript is replicated per process (it is deterministic
  given the absorbed roots, which are replicated outputs), so no host
  coordination beyond the collectives themselves is needed: every process
  derives identical challenges and identical query indices.

Tested by spawning real OS processes over the virtual CPU backend
(tests/test_multihost.py) — the analog of the reference's "skip if no GPU"
runtime gating (src/ntt.rs:259-268): proofs must be byte-identical to the
single-process prover.
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np
import jax

from .mesh import AXIS


class PhaseWatchdog:
    """Mid-run failure detection for multi-process proving (SURVEY §5).

    `initialize(timeout_s=...)` only bounds group FORMATION; a peer that
    dies INSIDE a collective leaves the surviving processes blocked in
    native transport code (Gloo across hosts, ICI on a pod) where Python
    exceptions and signals never surface. The watchdog bounds every device
    phase instead: the prover calls `checkpoint(phase)` at each host-sync
    boundary (a transcript round trip), and a daemon monitor thread
    terminates the process with a diagnostic on stderr if no checkpoint
    lands within `phase_timeout_s` — turning an indefinite multi-host hang
    into a prompt, attributed failure an external supervisor can act on.
    (The pure-functional prover is rerun-safe, so recovery = re-execution
    on the surviving group; there is no partial state to repair.)

    The hard `os._exit` is deliberate: the main thread is stuck in a C++
    collective and cannot unwind, so raising in the monitor thread would
    change nothing. Size `phase_timeout_s` to the slowest legitimate phase
    INCLUDING its first-call compile, or enter the watchdog only after a
    warm-up proof.
    """

    def __init__(self, phase_timeout_s: float, *, exit_code: int = 87,
                 poll_s: float | None = None, _exit=os._exit):
        self.timeout = float(phase_timeout_s)
        self.exit_code = exit_code
        self.poll_s = poll_s if poll_s is not None else min(
            1.0, self.timeout / 4
        )
        self._exit = _exit  # injectable for unit tests
        self._last = time.monotonic()
        self._phase = "start"
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def checkpoint(self, phase: str) -> None:
        """Record forward progress; resets the phase deadline."""
        self._phase = phase
        self._last = time.monotonic()

    def _run(self) -> None:
        while not self._stop.wait(self.poll_s):
            stalled = time.monotonic() - self._last
            if stalled > self.timeout:
                print(
                    f"[toyni PhaseWatchdog] no progress for {stalled:.1f}s "
                    f"(limit {self.timeout:.1f}s) since phase "
                    f"{self._phase!r} on process {jax.process_index()} — a "
                    f"peer likely died mid-collective; terminating with "
                    f"exit code {self.exit_code}",
                    file=sys.stderr, flush=True,
                )
                sys.stderr.flush()
                self._exit(self.exit_code)
                return  # only reached with an injected _exit (tests)

    def start(self) -> "PhaseWatchdog":
        self.checkpoint("start")
        self._thread = threading.Thread(
            target=self._run, name="toyni-phase-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "PhaseWatchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None,
               timeout_s: float | None = None) -> None:
    """Join (or create) a jax.distributed process group.

    On TPU pods all arguments come from the runtime environment and may be
    omitted; for CPU-based multi-host simulation pass them explicitly
    (coordinator = "host:port" of process 0).

    `timeout_s` bounds the group formation: a dead or unreachable peer then
    surfaces as a RAISED error after the timeout instead of an indefinite
    hang (jax's default is 300 s) — the failure-detection story for
    multi-host launches, tested in tests/test_multihost.py."""
    kwargs = {}
    if timeout_s is not None:
        kwargs["initialization_timeout"] = int(timeout_s)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
        **kwargs,
    )


def global_devices_host_major():
    """All devices of the process group, ordered host-major (process 0's
    devices first). This ordering makes contiguous sub-blocks of the shard
    axis host-local (see module docstring)."""
    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def global_mesh(n_devices: int | None = None):
    """Flat 1-axis mesh over every device in the process group, host-major —
    a drop-in for `mesh.make_mesh` that spans hosts. The whole `parallel/`
    stack (four-step NTT, sharded FRI, distributed trees, the interactive
    prover) runs on it unchanged: shard_map programs are SPMD."""
    from .mesh import make_mesh

    return make_mesh(n_devices, devices=global_devices_host_major())


def hybrid_mesh(ici_axis: str = "ici", dcn_axis: str = "dcn"):
    """2-axis (hosts, devices-per-host) mesh for hierarchical layouts where
    an algorithm wants to address ICI and DCN separately (e.g. a future
    hierarchical NTT doing per-host four-steps with a single outer DCN
    transpose)."""
    from jax.sharding import Mesh

    devices = global_devices_host_major()
    nproc = len({d.process_index for d in devices})
    if nproc == 0 or len(devices) % nproc:
        raise ValueError(
            f"hybrid mesh needs the same device count on every host: "
            f"{len(devices)} devices across {nproc} processes"
        )
    per_host = len(devices) // nproc
    return Mesh(
        np.array(devices).reshape(nproc, per_host), (dcn_axis, ici_axis)
    )


def is_multiprocess() -> bool:
    return jax.process_count() > 1
