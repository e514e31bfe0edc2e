"""Probe the protocol-ceiling proof sizes on the real TPU.

Usage: python scripts/ceiling_probe.py <log_rows> [iters]

Runs the phase prover at trace 2^log_rows (LDE = rows * 32; the protocol
ceiling is log_rows 22 -> LDE 2^27, the BabyBear 2-adicity bound the
reference enforces at src/babybear.rs:118-126), host-verifies the proof,
and reports s/proof plus device memory stats (peak HBM) so PERF.md can
carry a measured ceiling row or a concrete OOM analysis.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def mem_line(dev, tag):
    try:
        s = dev.memory_stats()
        peak = s.get("peak_bytes_in_use", 0) / 2**30
        cur = s.get("bytes_in_use", 0) / 2**30
        lim = s.get("bytes_limit", 0) / 2**30
        print(f"[mem {tag}] in_use={cur:.2f} GiB peak={peak:.2f} GiB "
              f"limit={lim:.2f} GiB", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[mem {tag}] unavailable: {type(e).__name__}: {e}", flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from toyni_tpu.field.babybear import P
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.verifier import StarkVerifier

    log_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rows = 1 << log_rows
    dev = jax.devices()[0]
    print(f"device: {dev}, trace 2^{log_rows} rows, LDE 2^{log_rows+5}",
          flush=True)

    def trace():
        fibs, a, b = [], 1, 1
        for _ in range(rows):
            fibs.append(a % P)
            a, b = b, (a + b) % P
        t = ExecutionTrace()
        t.insert_column(fibs)
        return t

    t_build = time.perf_counter()
    tr = trace()
    print(f"trace built in {time.perf_counter()-t_build:.1f}s", flush=True)
    mem_line(dev, "start")

    t0 = time.perf_counter()
    proof = StarkProver(tr, seed=1).generate_proof()
    print(f"first proof (incl. compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    mem_line(dev, "after-first")

    t0 = time.perf_counter()
    ok = StarkVerifier().verify(proof)
    print(f"host verify: {ok} in {time.perf_counter()-t0:.2f}s", flush=True)
    assert ok

    if iters > 0:
        t0 = time.perf_counter()
        for i in range(iters):
            StarkProver(trace(), seed=10 + i).generate_proof()
        spp = (time.perf_counter() - t0) / iters
        print(f"steady: {spp:.2f} s/proof ({1/spp:.3f} proofs/s)", flush=True)
    mem_line(dev, "end")


if __name__ == "__main__":
    main()
