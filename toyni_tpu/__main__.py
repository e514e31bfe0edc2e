"""Command-line interface: `python -m toyni_tpu <command>`.

The reference has no CLI (its "application" is the test suite); a production
framework needs one. Commands:

  prove   --rows N [--air fib|pair|sbox] [--ext] [--fused] [--out proof.bin]
          [--seed S] [--profile]
          prove a bundled-AIR trace of N rows, write the serialized proof
  verify  --in proof.bin [--air fib|pair|sbox]
          verify a serialized proof (host verifier)
  bench   run the benchmark (same as bench.py)
  info    print protocol + device configuration
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _fib_column(n: int):
    # Fibonacci in the field: a u64-wrapping sequence (the reference's
    # construction, valid only below ~94 rows where u64 never wraps) breaks
    # the mod-p relation after the wrap; the AIR is defined over F_p.
    from toyni_tpu.field.babybear import P

    out, a, b = [], 1, 1
    for _ in range(n):
        out.append(a)
        a, b = b, (a + b) % P
    return out


def _make_air(name: str, rows: int):
    """(air, trace, constraint_degree) for a bundled AIR by CLI name."""
    from toyni_tpu.trace import ExecutionTrace

    t = ExecutionTrace()
    if name == "fib":
        t.insert_column(_fib_column(rows))
        return None, t, 1  # None = the prover's default FibonacciAir
    if name == "pair":
        from toyni_tpu.air import PairFibonacciAir

        air = PairFibonacciAir()
        col_a, col_b = PairFibonacciAir.generate_trace(rows)
        t.insert_column(col_a)
        t.insert_column(col_b)
        return air, t, 1
    if name == "sbox":
        from toyni_tpu.air import SboxChainAir

        air = SboxChainAir()
        t.insert_column(SboxChainAir.generate_trace(rows))
        return air, t, air.constraint_degree
    raise SystemExit(f"unknown AIR {name!r}")


def cmd_prove(args) -> int:
    from toyni_tpu import profiling, proof as proof_mod
    from toyni_tpu.config import StarkConfig
    from toyni_tpu.prover import StarkProver

    air, t, deg = _make_air(args.air, args.rows)
    cfg = StarkConfig(ext_challenges=args.ext, constraint_degree=deg,
                      hash=args.hash)
    # default = the fused single-dispatch prover up to trace 2^20 — the
    # measured winner at every size it fits (0.39 vs 0.65 s/proof at 2^8,
    # 0.61 vs 1.13 at 2^16, 8.5 vs 10.6 at 2^20 on v5e; PERF.md round-3
    # table) — in every hash mode (the device transcript absorbs Poseidon2
    # roots as their LE wire bytes). ABOVE 2^20 the phase prover is the
    # default: the fused program retains every tree level and salt layer as
    # live values of ONE program (prover_fused.tree_salted), which at trace
    # 2^21 / LDE 2^26 needs ~4 GB per SHA tree x 2 commit trees + ~1 GB per
    # (N,4) salt layer x ~13 salted layers — far over a v5e's 16 GB HBM.
    # The ceiling-regime memory machinery (7-level-pruned storage, chunk-
    # streamed builds, key-form salts; PERF.md round 4) is phase-prover
    # only: it needs values to DIE between phases, which a single fused
    # program by construction prevents. --fused still forces it.
    _FUSED_MAX_ROWS = 1 << 20
    use_fused = args.fused or (not args.phase
                               and args.rows <= _FUSED_MAX_ROWS)
    if use_fused:
        from toyni_tpu.prover_fused import FusedStarkProver as prover_cls
    else:
        prover_cls = StarkProver
    t0 = time.perf_counter()
    proof = prover_cls(t, air=air, config=cfg, seed=args.seed).generate_proof()
    dt = time.perf_counter() - t0
    blob = proof_mod.serialize(proof)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"proved {args.rows} rows in {dt:.2f}s -> {args.out} ({len(blob)} bytes)")
    if args.profile:
        print(profiling.format_report())
        # machine-readable per-proof metrics (phase seconds + dispatch /
        # transfer counters) as one JSON line
        print(profiling.metrics_line())
    return 0


def cmd_verify(args) -> int:
    from toyni_tpu import proof as proof_mod
    from toyni_tpu.verifier import StarkVerifier

    with open(getattr(args, "in"), "rb") as f:
        blob = f.read()
    proof = proof_mod.deserialize(blob)
    from toyni_tpu.config import StarkConfig

    air, _, deg = _make_air(args.air, proof.trace_len)
    cfg = StarkConfig(ext_challenges=bool(proof.ext), constraint_degree=deg,
                      hash=proof.hash)
    t0 = time.perf_counter()
    if args.native:
        from toyni_tpu import native

        ok = native.verify_proof_blob(blob, cfg, air=air)
        how = "native"
    else:
        ok = StarkVerifier(air=air, config=cfg).verify(proof)
        how = "host"
    print(
        f"verify[{how}]: {'ACCEPT' if ok else 'REJECT'} "
        f"({time.perf_counter()-t0:.3f}s)"
    )
    return 0 if ok else 1


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def cmd_info(args) -> int:
    import jax

    from toyni_tpu.config import DEFAULT_CONFIG
    from toyni_tpu import native

    cfg = DEFAULT_CONFIG
    print(
        json.dumps(
            {
                "protocol": {
                    "num_queries": cfg.num_queries,
                    "blowup": cfg.blowup,
                    "coset_shift": cfg.coset_shift,
                    "mask_degree": cfg.mask_degree,
                    "soundness_bits": 3 * cfg.num_queries,
                },
                "devices": [str(d) for d in jax.devices()],
                "native_runtime": native.available(),
            },
            indent=2,
        )
    )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="toyni_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    air_kw = dict(
        choices=("fib", "pair", "sbox"), default="fib",
        help="bundled AIR: fib (reference protocol), pair (2-column/"
             "2-constraint), sbox (nonlinear x^7 chain, degree-7 FRI budget)",
    )
    pp = sub.add_parser("prove", help="prove a bundled-AIR trace")
    pp.add_argument("--rows", type=int, default=64)
    pp.add_argument("--out", default="proof.bin")
    pp.add_argument("--seed", type=int, default=None)
    pp.add_argument("--profile", action="store_true")
    pp.add_argument("--air", **air_kw)
    pp.add_argument(
        "--ext", action="store_true",
        help="extension-field soundness mode (z, betas from F_p^4)",
    )
    pp.add_argument(
        "--hash", choices=("sha256", "poseidon2"), default="sha256",
        help="Merkle commitment hash: sha256 (reference-exact) or poseidon2 "
             "(arithmetic hash over BabyBear; wire format v5)",
    )
    pp.add_argument(
        "--fused", action="store_true",
        help="force the single-dispatch prover: whole proof (incl. the "
             "Fiat-Shamir transcript) as one device program; byte-identical "
             "proofs (the DEFAULT at every size since round 3's chunked "
             "compression)",
    )
    pp.add_argument(
        "--phase", action="store_true",
        help="force the phase prover (per-phase dispatches + host transcript)",
    )
    pp.set_defaults(fn=cmd_prove)

    pv = sub.add_parser("verify", help="verify a serialized proof")
    pv.add_argument("--in", dest="in", default="proof.bin")
    pv.add_argument("--air", **air_kw)
    pv.add_argument(
        "--native", action="store_true",
        help="full C++ verifier (bundled AIRs, all wire formats)",
    )
    pv.set_defaults(fn=cmd_verify)

    pb = sub.add_parser("bench", help="run the benchmark")
    pb.set_defaults(fn=cmd_bench)

    pi = sub.add_parser("info", help="print configuration")
    pi.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
