"""Single-dispatch STARK prover: the ENTIRE proof as one XLA program.

The phase-based prover (prover.py) keeps the Fiat-Shamir transcript on the
host, which forces a device->host->device round trip at every phase boundary:
commit, z derivation, OOD absorb, one per FRI fold (the next beta depends on
the previous layer's root), and the query gathers — ~(log2(N/final) + 6)
sequential round trips per proof. On a remote-attached chip each costs
~25 ms; even locally attached they serialize the pipeline.

This prover moves the transcript itself onto the device (ops/transcript_dev,
byte-exact vs transcript.py) so commit -> alphas -> z rejection sampling ->
OOD -> DEEP -> every FRI fold+commit (betas squeezed on device) -> query-
index dedup -> all Merkle gathers compile into ONE jitted program: one
dispatch, then one host materialization that feeds proof assembly. Proofs
are byte-identical to StarkProver's for the same seed in every mode
(tested), hence also to the reference protocol's transcript for the default
config (reference: src/fibonacci.rs:99-310).

Covers all protocol modes: the reference shape (single column, 3 shifts,
base-field challenges), generic multi-column / multi-constraint AIRs
(Fiat-Shamir alphas squeezed on device between the two commits), and the
extension-field soundness mode (z / betas from F_p^4 via four-squeeze
ext challenges, ext DEEP/FRI codewords and leaves).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .air import Air, FibonacciAir
from .config import DEFAULT_CONFIG, StarkConfig
from .domain import Domain
from .field import babybear as bb
from .field import ext as extf


def sha_forced_rolled():
    """Compression form for the fused whole-proof programs: CHUNKED (8-round
    fori_loop chunks, rounds unrolled inside). The fully unrolled form's
    program reaches ~14 MB of MLIR and the remote compiler SIGKILLs it;
    chunked is ~8x smaller than that, compiles fine, and its better fusion
    beats the previous rolled default 1.86x at trace 2^16 (0.605 vs 1.128
    s/proof) and 1.22x at 2^8 (0.393 vs 0.479) on v5e.
    `TOYNI_FUSED_SHA_FORM=rolled` restores the old form; identical proof
    bytes in every form (name kept for history)."""
    import os

    from .ops import sha256 as sha

    return sha.forced(os.environ.get("TOYNI_FUSED_SHA_FORM", "chunked"))
from .field.babybear import P
from .merkle import LEAFLESS_MIN, _device_levels, extract_paths, openings_from_paths
from .proof import MerkleOpening, QueryProof, StarkProof
from .prover import _xs_inv0_dev, _zh_inv_tile_dev
from .trace import ExecutionTrace
from .transcript import SEED
from . import profiling

_U32 = jnp.uint32
_DEFAULT_AIR = FibonacciAir()


def _draw_key(rng) -> list:
    """Raw threefry key words for the NEXT salt draw — the same uint64 the
    phase-based prover feeds jax.random.PRNGKey. Without x64, PRNGKey
    truncates the seed to its low 32 bits (hi word 0); replicate that
    exactly so salts — and therefore proofs — are byte-identical."""
    kk = int(rng.integers(0, 2**63))
    if jax.config.jax_enable_x64:  # pragma: no cover — not this deployment
        return [kk >> 32, kk & 0xFFFFFFFF]
    return [0, kk & 0xFFFFFFFF]


def _salt_bits(key2, size: int):
    """(size, 4) u32 salt words from a raw (2,) threefry key — the same draw
    StarkProver._salts makes (jax.random.bits on a PRNGKey), with the key
    passed in as data so it can be a jit argument."""
    return jax.random.bits(
        jax.random.wrap_key_data(key2, impl="threefry2x32"), (size, 4), _U32
    )


@functools.lru_cache(maxsize=8)
def _fused_fns(n: int, N: int, L: int, blowup: int, coset_shift: int, air,
               final_size: int, num_queries: int, k: int, nc: int, ns: int,
               ext: bool, hash_kind: str = "sha256"):
    """One jitted program covering the whole proof for trace length n."""
    from .domain import _shift_tables
    from .merkle import _hash_backend
    from .ops import transcript_dev as td

    # hash backend for every committed tree; the on-device TRANSCRIPT is
    # always SHA-256 (td) — only the commitments switch. `sha` is the
    # historical local name.
    sha = _hash_backend(hash_kind)
    # Merkle roots absorb as their wire BYTES: BE words for SHA-256
    # digests, LE words for Poseidon2 (see td._part_bytes)
    _root_part = "digest" if hash_kind == "sha256" else "digest_le"

    def rootp(w):
        return (_root_part, w)

    def salt_bits(key2, size):
        bits = _salt_bits(key2, size)
        if hash_kind != "sha256":
            bits = bits & jnp.uint32(0x7FFFFFFF)
            bits = jnp.where(bits >= jnp.uint32(P), bits - jnp.uint32(P),
                             bits)
        return bits
    from .ops.fri import fri_fold_ext
    from .ops.ntt import apply_ntt, ntt_tables
    from .pipeline import _fold_traced

    domain = Domain.new(n)
    shifted = Domain.new(N).get_coset(coset_shift)
    g = domain.group_gen()
    m = L - n
    inv_om_n = pow(domain.omega, P - 2, P)
    shift_fwd, _shift_bwd_unused = _shift_tables(N, coset_shift)
    n_inv = pow(n, P - 2, P)
    Q = num_queries
    half0 = N // 2
    multi = k > 1 or nc > 1 or ns != 3

    # no inverse-NTT tables since round 2: the quotient never returns to
    # coefficient space (barycentric OOD from the evals) — this also shrinks
    # the single fused program by a full N-point inverse transform
    tables = dict(
        trace_intt=ntt_tables(n, inv_om_n),
        fft=ntt_tables(N, shifted.omega),
        shift_fwd=shift_fwd,
        zh_tile=_zh_inv_tile_dev(n, N, coset_shift, shifted.omega),
        x=shifted.elements(),
        xs_inv0=_xs_inv0_dev(N, coset_shift, shifted.omega),
    )
    h_N = pow(coset_shift, N, P)
    NhN_inv = pow(N * h_N % P, P - 2, P)

    # intermediate FRI layer sizes (fibonacci.rs:220-245) and the opened-tree
    # spec of the fused gather, identical to prover.py's gather_all
    fri_sizes = []
    layer = N // 2
    while layer > final_size:
        fri_sizes.append(layer)
        layer //= 2
    num_folds = len(fri_sizes) + 1
    gspec = [
        dict(size=N, nidx=ns * Q, kind="trace"),
        dict(size=N, nidx=Q, kind="base"),
        dict(size=N, nidx=2 * Q, kind="ext" if ext else "base"),
    ] + [
        dict(size=s, nidx=2 * Q, kind="ext" if ext else "base")
        for s in fri_sizes
    ]
    for t in gspec:
        t["leafless"] = t["size"] >= LEAFLESS_MIN
        t["depth"] = t["size"].bit_length() - 1
        if t["kind"] == "trace":
            t["vmult"] = k
        elif t["kind"] == "ext":
            t["vmult"] = 4
        else:
            t["vmult"] = 1

    def hash_leaves(kind, values, salts):
        if kind == "trace" and k > 1:
            return sha.hash_salted_leaves_multi(values, salts)
        if kind == "ext":
            return sha.hash_salted_leaves_ext(values, salts)
        return sha.hash_salted_leaves(values, salts)

    def tree_salted(kind, values, salts):
        size = values.shape[1] if (kind == "trace" and k > 1) else values.shape[0]
        levels = _device_levels(hash_leaves(kind, values, salts),
                                hash_kind)
        root_w = levels[-1][0]
        if size >= LEAFLESS_MIN:
            levels = levels[1:]
        return levels, root_w

    def le_parts(v):
        """absorb encoding of one OOD value: 8-byte LE scalar, or the 32-byte
        ext encoding (4 LE limbs) in ext mode."""
        if ext:
            return [("le8", v[j]) for j in range(4)]
        return [("le8", v)]

    def squeeze_absorbed(parts):
        """Squeeze one challenge right after an absorb: the squeeze's hash IS
        SHA(absorbed state) = hash_parts(parts). Base mode: one squeeze; ext
        mode: that squeeze plus three ratchets (transcript.rs:34-50).
        Returns (state_digest, challenge)."""
        d = td.hash_parts(parts)
        if not ext:
            return d, td.challenge_from_digest(d)
        cs = [td.challenge_from_digest(d)]
        for _ in range(3):
            d = td.ratchet(d)
            cs.append(td.challenge_from_digest(d))
        return d, jnp.stack(cs)

    def prove(trace_cols, r_masks, salt_keys, tb):
        """trace_cols (k, n); r_masks (k, m); salt_keys (2 + num_folds, 2)
        u32 raw threefry keys in StarkProver's exact draw order (trace,
        quotient, FRI layer 0, then each salted intermediate layer)."""
        # ── trace commit (fibonacci.rs:110-130) ───────────────────────────
        ldes = []
        for c in range(k):
            t_coeffs = bb.mul_const(
                apply_ntt(trace_cols[c], tb["trace_intt"], n), n_inv
            )
            t_pad = jnp.pad(t_coeffs, (0, L - n))
            r_low = jnp.pad(r_masks[c], (0, L - m))
            r_shift = jnp.pad(r_masks[c], (n, L - m - n))
            that = bb.add(t_pad, bb.sub(r_shift, r_low))
            ldes.append(
                apply_ntt(bb.mont_mul(jnp.pad(that, (0, N - L)),
                                      tb["shift_fwd"]), tb["fft"], N)
            )
        lde_k = jnp.stack(ldes)
        trace_salts = salt_bits(salt_keys[0], N)
        trace_levels, trace_root_w = tree_salted(
            "trace", lde_k if k > 1 else lde_k[0], trace_salts
        )

        # ── alphas (multi-constraint composition, squeezed from the trace
        #    root — the transcript splits the commit in two) ───────────────
        if nc > 1:
            d = td.hash_parts([SEED, rootp(trace_root_w)])
            alpha_list = [td.challenge_from_digest(d)]
            for _ in range(nc - 1):
                d = td.ratchet(d)
                alpha_list.append(td.challenge_from_digest(d))
            alphas = jnp.stack(alpha_list)
            pre_z_parts = [("digest", d)]
        else:
            alphas = None
            pre_z_parts = [SEED, rootp(trace_root_w)]

        # ── constraint, quotient, quotient commit (fibonacci.rs:132-154) ──
        t_views = [jnp.roll(lde_k, -s * blowup, axis=1) for s in range(ns)]
        t_args = [v[0] for v in t_views] if k == 1 else t_views
        if nc > 1:
            c_evals = air.constraint_lde(t_args, tb["x"], g, n, alphas)
        else:
            c_evals = air.constraint_lde(t_args, tb["x"], g, n)
        q_evals = bb.mont_mul(c_evals, tb["zh_tile"])
        quot_salts = salt_bits(salt_keys[1], N)
        quot_levels, quot_root_w = tree_salted("base", q_evals, quot_salts)
        pre_z_parts.append(rootp(quot_root_w))

        # ── transcript: z (rejection sampling, fibonacci.rs:156-161) ──────
        if ext:
            d, z0 = squeeze_absorbed(pre_z_parts)
            digest, z = td.derive_z_ext_loop(d, z0, N, coset_shift)
        else:
            digest, z = td.derive_z_loop(
                td.hash_parts(pre_z_parts), N, coset_shift
            )

        # ── OOD openings at z, g z, ..., g^(ns-1) z (fibonacci.rs:163-183),
        # barycentric from the eval vectors: p(z) = (z^N - h^N)/(N h^N) *
        # sum_i x_i v_i/(z - x_i); T_c(g^s z) uses the rolled LDE, so every
        # value shares ONE denominator inversion, reused by DEEP below ─────
        if ext:
            zero = jnp.zeros_like(tb["x"])
            x_minus_z = jnp.stack(
                [bb.sub(tb["x"], z[0])]
                + [bb.sub(zero, z[j]) for j in (1, 2, 3)], axis=-1,
            )
            inv_xz = extf.inv_fast(x_minus_z)        # (N, 4)
            wv = extf.mul_base(inv_xz, tb["x"])
            zN = extf.pow_const(z[None, :], N)[0]
            hN4 = jnp.asarray(np.array([h_N, 0, 0, 0], np.uint32))
            pref = bb.mul_const(extf.sub(zN, hN4), NhN_inv)   # (4,)

            def ev(v):
                sm = bb.sum_mod(extf.mul_base(wv, v), axis=0)
                return extf.mul(
                    pref[None, :], bb.sub(jnp.uint32(0), sm)[None, :]
                )[0]

            rows = [
                ev(t_views[s][c]) for s in range(ns) for c in range(k)
            ]
            rows.append(ev(q_evals))
            ood = jnp.stack(rows)  # (ns*k + 1, 4)
        else:
            inv_xz = bb.inv(bb.sub(tb["x"], z))
            wv = bb.mul(tb["x"], inv_xz)
            pref = bb.mul_const(
                bb.sub(bb.pow_const(z, N), jnp.uint32(h_N)), NhN_inv
            )

            def ev(v):
                sm = bb.sum_mod(bb.mul(v, wv))
                return bb.mul(pref, bb.sub(jnp.uint32(0), sm))

            rows = [
                ev(t_views[s][c]) for s in range(ns) for c in range(k)
            ]
            rows.append(ev(q_evals))
            ood = jnp.stack(rows)  # (ns*k + 1,)

        # ── DEEP quotient (fibonacci.rs:185-198): reuses inv_xz ───────────
        if ext:
            base_sum = q_evals
            for s in range(ns):
                for c in range(k):
                    base_sum = bb.add(base_sum, t_views[s][c])
            ood_sum = bb.sum_mod(ood, axis=0)  # (4,)
            zero2 = jnp.zeros_like(base_sum)
            num = jnp.stack(
                [bb.sub(base_sum, ood_sum[0])]
                + [bb.sub(zero2, ood_sum[j]) for j in (1, 2, 3)], axis=-1,
            )
            d_evals = extf.mul(num, inv_xz)  # (N, 4)
        else:
            num = bb.sub(q_evals, ood[ns * k])
            for s in range(ns):
                for c in range(k):
                    num = bb.add(num, bb.sub(t_views[s][c], ood[s * k + c]))
            d_evals = bb.mul(num, inv_xz)

        # ── FRI: on-device betas (fibonacci.rs:200-247) ───────────────────
        fri_salts0 = salt_bits(salt_keys[2], N)
        kind_fri = "ext" if ext else "base"
        levels0, root0_w = tree_salted(kind_fri, d_evals, fri_salts0)
        fri_levels = [levels0]
        fri_roots = [root0_w]
        fri_layers = [d_evals]
        all_salts_fri = [fri_salts0]

        absorb_parts = (
            [("digest", digest)]
            + [p for i in range(ns * k + 1) for p in le_parts(ood[i])]
            + [rootp(root0_w)]
        )
        current = d_evals
        xs_inv = tb["xs_inv0"]
        ki = 3
        prev_root = root0_w
        for j in range(num_folds):
            digest, beta = squeeze_absorbed(
                absorb_parts if j == 0
                else [("digest", digest), rootp(prev_root)]
            )
            half = current.shape[0] // 2
            if ext:
                current = fri_fold_ext(current, xs_inv[:half], beta)
            else:
                current = _fold_traced(current, xs_inv[:half], beta)
            xs_inv = bb.mont_mul(xs_inv[:half], xs_inv[:half])
            if current.shape[0] == final_size:
                leaves = (
                    sha.hash_unsalted_leaves_ext(current) if ext
                    else sha.hash_unsalted_leaves(current)
                )
                levels = _device_levels(leaves, hash_kind)
                root_w = levels[-1][0]
            else:
                salts = salt_bits(salt_keys[ki], current.shape[0])
                ki += 1
                levels, root_w = tree_salted(kind_fri, current, salts)
                fri_levels.append(levels)
                all_salts_fri.append(salts)
                fri_layers.append(current)
            fri_roots.append(root_w)
            prev_root = root_w

        # ── query indices (fibonacci.rs:249-251) ──────────────────────────
        digest, qidx = td.squeeze_indices_loop(
            [("digest", digest), rootp(prev_root)], Q, half0
        )

        # ── fused gathers for every opened tree ───────────────────────────
        qi = qidx
        trace_idx = jnp.stack(
            [(qi + _U32(s * blowup)) & _U32(N - 1) for s in range(ns)], axis=1
        ).reshape(-1)
        deep_idx = jnp.stack([qi, qi + _U32(half0)], axis=1).reshape(-1)
        fri_idx = []
        cur_idx = qi
        for s in fri_sizes:
            half = s // 2
            cur_idx = cur_idx & _U32(half - 1)
            fri_idx.append(
                jnp.stack([cur_idx, cur_idx + _U32(half)], axis=1).reshape(-1)
            )

        all_levels = [trace_levels, quot_levels] + fri_levels
        all_values = [lde_k if k > 1 else lde_k[0], q_evals] + fri_layers
        all_salts = [trace_salts, quot_salts] + all_salts_fri
        all_idx = [trace_idx, qi, deep_idx] + fri_idx
        v_out, p_out, s_out = [], [], []
        for t, levels, vals, slt, idx in zip(
            gspec, all_levels, all_values, all_salts, all_idx
        ):
            ii = idx.astype(jnp.int32)
            bundle = t["kind"] == "trace" and k > 1
            v = (jnp.take(vals, ii, axis=1).T if bundle
                 else jnp.take(vals, ii, axis=0))
            if t["leafless"]:
                sib = ii ^ 1
                sv = (jnp.take(vals, sib, axis=1) if bundle
                      else jnp.take(vals, sib, axis=0))
                sib_digest = hash_leaves(
                    t["kind"], sv, jnp.take(slt, sib, axis=0)
                )
                rest = extract_paths(levels, ii >> 1)
                paths = jnp.concatenate([sib_digest[:, None, :], rest], axis=1)
            else:
                paths = extract_paths(levels, ii)
            v_out.append(v.reshape(-1))
            p_out.append(paths.reshape(-1))
            s_out.append(jnp.take(slt, ii, axis=0).reshape(-1))

        out = dict(
            trace_root=trace_root_w,
            quot_root=quot_root_w,
            z=z,
            ood=ood,
            fri_roots=jnp.stack(fri_roots),
            final_layer=current,
            qidx=qidx,
            vals=jnp.concatenate(v_out),
            paths=jnp.concatenate(p_out),
            salts=jnp.concatenate(s_out),
        )
        if nc > 1:
            out["alphas"] = alphas
        return out

    def split_gathered(v_np, p_np, s_np):
        out, vo, po, so = [], 0, 0, 0
        for t in gspec:
            nv = t["nidx"] * t["vmult"]
            npth = t["nidx"] * t["depth"] * 8
            vals = v_np[vo:vo + nv].astype(np.uint64)
            if t["vmult"] > 1:
                vals = vals.reshape(t["nidx"], t["vmult"])
            out.append((
                vals,
                p_np[po:po + npth].reshape(t["nidx"], t["depth"], 8),
                s_np[so:so + 4 * t["nidx"]].astype(np.uint64).reshape(
                    t["nidx"], 4
                ),
            ))
            vo, po, so = vo + nv, po + npth, so + 4 * t["nidx"]
        return out

    return dict(
        prove=jax.jit(prove),
        prove_raw=prove,
        split_gathered=split_gathered,
        tables=tables,
        gspec=gspec,
        fri_sizes=fri_sizes,
        num_folds=num_folds,
        g=g,
        multi=multi,
    )


def _assemble_proof(air, n: int, N: int, blowup: int, k: int, nc: int,
                    ns: int, ext: bool, fns, out,
                    hash_kind: str = "sha256") -> StarkProof:
    """Host-side proof assembly from the fused program's materialized numpy
    outputs (one proof's worth); mirrors prover.py's assembly int math."""
    from .merkle import _hash_backend

    sha = _hash_backend(hash_kind)
    multi = fns["multi"]
    num_folds = fns["num_folds"]
    trace_root = sha.digest_bytes(out["trace_root"])
    quotient_root = sha.digest_bytes(out["quot_root"])
    ood_np = out["ood"].astype(np.uint64)
    z_np = out["z"].astype(np.uint64)
    fri_commitments = [
        sha.digest_bytes(out["fri_roots"][i])
        for i in range(out["fri_roots"].shape[0])
    ]
    final_np = out["final_layer"].astype(np.uint64)
    query_indices = [int(v) for v in out["qidx"]]
    alphas = (
        tuple(int(v) for v in out["alphas"].astype(np.uint64))
        if nc > 1 else ()
    )
    parts = fns["split_gathered"](out["vals"], out["paths"], out["salts"])

    # host scalar forms of z / OOD / final layer
    if ext:
        z = tuple(int(v) for v in z_np)
        ood_scalars = [tuple(int(v) for v in row) for row in ood_np]
        fri_final_layer = [tuple(int(v) for v in row) for row in final_np]
    else:
        z = int(z_np)
        ood_scalars = [int(v) for v in ood_np]
        fri_final_layer = [int(v) for v in final_np]
    q_z = ood_scalars[ns * k]
    ood_trace = tuple(
        tuple(ood_scalars[s * k + c] for c in range(k)) for s in range(ns)
    )

    # ── prover-side sanity check at z (fibonacci.rs:169-177) ──────────────
    g = fns["g"]
    domain = Domain.new(n)
    t_scalars = [ood_trace[s] if k > 1 else ood_trace[s][0] for s in range(ns)]
    if ext:
        c_z = (
            air.constraint_at_ext(t_scalars, z, g, n, alphas)
            if nc > 1 else air.constraint_at_ext(t_scalars, z, g, n)
        )
        z_z = extf.h_sub(extf.h_pow(z, n), extf.H_ONE)
        ok = c_z == extf.h_mul(q_z, z_z)
    else:
        c_z = (
            air.constraint_at(t_scalars, z, g, n, alphas)
            if nc > 1 else air.constraint_at(t_scalars, z, g, n)
        )
        ok = c_z == q_z * domain.eval_vanishing(z) % P
    if not ok:
        raise ValueError("Constraint check at z failed — invalid trace")

    # ── proof assembly (host int math mirrors prover.py) ──────────────────
    half0 = N // 2
    trace_idx, deep_idx = [], []
    for qi in query_indices:
        trace_idx += [(qi + s * blowup) % N for s in range(ns)]
        deep_idx += [qi, qi + half0]
    quot_idx = list(query_indices)
    fri_idx = []
    cur = list(query_indices)
    for s in fns["fri_sizes"]:
        half = s // 2
        cur = [i % half for i in cur]
        fri_idx.append([v for i in cur for v in (i, i + half)])

    all_idx = [trace_idx, quot_idx, deep_idx] + fri_idx
    done = []
    for t, idx, (vals, paths, salts) in zip(fns["gspec"], all_idx, parts):
        done.append((vals, openings_from_paths(idx, paths, t["depth"],
                                               hash_kind), salts))
    tr_vals, tr_proofs, tr_salts = done[0]
    q_vals, q_proofs, q_salts = done[1]
    d_vals, d_proofs, d_salts = done[2]
    fri_done = done[3:]

    def mk_open(indices, vals, proofs, salts_np, j):
        salt = b"".join(int(w).to_bytes(4, "big") for w in salts_np[j])
        v = vals[j]
        value = tuple(int(x) for x in v) if np.ndim(v) else int(v)
        return MerkleOpening(indices[j], value, proofs[j], salt)

    query_proofs = []
    for q, qi in enumerate(query_indices):
        fri_openings = []
        for li in range(1, num_folds):
            vals, proofs, g_salts = fri_done[li - 1]
            fri_openings.append(
                (mk_open(fri_idx[li - 1], vals, proofs, g_salts, 2 * q),
                 mk_open(fri_idx[li - 1], vals, proofs, g_salts, 2 * q + 1))
            )
        qp = dict(
            index=qi,
            deep_opening=mk_open(deep_idx, d_vals, d_proofs, d_salts, 2 * q),
            deep_opening_pair=mk_open(deep_idx, d_vals, d_proofs, d_salts, 2 * q + 1),
            quotient_opening=mk_open(quot_idx, q_vals, q_proofs, q_salts, q),
            fri_openings=fri_openings,
        )
        trace_ops = [
            mk_open(trace_idx, tr_vals, tr_proofs, tr_salts, ns * q + s)
            for s in range(ns)
        ]
        if multi:
            qp.update(
                trace_opening=None, trace_opening_g=None,
                trace_opening_gg=None, trace_openings=trace_ops,
            )
        else:
            qp.update(
                trace_opening=trace_ops[0],
                trace_opening_g=trace_ops[1],
                trace_opening_gg=trace_ops[2],
            )
        query_proofs.append(QueryProof(**qp))

    common = dict(
        trace_len=n, lde_size=N,
        trace_commitment=trace_root,
        quotient_commitment=quotient_root,
        q_z=q_z,
        fri_commitments=fri_commitments,
        fri_final_layer=fri_final_layer,
        query_proofs=query_proofs,
        ext=ext,
        hash=hash_kind,
    )
    if multi:
        return StarkProof(
            t_z=None, t_gz=None, t_ggz=None,
            ood_trace=ood_trace, num_columns=k, num_shifts=ns, **common,
        )
    return StarkProof(
        t_z=ood_scalars[0], t_gz=ood_scalars[1], t_ggz=ood_scalars[2],
        **common,
    )


class FusedStarkProver:
    """Drop-in StarkProver that runs the whole proof in one device dispatch
    (every protocol mode; byte-identical proofs for equal seeds)."""

    def __init__(
        self,
        trace: ExecutionTrace,
        air: Air | None = None,
        config: StarkConfig = DEFAULT_CONFIG,
        seed: int | None = None,
    ):
        self.trace = trace
        self.air = air or _DEFAULT_AIR
        self.config = config
        self.rng = np.random.default_rng(seed)

    def generate_proof(self) -> StarkProof:
        cfg = self.config
        n = self.trace.num_rows
        N = n * cfg.blowup
        B = cfg.blowup
        m = cfg.mask_degree
        ext = cfg.ext_challenges
        k = getattr(self.air, "num_columns", 1)
        nc = getattr(self.air, "num_constraints", 1)
        ns = self.air.num_shifts
        final_size = cfg.final_layer_size(n)
        assert len(self.trace.columns) == k, (
            f"AIR declares {k} columns, trace has {len(self.trace.columns)}"
        )
        fns = _fused_fns(
            n, N, n + m, B, cfg.coset_shift, self.air, final_size,
            cfg.num_queries, k, nc, ns, ext, cfg.hash,
        )
        num_folds = fns["num_folds"]
        multi = fns["multi"]

        with profiling.phase("fused_prove"):
            # randomness in StarkProver's exact draw order
            r_masks = jnp.asarray(
                self.rng.integers(
                    0, P, (k, m) if multi else m, dtype=np.uint64
                ).astype(np.uint32).reshape(k, m)
            )
            salt_keys = jnp.asarray(np.array(
                [_draw_key(self.rng) for _ in range(2 + num_folds)], np.uint32
            ))
            trace_cols = jnp.asarray(
                np.stack(self.trace.columns).astype(np.uint32)
            )
            # trace under chunked SHA compression: the unrolled form
            # makes this whole-proof program exceed the remote compile
            # helper's memory (~14 MB MLIR -> SIGKILL); chunked compiles
            # AND wins end-to-end (see sha_forced_rolled)
            with sha_forced_rolled():
                out = fns["prove"](trace_cols, r_masks, salt_keys,
                                   fns["tables"])
            out_np = {key: np.asarray(v) for key, v in out.items()}

        return _assemble_proof(
            self.air, n, N, B, k, nc, ns, ext, fns, out_np, cfg.hash
        )


class FusedBatchStarkProver:
    """B proofs in ONE device dispatch: the fused program vmapped over a
    batch of traces (same AIR/shape, independent seeds). Each proof is
    byte-identical to FusedStarkProver/StarkProver with the same seed —
    the transcript while_loops vectorize with per-lane masking, so every
    proof's ratchet count stays exact. The batched analog of
    batch.BatchStarkProver with zero transcript round trips."""

    def __init__(
        self,
        traces: list,
        air: Air | None = None,
        config: StarkConfig = DEFAULT_CONFIG,
        seeds: list | None = None,
    ):
        self.traces = traces
        self.air = air or _DEFAULT_AIR
        self.config = config
        if seeds is None:
            seeds = [None] * len(traces)
        assert len(seeds) == len(traces)
        self.rngs = [np.random.default_rng(s) for s in seeds]

    def generate_proofs(self) -> list:
        cfg = self.config
        nb = len(self.traces)
        n = self.traces[0].num_rows
        N = n * cfg.blowup
        m = cfg.mask_degree
        ext = cfg.ext_challenges
        k = getattr(self.air, "num_columns", 1)
        nc = getattr(self.air, "num_constraints", 1)
        ns = self.air.num_shifts
        fns = _fused_fns(
            n, N, n + m, cfg.blowup, cfg.coset_shift, self.air,
            cfg.final_layer_size(n), cfg.num_queries, k, nc, ns, ext,
            cfg.hash,
        )
        multi = fns["multi"]
        num_keys = 2 + fns["num_folds"]

        def keys_for(rng):
            return [_draw_key(rng) for _ in range(num_keys)]

        with profiling.phase("fused_prove_batch"):
            r_masks = jnp.asarray(np.stack([
                rng.integers(0, P, (k, m) if multi else m, dtype=np.uint64)
                .astype(np.uint32).reshape(k, m)
                for rng in self.rngs
            ]))
            salt_keys = jnp.asarray(
                np.array([keys_for(rng) for rng in self.rngs], np.uint32)
            )
            trace_cols = jnp.asarray(np.stack([
                np.stack(t.columns).astype(np.uint32) for t in self.traces
            ]))
            if "prove_batch" not in fns:
                fns["prove_batch"] = jax.jit(
                    jax.vmap(fns["prove_raw"], in_axes=(0, 0, 0, None))
                )
            with sha_forced_rolled():
                out = fns["prove_batch"](
                    trace_cols, r_masks, salt_keys, fns["tables"]
                )
            out_np = {key: np.asarray(v) for key, v in out.items()}

        return [
            _assemble_proof(
                self.air, n, N, cfg.blowup, k, nc, ns, ext, fns,
                {key: v[b] for key, v in out_np.items()}, cfg.hash,
            )
            for b in range(nb)
        ]
