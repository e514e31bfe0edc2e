"""STARK verifier — deliberately host-side and scalar.

A line-by-line behavioral port of the reference verifier
(reference: src/verifier.rs:14-232): replays the Fiat-Shamir transcript,
checks the OOD constraint identity, FRI final-layer constancy + commitment,
per-query Merkle openings, DEEP reconstruction, and the complete fold chain.
It runs in exact Python-int arithmetic with hashlib SHA-256 — the
bit-exactness oracle for the whole device pipeline, and cheap enough that
keeping it off-device is the right architecture (the reference's verifier is
likewise pure host code with no device boundary).
"""

from __future__ import annotations


from .air import Air, FibonacciAir
from .config import DEFAULT_CONFIG, StarkConfig
from .field import ext as extf
from .field.babybear import P
from .merkle import host_tree_root, verify_merkle_proof
from .proof import MerkleOpening, StarkProof
from .transcript import Transcript, derive_z, derive_z_ext


def _value_bytes(value) -> bytes:
    """Leaf value encoding: 8-byte LE base scalar, or 32-byte LE ext scalar
    (4 x 8-byte limbs, src/ext.rs:81-89) in the ext-challenges mode."""
    if isinstance(value, tuple):
        return extf.h_to_bytes(value)
    return int(value).to_bytes(8, "little")


def _value_elems(value) -> list:
    """Leaf value as field elements (the Poseidon2 leaf-sponge encoding):
    a base scalar is one element, an ext/multi-column tuple its limb list."""
    return list(value) if isinstance(value, tuple) else [value]


def _verify_opening(
    opening: MerkleOpening, root: bytes,
    expected_index: int = None, tree_size: int = None,
    kind: str = "sha256",
) -> bool:
    """Leaf = salt || value bytes (src/verifier.rs:235-238); in the
    Poseidon2 mode, leaf = sponge(salt elems || value elems)
    (field/poseidon2.py).

    POSITION BINDING (stricter than the reference): the path's position flags
    are the binary expansion of the leaf index (LSB-first), so they must
    encode exactly `expected_index`, and the path must span the full tree
    depth. Without this, the flags — not the stored index — decide which
    committed position the path proves, and a malicious prover could answer
    query i with the committed value at a position of its own choosing,
    voiding FRI's random spot-checking. (The stored `opening.index` is also
    pinned, making proof bytes non-malleable.)"""
    if expected_index is not None:
        if opening.index != expected_index:
            return False
        for l, flag in enumerate(opening.proof.position):
            if flag != bool((expected_index >> l) & 1):
                return False
    if tree_size is not None:
        if len(opening.proof.path) != (tree_size - 1).bit_length():
            return False
    if kind != "sha256":
        from .field import poseidon2 as p2

        if len(opening.salt) not in (0, 16):
            return False
        salt_elems = p2.salt_to_elems(opening.salt) if opening.salt else ()
        if any(v >= P for v in salt_elems):
            return False
        leaf = p2.h_leaf_digest(salt_elems, _value_elems(opening.value))
        return p2.verify_merkle_proof(
            leaf, opening.proof.path, opening.proof.position, root
        )
    leaf = opening.salt + _value_bytes(opening.value)
    return verify_merkle_proof(leaf, opening.proof, root)


def _unsalted_root(values, kind: str = "sha256") -> bytes:
    """Recompute the unsalted final-layer root (src/verifier.rs:241-244)."""
    if kind != "sha256":
        from .field import poseidon2 as p2

        leaves = [p2.h_hash_elems(_value_elems(v)) for v in values]
        return p2.digest_to_bytes(p2.h_tree_root(leaves))
    return host_tree_root([_value_bytes(v) for v in values])


class _BaseOps:
    """Scalar field shim: the per-query algebra is written once over these
    and instantiated for F_p (reference protocol) or F_p^4 (ext mode)."""

    @staticmethod
    def lift(v: int):  # base opening value -> field element
        return v % P
    add = staticmethod(lambda a, b: (a + b) % P)
    sub = staticmethod(lambda a, b: (a - b) % P)
    mul = staticmethod(lambda a, b: a * b % P)
    mul_base = staticmethod(lambda a, s: a * s % P)
    inv = staticmethod(lambda a: pow(a, P - 2, P))
    is_tuple = False


class _ExtOps:
    lift = staticmethod(extf.h_from_base)
    add = staticmethod(extf.h_add)
    sub = staticmethod(extf.h_sub)
    mul = staticmethod(extf.h_mul)
    mul_base = staticmethod(extf.h_mul_base)
    inv = staticmethod(extf.h_inv)
    is_tuple = True


class StarkVerifier:
    def __init__(self, air: Air | None = None, config: StarkConfig = DEFAULT_CONFIG):
        self.air = air or FibonacciAir()
        self.config = config

    def verify(self, proof: StarkProof) -> bool:
        cfg = self.config
        n = proof.trace_len
        N = proof.lde_size

        # Sanity: lde_size must equal trace_len * blowup (verifier.rs:19-21)
        if N != n * cfg.blowup:
            return False

        # the proof's field mode must match the configured protocol
        ext = cfg.ext_challenges
        if bool(proof.ext) != bool(ext):
            return False
        # the proof's commitment hash must match the configured backend
        hk = cfg.hash
        if proof.hash != hk:
            return False
        ops = _ExtOps if ext else _BaseOps

        # generic multi-column / multi-constraint AIRs use the v3/v4 shape
        k = getattr(self.air, "num_columns", 1)
        nc = getattr(self.air, "num_constraints", 1)
        ns = self.air.num_shifts
        multi = k > 1 or nc > 1 or ns != 3
        if multi:
            if proof.ood_trace is None:
                return False
            if proof.num_columns != k or proof.num_shifts != ns:
                return False
            if len(proof.ood_trace) != ns or any(
                not (isinstance(r, tuple) and len(r) == k)
                for r in proof.ood_trace
            ):
                return False
            if ext:
                # every OOD value (and q_z) must be a 4-limb ext scalar
                vals = [v for r in proof.ood_trace for v in r] + [proof.q_z]
                for v in vals:
                    if not (isinstance(v, tuple) and len(v) == 4):
                        return False
        else:
            if proof.ood_trace is not None:
                return False
            if ext:
                # structural validation: OOD scalars are 4-limb ext values
                for v in (proof.t_z, proof.t_gz, proof.t_ggz, proof.q_z):
                    if not (isinstance(v, tuple) and len(v) == 4):
                        return False

        from .field.babybear import get_root_of_unity

        log_n = n.bit_length() - 1
        log_N = N.bit_length() - 1
        g = get_root_of_unity(log_n)
        omega_N = get_root_of_unity(log_N)
        shift = cfg.coset_shift

        # ── 1. replay Fiat-Shamir transcript (verifier.rs:31-41) ──────────
        transcript = Transcript()
        transcript.absorb_commitment(proof.trace_commitment)
        alphas = ()
        if multi and nc > 1:
            # constraint-composition challenges, squeezed from the trace root
            alphas = tuple(transcript.squeeze_challenge() for _ in range(nc))
        transcript.absorb_commitment(proof.quotient_commitment)
        if multi:
            if ext:
                z = derive_z_ext(transcript, N, shift)
                for row in proof.ood_trace:
                    for v in row:
                        transcript.absorb_ext(v)
                transcript.absorb_ext(proof.q_z)
            else:
                z = derive_z(transcript, N, shift)
                for row in proof.ood_trace:
                    for v in row:
                        transcript.absorb_field(v)
                transcript.absorb_field(proof.q_z)
        elif ext:
            z = derive_z_ext(transcript, N, shift)
            for v in (proof.t_z, proof.t_gz, proof.t_ggz, proof.q_z):
                transcript.absorb_ext(v)
        else:
            z = derive_z(transcript, N, shift)
            for v in (proof.t_z, proof.t_gz, proof.t_ggz, proof.q_z):
                transcript.absorb_field(v)

        # ── 2. OOD constraint check: C(z) = Q(z) * Z(z) (verifier.rs:43-49)
        if multi:
            t_scalars = [
                proof.ood_trace[s] if k > 1 else proof.ood_trace[s][0]
                for s in range(ns)
            ]
            if ext:
                if nc > 1:
                    c_z = self.air.constraint_at_ext(t_scalars, z, g, n, alphas)
                else:
                    c_z = self.air.constraint_at_ext(t_scalars, z, g, n)
                z_z = extf.h_sub(extf.h_pow(z, n), extf.H_ONE)
            else:
                if nc > 1:
                    c_z = self.air.constraint_at(t_scalars, z, g, n, alphas)
                else:
                    c_z = self.air.constraint_at(t_scalars, z, g, n)
                z_z = (pow(z, n, P) - 1) % P
        elif ext:
            c_z = self.air.constraint_at_ext(
                [proof.t_z, proof.t_gz, proof.t_ggz], z, g, n
            )
            z_z = extf.h_sub(extf.h_pow(z, n), extf.H_ONE)
        else:
            c_z = self.air.constraint_at(
                [proof.t_z, proof.t_gz, proof.t_ggz], z, g, n
            )
            z_z = (pow(z, n, P) - 1) % P  # vanishing poly of the trace domain
        if c_z != ops.mul(proof.q_z, z_z):
            return False

        # ── 3. FRI schedule checks (verifier.rs:51-79) ────────────────────
        if not proof.fri_commitments:
            return False
        final_size = cfg.final_layer_size(n)
        expected_folds = (N // final_size).bit_length() - 1
        if len(proof.fri_commitments) != expected_folds + 1:
            return False
        if len(proof.fri_final_layer) != final_size:
            return False
        # final layer constant (degree 0) — this enforces the degree bound
        if any(v != proof.fri_final_layer[0] for v in proof.fri_final_layer):
            return False
        # final layer binds to its commitment
        if _unsalted_root(proof.fri_final_layer, hk) != proof.fri_commitments[-1]:
            return False

        transcript.absorb_commitment(proof.fri_commitments[0])
        fri_betas = []
        for i in range(1, len(proof.fri_commitments)):
            fri_betas.append(
                transcript.squeeze_ext_challenge() if ext
                else transcript.squeeze_challenge()
            )
            transcript.absorb_commitment(proof.fri_commitments[i])

        # ── 4. re-derive query indices (verifier.rs:92-98) ────────────────
        half0 = N // 2
        query_indices = transcript.squeeze_indices(cfg.num_queries, half0)
        if len(proof.query_proofs) != cfg.num_queries:
            return False

        # ── 5. shifted-domain x-lookups (verifier.rs:100-102). The reference
        # materializes all N elements; only ~queries*log(N) positions are
        # ever read, so compute x_i = shift * omega^i on demand.
        def shifted_element(i: int) -> int:
            return shift * pow(omega_N, i, P) % P

        half_inv = (P + 1) // 2

        # ── 6. per-query checks (verifier.rs:105-229) ─────────────────────
        for qi, qp in zip(query_indices, proof.query_proofs):
            if qp.index != qi:
                return False
            if len(qp.fri_openings) != expected_folds - 1:
                return False

            # 6a. trace openings: one Merkle proof per shift + index algebra
            if multi:
                if qp.trace_openings is None or len(qp.trace_openings) != ns:
                    return False
                t_opens = []
                for s, op in enumerate(qp.trace_openings):
                    v = op.value if isinstance(op.value, tuple) else (op.value,)
                    if len(v) != k:
                        return False
                    if not _verify_opening(op, proof.trace_commitment,
                                           (qi + s * cfg.blowup) % N, N, hk):
                        return False
                    t_opens.append(v)
            else:
                for s, op in enumerate((qp.trace_opening, qp.trace_opening_g,
                                        qp.trace_opening_gg)):
                    if not _verify_opening(op, proof.trace_commitment,
                                           (qi + s * cfg.blowup) % N, N, hk):
                        return False

            # 6b. quotient opening
            if not _verify_opening(qp.quotient_opening,
                                   proof.quotient_commitment, qi, N, hk):
                return False

            # 6c. DEEP layer openings
            if not _verify_opening(qp.deep_opening, proof.fri_commitments[0],
                                   qi, N, hk):
                return False
            if not _verify_opening(qp.deep_opening_pair,
                                   proof.fri_commitments[0], qi + half0, N,
                                   hk):
                return False

            # 6d. DEEP reconstruction from opened + OOD values
            x_i = shifted_element(qi)
            inv_x_minus_z = ops.inv(ops.sub(ops.lift(x_i), z))
            if multi:
                num = ops.sub(ops.lift(qp.quotient_opening.value), proof.q_z)
                for s in range(ns):
                    for c in range(k):
                        num = ops.add(
                            num,
                            ops.sub(
                                ops.lift(t_opens[s][c]),
                                proof.ood_trace[s][c],
                            ),
                        )
            else:
                num = ops.add(
                    ops.add(
                        ops.sub(ops.lift(qp.quotient_opening.value), proof.q_z),
                        ops.sub(ops.lift(qp.trace_opening_gg.value), proof.t_ggz),
                    ),
                    ops.add(
                        ops.sub(ops.lift(qp.trace_opening_g.value), proof.t_gz),
                        ops.sub(ops.lift(qp.trace_opening.value), proof.t_z),
                    ),
                )
            expected_deep = ops.mul(num, inv_x_minus_z)
            if qp.deep_opening.value != expected_deep:
                return False

            # 6e. first fold: layer 0 -> 1
            a0, b0 = qp.deep_opening.value, qp.deep_opening_pair.value
            x0 = x_i
            avg = ops.mul_base(ops.add(a0, b0), half_inv)
            diff = ops.mul_base(ops.sub(a0, b0), half_inv)
            prev_folded = ops.add(
                avg,
                ops.mul_base(ops.mul(diff, fri_betas[0]), pow(x0, P - 2, P)),
            )

            # 6f. intermediate layers
            pos = qi
            for layer, (op, op_pair) in enumerate(qp.fri_openings):
                fold_k = layer + 1
                layer_size = N >> fold_k
                half = layer_size // 2
                lo = pos % half
                in_first_half = pos == lo

                if not _verify_opening(op, proof.fri_commitments[fold_k],
                                       lo, layer_size, hk):
                    return False
                if not _verify_opening(op_pair, proof.fri_commitments[fold_k],
                                       lo + half, layer_size, hk):
                    return False

                if in_first_half:
                    if op.value != prev_folded:
                        return False
                elif op_pair.value != prev_folded:
                    return False

                x = pow(shifted_element(lo), 1 << fold_k, P)
                a_l, b_l = op.value, op_pair.value
                avg = ops.mul_base(ops.add(a_l, b_l), half_inv)
                diff = ops.mul_base(ops.sub(a_l, b_l), half_inv)
                prev_folded = ops.add(
                    avg,
                    ops.mul_base(
                        ops.mul(diff, fri_betas[fold_k]), pow(x, P - 2, P)
                    ),
                )
                pos = lo

            # 6g. land on the final layer
            if proof.fri_final_layer[pos] != prev_folded:
                return False

        return True
