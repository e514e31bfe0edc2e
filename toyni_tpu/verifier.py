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
from .field.babybear import P
from .merkle import host_tree_root, verify_merkle_proof
from .proof import MerkleOpening, StarkProof
from .transcript import Transcript, derive_z


def _verify_opening(opening: MerkleOpening, root: bytes) -> bool:
    """Leaf = salt || value8LE (src/verifier.rs:235-238)."""
    leaf = opening.salt + int(opening.value).to_bytes(8, "little")
    return verify_merkle_proof(leaf, opening.proof, root)


def _unsalted_root(values) -> bytes:
    """Recompute the unsalted final-layer root (src/verifier.rs:241-244)."""
    return host_tree_root([int(v).to_bytes(8, "little") for v in values])


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

        from .field.babybear import get_root_of_unity

        log_n = n.bit_length() - 1
        log_N = N.bit_length() - 1
        g = get_root_of_unity(log_n)
        omega_N = get_root_of_unity(log_N)
        shift = cfg.coset_shift

        # ── 1. replay Fiat-Shamir transcript (verifier.rs:31-41) ──────────
        transcript = Transcript()
        transcript.absorb_commitment(proof.trace_commitment)
        transcript.absorb_commitment(proof.quotient_commitment)
        z = derive_z(transcript, N, shift)
        for v in (proof.t_z, proof.t_gz, proof.t_ggz, proof.q_z):
            transcript.absorb_field(v)

        # ── 2. OOD constraint check: C(z) = Q(z) * Z(z) (verifier.rs:43-49)
        c_z = self.air.constraint_at([proof.t_z, proof.t_gz, proof.t_ggz], z, g, n)
        z_z = (pow(z, n, P) - 1) % P  # vanishing poly of the standard trace domain
        if c_z != proof.q_z * z_z % P:
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
        if _unsalted_root(proof.fri_final_layer) != proof.fri_commitments[-1]:
            return False

        transcript.absorb_commitment(proof.fri_commitments[0])
        fri_betas = []
        for i in range(1, len(proof.fri_commitments)):
            fri_betas.append(transcript.squeeze_challenge())
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

            # 6a. trace openings: 3 Merkle proofs + index algebra
            for op in (qp.trace_opening, qp.trace_opening_g, qp.trace_opening_gg):
                if not _verify_opening(op, proof.trace_commitment):
                    return False
            if (
                qp.trace_opening.index != qi
                or qp.trace_opening_g.index != (qi + cfg.blowup) % N
                or qp.trace_opening_gg.index != (qi + 2 * cfg.blowup) % N
            ):
                return False

            # 6b. quotient opening
            if not _verify_opening(qp.quotient_opening, proof.quotient_commitment):
                return False

            # 6c. DEEP layer openings
            if not _verify_opening(qp.deep_opening, proof.fri_commitments[0]):
                return False
            if not _verify_opening(qp.deep_opening_pair, proof.fri_commitments[0]):
                return False

            # 6d. DEEP reconstruction from opened + OOD values
            x_i = shifted_element(qi)
            inv_x_minus_z = pow((x_i - z) % P, P - 2, P)
            expected_deep = (
                (qp.quotient_opening.value - proof.q_z)
                + (qp.trace_opening_gg.value - proof.t_ggz)
                + (qp.trace_opening_g.value - proof.t_gz)
                + (qp.trace_opening.value - proof.t_z)
            ) % P * inv_x_minus_z % P
            if qp.deep_opening.value != expected_deep:
                return False

            # 6e. first fold: layer 0 -> 1
            a0, b0 = qp.deep_opening.value, qp.deep_opening_pair.value
            x0 = x_i
            avg = (a0 + b0) * half_inv % P
            diff = (a0 - b0) * half_inv % P
            prev_folded = (avg + diff * fri_betas[0] % P * pow(x0, P - 2, P)) % P

            # 6f. intermediate layers
            pos = qi
            for layer, (op, op_pair) in enumerate(qp.fri_openings):
                fold_k = layer + 1
                layer_size = N >> fold_k
                half = layer_size // 2
                lo = pos % half
                in_first_half = pos == lo

                if not _verify_opening(op, proof.fri_commitments[fold_k]):
                    return False
                if not _verify_opening(op_pair, proof.fri_commitments[fold_k]):
                    return False

                if in_first_half:
                    if op.value != prev_folded:
                        return False
                elif op_pair.value != prev_folded:
                    return False

                x = pow(shifted_element(lo), 1 << fold_k, P)
                a_l, b_l = op.value, op_pair.value
                avg = (a_l + b_l) * half_inv % P
                diff = (a_l - b_l) * half_inv % P
                prev_folded = (
                    avg + diff * fri_betas[fold_k] % P * pow(x, P - 2, P)
                ) % P
                pos = lo

            # 6g. land on the final layer
            if proof.fri_final_layer[pos] != prev_folded:
                return False

        return True
