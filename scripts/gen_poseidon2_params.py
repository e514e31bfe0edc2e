"""Deterministic Poseidon2-over-BabyBear parameter generation.

Writes ``toyni_tpu/field/poseidon2_params.py``: the round constants and the
internal-round diagonal for the width-16, x^7 Poseidon2 permutation used by
the framework's arithmetic-hash Merkle mode (``StarkConfig(hash="poseidon2")``).

Everything is derived from a fixed public seed string via a SHA-256
counter-mode XOF with rejection sampling below p — a nothing-up-my-sleeve
construction in the spirit of the Poseidon reference implementation's Grain
LFSR (the exact generator is a domain-separation detail; security rests on
the constants being fixed, public, and structure-free). Re-running this
script reproduces the checked-in table byte-for-byte.

Parameter choices (Poseidon2 paper, Grassi-Khovratovich-Schofnegger 2023,
"Poseidon2: A Faster Version of the Poseidon Hash Function"):

- t = 16 lanes over BabyBear (p = 2^31 - 2^27 + 1), S-box x^7
  (gcd(7, p-1) = 1 since p-1 = 2^27 * 3 * 5, so x^7 is a permutation).
- R_F = 8 external (full) rounds, R_P = 13 internal (partial) rounds — the
  paper's numbers for 31-bit fields at t in {16, 24}, alpha = 7, 128-bit
  security margin; the same (8, 13) schedule production BabyBear STARKs ship.
- External matrix M_E = circ(2*M4, M4, M4, M4) with
  M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]] (paper section 5.1) —
  purely structural, nothing to generate.
- Internal matrix M_I: 1 everywhere, mu_i on the diagonal. The mu_i are
  sampled from the XOF and accepted only if the characteristic polynomial of
  M_I is IRREDUCIBLE over F_p (computed exactly below via the rank-1-update
  closed form). Irreducibility implies M_I has no proper invariant subspace,
  the condition the paper imposes to rule out infinitely-long subspace
  trails through the partial rounds (paper section 5.3 / Grassi et al.
  "Proving Resistance Against Infinitely Long Subspace Trails").

Run: python scripts/gen_poseidon2_params.py
"""

from __future__ import annotations

import hashlib
import os

P = 2013265921
T = 16
ALPHA = 7
R_F = 8  # external rounds (R_F/2 before + R_F/2 after the internal block)
R_P = 13  # internal rounds

SEED = b"toyni-tpu poseidon2 babybear t16 a7 v1"


def xof(tag: bytes):
    """SHA-256 counter-mode XOF over SEED || tag, yielding u32 samples."""
    ctr = 0
    while True:
        h = hashlib.sha256(SEED + b"|" + tag + b"|" + ctr.to_bytes(8, "little")).digest()
        for i in range(0, 32, 4):
            yield int.from_bytes(h[i : i + 4], "little")
        ctr += 1


def field_samples(tag: bytes):
    """Rejection-sample uniform field elements (< p) from the XOF."""
    for v in xof(tag):
        if v < P:
            yield v


# ── exact polynomial arithmetic over F_p ─────────────────────────────────────

def poly_mulmod(a, b, f):
    """(a * b) mod f over F_p; f monic, coefficient lists lowest-first."""
    deg_f = len(f) - 1
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                out[i + j] = (out[i + j] + ai * bj) % P
    # reduce mod f (monic)
    for i in range(len(out) - 1, deg_f - 1, -1):
        c = out[i]
        if c:
            out[i] = 0
            for j in range(deg_f):
                out[i - deg_f + j] = (out[i - deg_f + j] - c * f[j]) % P
    return out[:deg_f]


def poly_powmod_xp(e, f):
    """x^e mod f via square-and-multiply in F_p[x]/(f)."""
    result = [1]
    base = [0, 1]
    while e:
        if e & 1:
            result = poly_mulmod(result, base, f)
        base = poly_mulmod(base, base, f)
        e >>= 1
    return result


def poly_gcd(a, b):
    a, b = list(a), list(b)

    def trim(v):
        while v and v[-1] == 0:
            v.pop()
        return v

    a, b = trim(a), trim(b)
    while b:
        # a mod b
        inv_lead = pow(b[-1], P - 2, P)
        while len(a) >= len(b) and a:
            c = a[-1] * inv_lead % P
            shift = len(a) - len(b)
            for j in range(len(b)):
                a[shift + j] = (a[shift + j] - c * b[j]) % P
            a = trim(a)
        a, b = b, a
    return a


def is_irreducible(f):
    """Rabin test: f (monic, degree t) is irreducible over F_p iff
    x^(p^t) = x mod f and gcd(x^(p^(t/q)) - x, f) = 1 for every prime q | t."""
    t = len(f) - 1
    xq = poly_powmod_xp(pow(P, t), f)
    # x^(p^t) - x must be 0 mod f
    diff = list(xq) + [0] * (t - len(xq))
    diff[1] = (diff[1] - 1) % P
    if any(diff):
        return False
    for q in {2}:  # prime factors of t = 16
        d = t // q
        xd = poly_powmod_xp(pow(P, d), f)
        g = list(xd) + [0] * (t - len(xd))
        g[1] = (g[1] - 1) % P
        if len(poly_gcd(g, f)) != 1:  # gcd must be a unit
            return False
    return True


def char_poly_internal(mu):
    """Characteristic polynomial of M_I (1s off-diagonal, mu_i diagonal).

    M_I = diag(a_i) + 1*1^T with a_i = mu_i - 1, so by the rank-1 update:
    det(xI - M_I) = prod(x - a_i) - sum_j prod_{i != j}(x - a_i).
    Coefficients lowest-first, monic.
    """
    a = [(m - 1) % P for m in mu]
    # prod(x - a_i)
    prod = [1]
    for ai in a:
        nxt = [0] * (len(prod) + 1)
        for i, c in enumerate(prod):
            nxt[i + 1] = (nxt[i + 1] + c) % P
            nxt[i] = (nxt[i] - c * ai) % P
        prod = nxt
    # sum_j prod_{i != j}(x - a_i): each cofactor product built directly
    # (t is small; O(t^3) exact-int work is fine)
    total = [0] * (len(prod) - 1)
    for j in range(len(a)):
        pj = [1]
        for i, ai in enumerate(a):
            if i == j:
                continue
            nxt = [0] * (len(pj) + 1)
            for k, c in enumerate(pj):
                nxt[k + 1] = (nxt[k + 1] + c) % P
                nxt[k] = (nxt[k] - c * ai) % P
            pj = nxt
        pj = pj + [0] * (len(total) - len(pj))
        total = [(t + c) % P for t, c in zip(total, pj)]
    f = [(c - s) % P for c, s in zip(prod, total + [0])]
    return f


def gen_internal_diag():
    """Sample diagonal entries until the char poly of M_I is irreducible."""
    src = field_samples(b"internal-diag")
    attempt = 0
    while True:
        mu = [next(src) for _ in range(T)]
        f = char_poly_internal(mu)
        assert f[-1] == 1  # monic
        if is_irreducible(f):
            return mu, attempt
        attempt += 1


def main():
    rc_src = field_samples(b"round-constants")
    # external rounds use T constants each, internal rounds 1 (lane 0)
    rc_external = [[next(rc_src) for _ in range(T)] for _ in range(R_F)]
    rc_internal = [next(rc_src) for _ in range(R_P)]
    mu, attempts = gen_internal_diag()

    out = os.path.join(
        os.path.dirname(__file__), "..", "toyni_tpu", "field",
        "poseidon2_params.py",
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Poseidon2-over-BabyBear parameters — GENERATED FILE.\n\n'
            "Produced by scripts/gen_poseidon2_params.py (deterministic; see\n"
            "that script for the construction, citations, and the internal-\n"
            "matrix irreducibility check). Do not edit by hand.\n"
            '"""\n\n'
        )
        fh.write(f"P = {P}\n")
        fh.write(f"T = {T}\n")
        fh.write(f"ALPHA = {ALPHA}\n")
        fh.write(f"R_F = {R_F}\n")
        fh.write(f"R_P = {R_P}\n")
        fh.write(f"SEED = {SEED!r}\n")
        fh.write(f"DIAG_ATTEMPTS = {attempts}  # rejected diagonals before the irreducible one\n\n")
        fh.write("RC_EXTERNAL = (\n")
        for row in rc_external:
            fh.write(f"    {tuple(row)},\n")
        fh.write(")\n\n")
        fh.write(f"RC_INTERNAL = {tuple(rc_internal)}\n\n")
        fh.write(f"MU_INTERNAL = {tuple(mu)}\n")
    print(f"wrote {os.path.normpath(out)} (diag attempts: {attempts})")

    # the same tables as a C header for the native host verifier
    hdr = os.path.join(
        os.path.dirname(__file__), "..", "toyni_tpu", "native",
        "poseidon2_params.h",
    )
    with open(hdr, "w") as fh:
        fh.write("// Poseidon2-over-BabyBear parameters — GENERATED FILE.\n")
        fh.write("// Produced by scripts/gen_poseidon2_params.py; the Python\n")
        fh.write("// twin is toyni_tpu/field/poseidon2_params.py.\n\n")
        fh.write(f"static const int P2_T = {T};\n")
        fh.write(f"static const int P2_RF = {R_F};\n")
        fh.write(f"static const int P2_RP = {R_P};\n")
        fh.write(f"static const uint64_t P2_RC_EXT[{R_F}][{T}] = {{\n")
        for row in rc_external:
            fh.write("    {" + ", ".join(str(c) for c in row) + "},\n")
        fh.write("};\n")
        fh.write(
            f"static const uint64_t P2_RC_INT[{R_P}] = {{"
            + ", ".join(str(c) for c in rc_internal) + "};\n"
        )
        fh.write(
            f"static const uint64_t P2_MU[{T}] = {{"
            + ", ".join(str(m) for m in mu) + "};\n"
        )
    print(f"wrote {os.path.normpath(hdr)}")


if __name__ == "__main__":
    main()
