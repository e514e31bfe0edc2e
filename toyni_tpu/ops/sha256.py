"""Batched SHA-256 for TPU: thousands of independent messages hashed in
parallel over uint32 VPU lanes.

The reference hashes leaves/nodes one at a time through the `sha2` crate
(reference: src/merkle.rs:105-123, src/lib.rs:14-18). A single SHA-256
compression is serial by construction, so the TPU win is batching: every
Merkle level hashes all its nodes simultaneously — state is a ``(..., 8)``
uint32 array, one message per lane, and the 64 rounds are an unrolled
elementwise program (rotations = shift+or, adds = native uint32 wraparound).

Message formats are the three fixed shapes of the protocol:
  * salted leaf    SHA256(0x00 || salt16 || value8LE)   — 25 B, one block
  * unsalted leaf  SHA256(0x00 || value8LE)             —  9 B, one block
  * inner node     SHA256(0x01 || left32 || right32)    — 65 B, two blocks
(leaf/node domain tags: src/merkle.rs:105-123; salted/unsalted leaf
encodings: src/fibonacci.rs:340-363).

Digests are carried as ``(..., 8)`` uint32 big-endian words; `digest_bytes` /
`words_from_bytes` convert at the host boundary.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_U32 = jnp.uint32
_U8 = jnp.uint8

# FIPS 180-4 constants.
_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
], dtype=np.uint32)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


# ── constant-aware word arithmetic ──────────────────────────────────────────
# The protocol's messages are mostly padding: a 25-byte salted leaf has 10
# constant block words, the node hash's second block has 15. Carrying those
# words as PYTHON INTS through the schedule lets the expansion fold at trace
# time — every schedule word whose inputs are all constants costs zero device
# ops, and a constant w_t folds into the round constant K[t]. The helpers
# below operate on (array | int) operands and collapse to ints when possible;
# arithmetic is identical to the array path (mod-2^32 adds, rotations), so
# digests are byte-identical.

def _is_c(x) -> bool:
    return isinstance(x, int)


def _c_rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF


def _sig0(x):
    if _is_c(x):
        return _c_rotr(x, 7) ^ _c_rotr(x, 18) ^ (x >> 3)
    return _rotr(x, 7) ^ _rotr(x, 18) ^ (x >> 3)


def _sig1(x):
    if _is_c(x):
        return _c_rotr(x, 17) ^ _c_rotr(x, 19) ^ (x >> 10)
    return _rotr(x, 17) ^ _rotr(x, 19) ^ (x >> 10)


def _m_add(*xs):
    """Sum mod 2^32 of (array | int) terms; ints pre-fold into one constant."""
    c = 0
    arrs = []
    for v in xs:
        if _is_c(v):
            c = (c + v) & 0xFFFFFFFF
        else:
            arrs.append(v)
    if not arrs:
        return c
    out = arrs[0]
    for v in arrs[1:]:
        out = out + v
    if c:
        out = out + _U32(c)
    return out


def _prefer_form() -> str:
    """Default compression form: 'unrolled' on TPU, 'rolled' elsewhere.

    Unrolled: the whole 64-round compression fuses into register-resident
    elementwise work — HBM traffic is just message-in/digest-out (~25x less
    than the rolled window). XLA:TPU compiles it fine; XLA:CPU takes
    unbounded time on the unrolled graph, so CPU (tests) stays rolled — all
    forms are the same arithmetic and produce identical bytes.
    """
    import jax

    try:
        d = jax.config.jax_default_device
        if d is not None and d.platform != "tpu":
            return "rolled"
        if any(x.platform == "tpu" for x in jax.devices()):
            return "unrolled"
        return "rolled"
    except Exception:
        return "rolled"


_FORM = None


def _form() -> str:
    """'unrolled' | 'chunked' | 'rolled' — three lowerings of the same
    compression, trading traced-op count / program size against fusion:

    - unrolled: all 64 rounds inlined per call site — fastest on TPU, but
      a cold process pays heavy Python tracing for big-trace provers
      (~840 s at trace 2^16: every tree level re-inlines the rounds), and
      whole-proof fused programs exceed the remote compiler's memory.
      (An inner-jit dedup of the tracing was TRIED and REVERTED: XLA:TPU
      does not re-inline nested jit calls — the called hash computations
      broke fusion and measured 7.3x slower tree builds, 351 vs 48 ms at
      2^21 leaves; `jax.jit(..., inline=True)` measured the same 342 ms.)
    - chunked: `fori_loop` over eight 8-round chunks, rounds unrolled
      inside each chunk — 1/8 the traced ops, fusion kept within chunks.
    - rolled: `fori_loop` over all 64 rounds — smallest programs, ~12x
      lower hash throughput; the CPU/test form and the fused prover's.

    `TOYNI_SHA_FORM` overrides; `TOYNI_SHA_UNROLL=0/1` kept for
    back-compat (1 = unrolled, 0 = rolled)."""
    global _FORM
    if _FORM is None:
        import os

        env = os.environ.get("TOYNI_SHA_FORM", "")
        legacy = os.environ.get("TOYNI_SHA_UNROLL", "")
        if env in ("unrolled", "rolled") or (
            env.startswith("chunked")
            and (env == "chunked" or env[len("chunked"):] in
                 ("2", "4", "8", "16", "32"))
        ):
            _FORM = env
        elif legacy in ("0", "1"):
            _FORM = "unrolled" if legacy == "1" else "rolled"
        else:
            _FORM = _prefer_form()
    return _FORM


def _unrolled() -> bool:
    return _form() == "unrolled"


import contextlib


@contextlib.contextmanager
def forced(form):
    """Pin the compression form while tracing a program. The fused
    single-dispatch prover traces under `forced("rolled")`: with the
    unrolled form its whole-proof program reaches ~14 MB of MLIR and this
    deployment's remote compile helper is SIGKILLed; rolled it compiles in
    ~2 min and still WINS end-to-end (0.42 vs 0.65 s/proof at trace 2^8 —
    hashing is a small slice of a fused small-trace proof). Identical bytes
    in every form. Accepts a form string or a legacy bool (True =
    unrolled, False = rolled)."""
    global _FORM
    if isinstance(form, bool):
        form = "unrolled" if form else "rolled"
    old = _FORM
    _FORM = form
    try:
        yield
    finally:
        _FORM = old


def compress_unrolled(state, block):
    """Fully unrolled compression (see `_prefer_unrolled`)."""
    return compress_words_unrolled(state, [block[..., t] for t in range(16)])


def compress_words_unrolled(state, win):
    """Unrolled compression over a 16-entry word list whose entries are
    arrays OR python-int constants (see the constant-aware helpers above)."""
    win = list(win)
    a, b, c, d, e, f, g, h = (state[..., i] for i in range(8))
    for t in range(64):
        w_t = win[0]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        if _is_c(w_t):
            t1 = h + S1 + ch + _U32((int(_K[t]) + w_t) & 0xFFFFFFFF)
        else:
            t1 = h + S1 + ch + _U32(int(_K[t])) + w_t
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        new_w = _m_add(win[0], _sig0(win[1]), win[9], _sig1(win[14]))
        win = win[1:] + [new_w]
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    out = jnp.stack([a, b, c, d, e, f, g, h], axis=-1)
    return state + out


def compress_words_chunked(state, win, n_chunks: int = 8):
    """Chunked compression: `fori_loop` over `n_chunks` chunks of
    64/n_chunks rounds, rounds unrolled inside each chunk — 1/n_chunks of
    the unrolled form's traced ops with fusion kept within chunks (see
    `_form`). Round constants are table-indexed (the loop index is traced,
    so constant message words are materialized up front by the caller); the
    rolling 16-word schedule window rides in the loop carry as a TUPLE, so
    the shift is free at trace time. Identical bytes to the other forms.

    Loop iterations cost ~0.85 ms each at 2^21-lane shapes on this backend
    (PERF.md rule 6), so n_chunks trades program size against per-call loop
    overhead: 8 (the round-3 form) for big fused programs, 4 or 2 where the
    ~2-4x larger trace still compiles — the small-proof latency knob."""
    import jax

    rounds = 64 // n_chunks
    assert rounds * n_chunks == 64
    # an all-constant block (pure padding) broadcasts to the state's shape
    ref = next((w for w in win if not _is_c(w)), state[..., 0])
    win = tuple(
        jnp.broadcast_to(_U32(w), ref.shape) if _is_c(w) else w for w in win
    )
    k_tab = jnp.asarray(_K)
    regs = tuple(state[..., i] for i in range(8))

    def chunk(ci, carry):
        a, b, c, d, e, f, g, h = carry[:8]
        win = carry[8:]
        for t in range(rounds):
            k_t = k_tab[ci * rounds + t]
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + k_t + win[0]
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = S0 + maj
            new_w = _m_add(win[0], _sig0(win[1]), win[9], _sig1(win[14]))
            win = win[1:] + (new_w,)
            h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
        return (a, b, c, d, e, f, g, h) + win

    out = jax.lax.fori_loop(0, n_chunks, chunk, regs + win)
    return state + jnp.stack(out[:8], axis=-1)


def _chunk_count(form: str) -> int:
    """'chunked' -> 8 (the round-3 default), 'chunkedN' -> N chunks."""
    return int(form[len("chunked"):] or 8)


def compress(state, block):
    """One SHA-256 compression. state: (..., 8) u32; block: (..., 16) u32.

    On TPU: fully unrolled (fuses into one register-resident kernel). On CPU:
    the 64 rounds run in a `lax.fori_loop` with the message schedule kept as
    a rolling 16-word window stacked on a leading axis (static indices only):
    at round t the window holds w[t..t+15], so w[t] = win[0] and the next
    schedule word w[t+16] = sig1(win[14]) + win[9] + sig0(win[1]) + win[0] —
    XLA:CPU cannot compile the unrolled graph in reasonable time.
    """
    import jax

    if _unrolled():
        return compress_unrolled(state, block)
    if _form().startswith("chunked"):
        return compress_words_chunked(
            state, [block[..., t] for t in range(16)],
            _chunk_count(_form()),
        )

    k_tab = jnp.asarray(_K)
    win0 = jnp.moveaxis(block, -1, 0)  # (16, ...)
    a, b, c, d, e, f, g, h = (state[..., i] for i in range(8))

    def body(t, carry):
        a, b, c, d, e, f, g, h, win = carry
        w_t = win[0]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + k_tab[t] + w_t
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        s0 = _rotr(win[1], 7) ^ _rotr(win[1], 18) ^ (win[1] >> 3)
        s1 = _rotr(win[14], 17) ^ _rotr(win[14], 19) ^ (win[14] >> 10)
        new_w = win[0] + s0 + win[9] + s1
        win = jnp.concatenate([win[1:], new_w[None]], axis=0)
        return (t1 + t2, a, b, c, d + t1, e, f, g, win)

    a, b, c, d, e, f, g, h, _ = jax.lax.fori_loop(
        0, 64, body, (a, b, c, d, e, f, g, h, win0)
    )
    out = jnp.stack([a, b, c, d, e, f, g, h], axis=-1)
    return state + out


def sha256_blocks(blocks):
    """Full SHA-256 over pre-padded blocks: (..., nblocks, 16) u32 -> (..., 8)."""
    nblocks = blocks.shape[-2]
    state = jnp.broadcast_to(jnp.asarray(_H0), (*blocks.shape[:-2], 8))
    for i in range(nblocks):
        state = compress(state, blocks[..., i, :])
    return state


def sha256_words(wins):
    """Full SHA-256 over blocks given as 16-entry word LISTS (arrays or
    python-int constants). The unrolled (TPU) path folds constant words
    through the message schedule at trace time; the rolled (CPU) path
    materializes them — identical bytes either way."""
    ref = next(w for win in wins for w in win if not _is_c(w))
    state = jnp.broadcast_to(jnp.asarray(_H0), (*ref.shape, 8))
    form = _form()
    if form == "unrolled":
        for win in wins:
            state = compress_words_unrolled(state, win)
    elif form.startswith("chunked"):
        for win in wins:
            state = compress_words_chunked(state, win, _chunk_count(form))
    else:
        for win in wins:
            block = jnp.stack(
                [
                    jnp.broadcast_to(_U32(w), ref.shape) if _is_c(w) else w
                    for w in win
                ],
                axis=-1,
            )
            state = compress(state, block)
    return state


def pack_words(byte_arr):
    """(..., 4k) u8 -> (..., k) u32 big-endian words."""
    b = byte_arr.astype(_U32).reshape(*byte_arr.shape[:-1], byte_arr.shape[-1] // 4, 4)
    return (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]


def unpack_words(words):
    """(..., k) u32 -> (..., 4k) u8 big-endian bytes."""
    parts = jnp.stack(
        [(words >> 24) & 0xFF, (words >> 16) & 0xFF, (words >> 8) & 0xFF, words & 0xFF],
        axis=-1,
    ).astype(_U8)
    return parts.reshape(*words.shape[:-1], words.shape[-1] * 4)


# Message construction is WORD-wise: the 16 block words are composed directly
# from salt words / field values / digest words with u32 shifts. A byte-array
# intermediate ((N, 64) u8 promoted to u32 inside pack_words) costs 256 B per
# lane of HBM — 8 GB per tree at LDE 2^25 — and was the OOM that capped trace
# size; the word-wise path's biggest temp is the (N, 16) block itself.

def hash_salted_leaves(values, salts):
    """SHA256(0x00 || salt || value8LE) for every lane.

    values: (...,) u32 standard-form field elements. salts: (..., 4) u32
    big-endian salt words (canonical: salt bytes = BE bytes of the 4 words),
    or (..., 16) u8 raw bytes (converted). Returns (..., 8) u32 digests.
    (Leaf encoding: src/fibonacci.rs:340-353 + leaf tag src/merkle.rs:105-113.)
    """
    v = values.astype(_U32)
    if salts.dtype == jnp.uint8:
        salts = pack_words(salts)
    s0, s1, s2, s3 = (salts[..., k] for k in range(4))
    win = [
        s0 >> 8,                                      # 0x00 tag + salt bytes
        ((s0 & 0xFF) << 24) | (s1 >> 8),
        ((s1 & 0xFF) << 24) | (s2 >> 8),
        ((s2 & 0xFF) << 24) | (s3 >> 8),
        ((s3 & 0xFF) << 24) | ((v & 0xFF) << 16)
        | (((v >> 8) & 0xFF) << 8) | ((v >> 16) & 0xFF),
        ((v >> 24) & 0xFF) << 24,
        0x00800000,
        0, 0, 0, 0, 0, 0, 0, 0,
        200,                                          # 25-byte message
    ]
    return sha256_words([win])


def hash_unsalted_leaves(values):
    """SHA256(0x00 || value8LE): the public final-FRI-layer leaves
    (src/fibonacci.rs:357-363)."""
    v = values.astype(_U32)
    win = [
        ((v & 0xFF) << 16) | (((v >> 8) & 0xFF) << 8) | ((v >> 16) & 0xFF),
        ((v >> 24) & 0xFF) << 24,
        0x00800000,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        72,                                           # 9-byte message
    ]
    return sha256_words([win])


def _le8_words(v):
    """One u32 field element -> (lo_be, hi_be): the two big-endian block words
    holding its 8-byte little-endian encoding (hi bytes are zero)."""
    lo = ((v & 0xFF) << 24) | (((v >> 8) & 0xFF) << 16) | (((v >> 16) & 0xFF) << 8) | ((v >> 24) & 0xFF)
    return lo


def hash_salted_leaves_ext(values, salts):
    """SHA256(0x00 || salt16 || ext32LE) for (..., 4) u32 ext codeword lanes:
    the hiding leaf of the extension-field soundness mode. Value encoding =
    4 coefficient limbs, 8-byte LE each (matching ext.h_to_bytes /
    src/ext.rs:81-89); 49-byte message, one block."""
    v = values.astype(_U32)
    if salts.dtype == jnp.uint8:
        salts = pack_words(salts)
    s0, s1, s2, s3 = (salts[..., k] for k in range(4))
    limbs = [_le8_words(v[..., k]) for k in range(4)]
    win = [
        s0 >> 8,                                      # 0x00 tag + salt bytes
        ((s0 & 0xFF) << 24) | (s1 >> 8),
        ((s1 & 0xFF) << 24) | (s2 >> 8),
        ((s2 & 0xFF) << 24) | (s3 >> 8),
        ((s3 & 0xFF) << 24) | (limbs[0] >> 8),
        ((limbs[0] & 0xFF) << 24),                    # hi half of limb 0 is 0
        (limbs[1] >> 8),
        ((limbs[1] & 0xFF) << 24),
        (limbs[2] >> 8),
        ((limbs[2] & 0xFF) << 24),
        (limbs[3] >> 8),
        ((limbs[3] & 0xFF) << 24),
        0x00800000,                                   # 0x80 pad at byte 49
        0, 0,
        392,                                          # 49-byte message
    ]
    return sha256_words([win])


def hash_unsalted_leaves_ext(values):
    """SHA256(0x00 || ext32LE): the public final-FRI-layer leaves of the
    extension-field mode. 33-byte message, one block."""
    v = values.astype(_U32)
    limbs = [_le8_words(v[..., k]) for k in range(4)]
    w = []
    for k in range(4):
        # tag/zero byte, then limb bytes 0-2; next word carries limb byte 3
        w.append(limbs[k] >> 8)
        w.append((limbs[k] & 0xFF) << 24)
    w.append(0x00800000)                              # 0x80 pad at byte 33
    win = w + [0] * 6 + [264]                         # 33-byte message
    return sha256_words([win])


def hash_salted_leaves_multi(values, salts):
    """SHA256(0x00 || salt16 || v_0 8LE || ... || v_{k-1} 8LE): the row-bundle
    leaf of multi-column trace commitments — all k column values at one LDE
    position commit in a single leaf. values: (k, N) u32; salts: (N, 4) u32
    big-endian words (or (N, 16) u8). k=1 reproduces `hash_salted_leaves`
    byte-for-byte. Message = 17 + 8k bytes; block words are composed
    word-wise from the inputs (no byte-array intermediate — see module note).
    """
    kcols = values.shape[0]
    v = values.astype(_U32)
    if salts.dtype == jnp.uint8:
        salts = pack_words(salts)
    s = [salts[..., j] for j in range(4)]
    msg_len = 17 + 8 * kcols
    nb = (msg_len + 9 + 63) // 64
    bitlen = msg_len * 8
    words = []
    for wi in range(16 * nb):
        acc = None
        for t in range(4):
            i = 4 * wi + t
            sh = 24 - 8 * t
            term = None
            if 1 <= i <= 16:
                j, bt = divmod(i - 1, 4)
                term = ((s[j] >> (24 - 8 * bt)) & 0xFF) << sh
            elif 17 <= i < msg_len:
                c, bt = divmod(i - 17, 8)
                if bt < 4:  # high 4 bytes of each 8-byte LE limb are zero
                    term = ((v[c] >> (8 * bt)) & 0xFF) << sh
            if term is not None:
                acc = term if acc is None else (acc | term)
        const = 0
        if 4 * wi <= msg_len < 4 * wi + 4:  # 0x80 pad directly after message
            const |= 0x80 << (24 - 8 * (msg_len - 4 * wi))
        if wi == 16 * nb - 1:
            const |= bitlen
        if acc is None:
            acc = const                               # python-int word: folds
        elif const:
            acc = acc | _U32(const)
        words.append(acc)
    return sha256_words([words[b * 16:(b + 1) * 16] for b in range(nb)])


def hash_nodes(left, right):
    """SHA256(0x01 || left || right) for (..., 8) u32 digest pairs
    (src/merkle.rs:117-123). 65-byte message -> two blocks."""
    l = [left[..., k] for k in range(8)]
    r = [right[..., k] for k in range(8)]
    w = [(l[0] >> 8) | _U32(0x01 << 24)]
    for i in range(1, 8):
        w.append(((l[i - 1] & 0xFF) << 24) | (l[i] >> 8))
    w.append(((l[7] & 0xFF) << 24) | (r[0] >> 8))
    for i in range(1, 8):
        w.append(((r[i - 1] & 0xFF) << 24) | (r[i] >> 8))
    # block 2 carries ONE variable byte (the last byte of `right`) — the
    # other 15 words are constants the schedule folds through at trace time
    w2 = [((r[7] & 0xFF) << 24) | _U32(0x00800000)]
    w2 += [0] * 14
    w2.append(520)                                    # 65-byte message
    return sha256_words([w, w2])


# ── host boundary helpers ───────────────────────────────────────────────────

def digest_bytes(words) -> bytes:
    """One (8,) u32 digest -> its canonical 32-byte big-endian form."""
    return b"".join(int(w).to_bytes(4, "big") for w in np.asarray(words, np.uint64))


def words_from_bytes(digest: bytes) -> np.ndarray:
    """32-byte digest -> (8,) u32 words."""
    return np.frombuffer(digest, dtype=">u4").astype(np.uint32)
