// Native host runtime for toyni-tpu.
//
// The TPU owns the batched compute path (JAX/XLA); this library owns the
// host-side hot loops around it — the role the reference fills with native
// code (its CUDA NTT kernel + FFI, cuda/ntt_kernel.cu, src/ntt.rs:85-315):
//
//   * bb_ntt / bb_intt : iterative Cooley-Tukey NTT over BabyBear, the exact
//     algorithm of the reference CPU path (src/ntt.rs:24-66). Used as the
//     fast differential oracle for device kernels at large sizes and as the
//     no-accelerator fallback.
//   * sha256_batch / merkle_build_levels / merkle_verify : FIPS 180-4
//     SHA-256 with the protocol's leaf/node domain tags (src/merkle.rs:
//     105-123) — powers the production host verifier.
//
// Exposed with a C ABI for ctypes (no pybind11 dependency); built on import
// by native/__init__.py which degrades gracefully when no toolchain exists
// (mirroring build.rs:28-37).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <initializer_list>
#include <vector>

extern "C" {

// ── BabyBear field ──────────────────────────────────────────────────────────

static const uint64_t P = 2013265921ULL; // 2^31 - 2^27 + 1

static inline uint64_t bb_mul(uint64_t a, uint64_t b) {
    return (a * b) % P; // operands < 2^31: the 64-bit product is exact
}

static inline uint64_t bb_add(uint64_t a, uint64_t b) {
    uint64_t s = a + b;
    return s >= P ? s - P : s;
}

static inline uint64_t bb_sub(uint64_t a, uint64_t b) {
    return a >= b ? a - b : a + P - b;
}

uint64_t bb_pow(uint64_t base, uint64_t exp) {
    uint64_t result = 1;
    base %= P;
    while (exp > 0) {
        if (exp & 1) result = bb_mul(result, base);
        base = bb_mul(base, base);
        exp >>= 1;
    }
    return result;
}

// In-place iterative Cooley-Tukey NTT (decimation in time), natural-order
// output; same structure as the reference CPU NTT (src/ntt.rs:24-53).
void bb_ntt(uint64_t* values, uint64_t n, uint64_t omega) {
    // bit-reverse permutation
    uint64_t log_n = 0;
    while ((1ULL << log_n) < n) log_n++;
    for (uint64_t i = 0; i < n; i++) {
        uint64_t rev = 0, x = i;
        for (uint64_t b = 0; b < log_n; b++) { rev = (rev << 1) | (x & 1); x >>= 1; }
        if (i < rev) { uint64_t t = values[i]; values[i] = values[rev]; values[rev] = t; }
    }
    for (uint64_t len = 2; len <= n; len <<= 1) {
        uint64_t w_len = bb_pow(omega, n / len);
        for (uint64_t i = 0; i < n; i += len) {
            uint64_t w = 1;
            uint64_t half = len >> 1;
            for (uint64_t j = 0; j < half; j++) {
                uint64_t u = values[i + j];
                uint64_t v = bb_mul(values[i + j + half], w);
                values[i + j] = bb_add(u, v);
                values[i + j + half] = bb_sub(u, v);
                w = bb_mul(w, w_len);
            }
        }
    }
}

void bb_intt(uint64_t* values, uint64_t n, uint64_t omega) {
    bb_ntt(values, n, bb_pow(omega, n - 1));
    uint64_t inv_n = bb_pow(n % P, P - 2);
    for (uint64_t i = 0; i < n; i++) values[i] = bb_mul(values[i], inv_n);
}

// ── SHA-256 (FIPS 180-4) ────────────────────────────────────────────────────

static const uint32_t K[64] = {
    0x428a2f98,0x71374491,0xb5c0fbcf,0xe9b5dba5,0x3956c25b,0x59f111f1,
    0x923f82a4,0xab1c5ed5,0xd807aa98,0x12835b01,0x243185be,0x550c7dc3,
    0x72be5d74,0x80deb1fe,0x9bdc06a7,0xc19bf174,0xe49b69c1,0xefbe4786,
    0x0fc19dc6,0x240ca1cc,0x2de92c6f,0x4a7484aa,0x5cb0a9dc,0x76f988da,
    0x983e5152,0xa831c66d,0xb00327c8,0xbf597fc7,0xc6e00bf3,0xd5a79147,
    0x06ca6351,0x14292967,0x27b70a85,0x2e1b2138,0x4d2c6dfc,0x53380d13,
    0x650a7354,0x766a0abb,0x81c2c92e,0x92722c85,0xa2bfe8a1,0xa81a664b,
    0xc24b8b70,0xc76c51a3,0xd192e819,0xd6990624,0xf40e3585,0x106aa070,
    0x19a4c116,0x1e376c08,0x2748774c,0x34b0bcb5,0x391c0cb3,0x4ed8aa4a,
    0x5b9cca4f,0x682e6ff3,0x748f82ee,0x78a5636f,0x84c87814,0x8cc70208,
    0x90befffa,0xa4506ceb,0xbef9a3f7,0xc67178f2};

static inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

static void sha256_compress(uint32_t st[8], const uint8_t block[64]) {
    uint32_t w[64];
    for (int t = 0; t < 16; t++)
        w[t] = (uint32_t(block[t * 4]) << 24) | (uint32_t(block[t * 4 + 1]) << 16) |
               (uint32_t(block[t * 4 + 2]) << 8) | uint32_t(block[t * 4 + 3]);
    for (int t = 16; t < 64; t++) {
        uint32_t s0 = rotr(w[t-15],7) ^ rotr(w[t-15],18) ^ (w[t-15] >> 3);
        uint32_t s1 = rotr(w[t-2],17) ^ rotr(w[t-2],19) ^ (w[t-2] >> 10);
        w[t] = w[t-16] + s0 + w[t-7] + s1;
    }
    uint32_t a=st[0],b=st[1],c=st[2],d=st[3],e=st[4],f=st[5],g=st[6],h=st[7];
    for (int t = 0; t < 64; t++) {
        uint32_t S1 = rotr(e,6) ^ rotr(e,11) ^ rotr(e,25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = h + S1 + ch + K[t] + w[t];
        uint32_t S0 = rotr(a,2) ^ rotr(a,13) ^ rotr(a,22);
        uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
        uint32_t t2 = S0 + maj;
        h=g; g=f; f=e; e=d+t1; d=c; c=b; b=a; a=t1+t2;
    }
    st[0]+=a; st[1]+=b; st[2]+=c; st[3]+=d; st[4]+=e; st[5]+=f; st[6]+=g; st[7]+=h;
}

static void sha256_one(const uint8_t* msg, uint64_t len, uint8_t out[32]) {
    uint32_t st[8] = {0x6a09e667,0xbb67ae85,0x3c6ef372,0xa54ff53a,
                      0x510e527f,0x9b05688c,0x1f83d9ab,0x5be0cd19};
    uint64_t i = 0;
    for (; i + 64 <= len; i += 64) sha256_compress(st, msg + i);
    uint8_t block[64];
    uint64_t rem = len - i;
    memcpy(block, msg + i, rem);
    block[rem] = 0x80;
    if (rem + 1 > 56) {
        memset(block + rem + 1, 0, 64 - rem - 1);
        sha256_compress(st, block);
        memset(block, 0, 64);
    } else {
        memset(block + rem + 1, 0, 56 - rem - 1);
    }
    uint64_t bits = len * 8;
    for (int b = 0; b < 8; b++) block[56 + b] = uint8_t(bits >> (8 * (7 - b)));
    sha256_compress(st, block);
    for (int w = 0; w < 8; w++)
        for (int b = 0; b < 4; b++) out[w * 4 + b] = uint8_t(st[w] >> (8 * (3 - b)));
}

// Hash `count` equal-length messages, 32 bytes out each.
void sha256_batch(const uint8_t* msgs, uint64_t msg_len, uint64_t count,
                  uint8_t* out) {
    for (uint64_t i = 0; i < count; i++)
        sha256_one(msgs + i * msg_len, msg_len, out + i * 32);
}

// ── Merkle (leaf tag 0x00, node tag 0x01, odd node duplicated) ──────────────

// Hash `count` equal-length leaf preimages with the 0x00 tag.
void merkle_leaf_hashes(const uint8_t* leaves, uint64_t leaf_len,
                        uint64_t count, uint8_t* out) {
    uint8_t* buf = (uint8_t*)malloc(leaf_len + 1);
    buf[0] = 0x00;
    for (uint64_t i = 0; i < count; i++) {
        memcpy(buf + 1, leaves + i * leaf_len, leaf_len);
        sha256_one(buf, leaf_len + 1, out + i * 32);
    }
    free(buf);
}

// Build all levels above the leaf level. `digests` holds `count` 32-byte leaf
// hashes; `out_levels` receives the concatenated upper levels (sizes
// ceil(count/2), ceil(.../2), ..., 1 — caller sizes the buffer). Semantics of
// src/merkle.rs:25-48 (odd last node duplicated as its own sibling).
void merkle_build_levels(const uint8_t* digests, uint64_t count,
                         uint8_t* out_levels) {
    const uint8_t* cur = digests;
    uint64_t n = count;
    uint8_t* dst = out_levels;
    uint8_t buf[65];
    buf[0] = 0x01;
    while (n > 1) {
        uint64_t next = (n + 1) / 2;
        for (uint64_t i = 0; i < next; i++) {
            const uint8_t* l = cur + (2 * i) * 32;
            const uint8_t* r = (2 * i + 1 < n) ? cur + (2 * i + 1) * 32 : l;
            memcpy(buf + 1, l, 32);
            memcpy(buf + 33, r, 32);
            sha256_one(buf, 65, dst + i * 32);
        }
        cur = dst;
        dst += next * 32;
        n = next;
    }
}

// Verify one Merkle path. Returns 1 on success. positions[i] nonzero means
// the sibling goes on the LEFT (current index was odd) — src/merkle.rs:87-101.
int merkle_verify(const uint8_t* leaf, uint64_t leaf_len,
                  const uint8_t* path, const uint8_t* positions,
                  uint64_t path_len, const uint8_t* root) {
    uint8_t cur[32];
    {
        uint8_t* buf = (uint8_t*)malloc(leaf_len + 1);
        buf[0] = 0x00;
        memcpy(buf + 1, leaf, leaf_len);
        sha256_one(buf, leaf_len + 1, cur);
        free(buf);
    }
    uint8_t buf[65];
    buf[0] = 0x01;
    for (uint64_t i = 0; i < path_len; i++) {
        const uint8_t* sib = path + i * 32;
        if (positions[i]) { memcpy(buf + 1, sib, 32); memcpy(buf + 33, cur, 32); }
        else              { memcpy(buf + 1, cur, 32); memcpy(buf + 33, sib, 32); }
        sha256_one(buf, 65, cur);
    }
    return memcmp(cur, root, 32) == 0 ? 1 : 0;
}

} // extern "C"

// ── Poseidon2 over BabyBear (width 16, x^7) ─────────────────────────────────
//
// Exact scalar twin of the Python host oracle (toyni_tpu/field/poseidon2.py)
// for the v5 wire format's Merkle commitments. Parameters are generated by
// scripts/gen_poseidon2_params.py into poseidon2_params.h (same tables as
// field/poseidon2_params.py).

#include "poseidon2_params.h"

static inline uint64_t p2_sbox(uint64_t x) {
    uint64_t x2 = bb_mul(x, x);
    uint64_t x4 = bb_mul(x2, x2);
    return bb_mul(bb_mul(x4, x2), x); // x^7
}

static void p2_matmul_external(uint64_t s[16]) {
    uint64_t y[16];
    for (int b = 0; b < 16; b += 4) {
        uint64_t t0 = bb_add(s[b], s[b + 1]);
        uint64_t t1 = bb_add(s[b + 2], s[b + 3]);
        uint64_t t2 = bb_add(bb_add(s[b + 1], s[b + 1]), t1);
        uint64_t t3 = bb_add(bb_add(s[b + 3], s[b + 3]), t0);
        uint64_t t4 = bb_add(bb_add(bb_add(t1, t1), bb_add(t1, t1)), t3);
        uint64_t t5 = bb_add(bb_add(bb_add(t0, t0), bb_add(t0, t0)), t2);
        y[b] = bb_add(t3, t5);
        y[b + 1] = t5;
        y[b + 2] = bb_add(t2, t4);
        y[b + 3] = t4;
    }
    for (int j = 0; j < 4; j++) {
        uint64_t sum = bb_add(bb_add(y[j], y[4 + j]), bb_add(y[8 + j], y[12 + j]));
        for (int b = 0; b < 16; b += 4) s[b + j] = bb_add(y[b + j], sum);
    }
}

static void p2_matmul_internal(uint64_t s[16]) {
    uint64_t tot = 0;
    for (int i = 0; i < 16; i++) tot = bb_add(tot, s[i]);
    for (int i = 0; i < 16; i++)
        s[i] = bb_add(tot, bb_mul(s[i], (P2_MU[i] + P - 1) % P));
}

static void p2_perm(uint64_t s[16]) {
    p2_matmul_external(s);
    for (int r = 0; r < P2_RF / 2; r++) {
        for (int i = 0; i < 16; i++) s[i] = p2_sbox(bb_add(s[i], P2_RC_EXT[r][i]));
        p2_matmul_external(s);
    }
    for (int r = 0; r < P2_RP; r++) {
        s[0] = p2_sbox(bb_add(s[0], P2_RC_INT[r]));
        p2_matmul_internal(s);
    }
    for (int r = P2_RF / 2; r < P2_RF; r++) {
        for (int i = 0; i < 16; i++) s[i] = p2_sbox(bb_add(s[i], P2_RC_EXT[r][i]));
        p2_matmul_external(s);
    }
}

// Padding-free sponge, rate 8, capacity lane 15 = message length (the leaf
// hash; field/poseidon2.py:h_hash_elems). Inputs reduced mod p by callers.
static void p2_sponge(const uint64_t* elems, uint32_t n, uint64_t out[8]) {
    uint64_t s[16] = {0};
    s[15] = n % P;
    uint32_t off = 0;
    do {
        uint32_t chunk = n - off < 8 ? n - off : 8;
        for (uint32_t i = 0; i < chunk; i++) s[i] = elems[off + i];
        p2_perm(s);
        off += 8;
    } while (off < n);
    for (int i = 0; i < 8; i++) out[i] = s[i];
}

// 2-to-1 node compression: truncate(perm(L || R)).
static void p2_compress(const uint64_t l[8], const uint64_t r[8], uint64_t out[8]) {
    uint64_t s[16];
    for (int i = 0; i < 8; i++) { s[i] = l[i] % P; s[8 + i] = r[i] % P; }
    p2_perm(s);
    for (int i = 0; i < 8; i++) out[i] = s[i];
}

// digest codec: 8 field elements <-> 32 bytes of 4-byte LE words
static void p2_digest_bytes(const uint64_t d[8], uint8_t out[32]) {
    for (int w = 0; w < 8; w++)
        for (int b = 0; b < 4; b++) out[w * 4 + b] = uint8_t(d[w] >> (8 * b));
}

static void p2_digest_words(const uint8_t* bytes32, uint64_t out[8]) {
    for (int w = 0; w < 8; w++) {
        uint64_t v = 0;
        for (int b = 3; b >= 0; b--) v = (v << 8) | bytes32[w * 4 + b];
        out[w] = v % P; // the host oracle reduces digest words on absorb
    }
}

// ── STARK verifier (wire format v1 — the reference protocol) ────────────────
//
// A complete native verifier for base-field single-column proofs: parses the
// serialized blob (bounds-checked), replays the Fiat-Shamir transcript
// byte-exactly (src/transcript.rs), and runs every check of
// toyni_tpu/verifier.py (itself the port of src/verifier.rs:14-232): OOD
// identity for the Fibonacci AIR, FRI schedule/constancy/final-root, salted
// Merkle openings with position binding, DEEP reconstruction, the fold
// chain. The Python verifier stays the bit-exactness oracle; this is the
// production host path (differential-tested against it, incl. tamper fuzz).

static const uint64_t PRIM_ROOT = 440564289ULL; // 31^15 mod p, 2-adicity 27

static uint64_t root_of_unity(int log_n) {
    return bb_pow(PRIM_ROOT, 1ULL << (27 - log_n));
}

namespace sv {

struct Reader {
    const uint8_t* p;
    uint64_t len, off;
    bool ok;
    Reader(const uint8_t* data, uint64_t n) : p(data), len(n), off(0), ok(true) {}
    const uint8_t* bytes(uint64_t n) {
        if (!ok || n > len - off) { ok = false; return nullptr; }
        const uint8_t* q = p + off;
        off += n;
        return q;
    }
    uint16_t u16() {
        const uint8_t* b = bytes(2);
        return b ? (uint16_t)(b[0] | (b[1] << 8)) : 0;
    }
    uint32_t u32() {
        const uint8_t* b = bytes(4);
        if (!b) return 0;
        return (uint32_t)b[0] | ((uint32_t)b[1] << 8) | ((uint32_t)b[2] << 16)
             | ((uint32_t)b[3] << 24);
    }
    uint64_t u64() {
        const uint8_t* b = bytes(8);
        if (!b) return 0;
        uint64_t v = 0;
        for (int i = 7; i >= 0; i--) v = (v << 8) | b[i];
        return v;
    }
};

// ── quartic extension F_p[X]/(X^4 - 11) (host scalar; field/ext.py) ─────────

struct E {
    uint64_t c[4];
};

static const uint64_t EW = 11;

static inline E e_from_base(uint64_t v) { return E{{v % P, 0, 0, 0}}; }

static inline E e_add(const E& a, const E& b) {
    E r;
    for (int i = 0; i < 4; i++) r.c[i] = bb_add(a.c[i] % P, b.c[i] % P);
    return r;
}

static inline E e_sub(const E& a, const E& b) {
    E r;
    for (int i = 0; i < 4; i++) r.c[i] = bb_sub(a.c[i] % P, b.c[i] % P);
    return r;
}

static inline E e_mul(const E& aa, const E& bb) {
    uint64_t a[4], b[4];
    for (int i = 0; i < 4; i++) { a[i] = aa.c[i] % P; b[i] = bb.c[i] % P; }
    unsigned __int128 r0 =
        (unsigned __int128)a[0] * b[0]
        + (unsigned __int128)EW * ((unsigned __int128)a[1] * b[3]
                                   + (unsigned __int128)a[2] * b[2]
                                   + (unsigned __int128)a[3] * b[1]);
    unsigned __int128 r1 =
        (unsigned __int128)a[0] * b[1] + (unsigned __int128)a[1] * b[0]
        + (unsigned __int128)EW * ((unsigned __int128)a[2] * b[3]
                                   + (unsigned __int128)a[3] * b[2]);
    unsigned __int128 r2 =
        (unsigned __int128)a[0] * b[2] + (unsigned __int128)a[1] * b[1]
        + (unsigned __int128)a[2] * b[0]
        + (unsigned __int128)EW * ((unsigned __int128)a[3] * b[3]);
    unsigned __int128 r3 =
        (unsigned __int128)a[0] * b[3] + (unsigned __int128)a[1] * b[2]
        + (unsigned __int128)a[2] * b[1] + (unsigned __int128)a[3] * b[0];
    return E{{(uint64_t)(r0 % P), (uint64_t)(r1 % P), (uint64_t)(r2 % P),
              (uint64_t)(r3 % P)}};
}

static inline E e_mul_base(const E& a, uint64_t s) {
    E r;
    for (int i = 0; i < 4; i++) r.c[i] = bb_mul(a.c[i] % P, s % P);
    return r;
}

static E e_pow128(E a, unsigned __int128 e) {
    E result = e_from_base(1);
    while (e > 0) {
        if (e & 1) result = e_mul(result, a);
        a = e_mul(a, a);
        e >>= 1;
    }
    return result;
}

static E e_inv(const E& a) { // a^(p^4 - 2); 0 -> 0 (unreachable in protocol)
    unsigned __int128 p2 = (unsigned __int128)P * P;
    unsigned __int128 exp = p2 * p2 - 2; // p^4 fits 124 bits
    return e_pow128(a, exp);
}

static inline bool e_eq(const E& a, const E& b) {
    for (int i = 0; i < 4; i++)
        if (a.c[i] != b.c[i]) return false;
    return true;
}

// ── openings ────────────────────────────────────────────────────────────────

struct Op {
    uint64_t index;
    uint64_t limbs[4]; // raw limb values (first nlimbs; rest zero)
    uint32_t nlimbs;   // 1 = base value, 4 = ext value
    const uint8_t* value_raw; // the serialized limb bytes (leaf encoding)
    uint32_t value_raw_len;
    const uint8_t* salt;
    uint32_t salt_len;
    const uint8_t* path; // path_len x (32-byte sibling + 1 flag byte)
    uint32_t path_len;
};

static bool read_opening(Reader& r, Op& op, bool v2) {
    op.index = r.u64();
    op.limbs[0] = op.limbs[1] = op.limbs[2] = op.limbs[3] = 0;
    if (v2) {
        op.nlimbs = r.u32();
        if (!r.ok || (uint64_t)op.nlimbs * 8 > r.len - r.off) return false;
        if (op.nlimbs <= 1) {
            // proof.py reads ONE u64 even for a 0 count — replicate exactly
            op.nlimbs = 1;
            op.value_raw = r.p + r.off;
            op.value_raw_len = 8;
            op.limbs[0] = r.u64();
        } else {
            op.value_raw = r.p + r.off;
            op.value_raw_len = op.nlimbs * 8;
            for (uint32_t i = 0; i < op.nlimbs; i++) {
                uint64_t v = r.u64();
                if (i < 4) op.limbs[i] = v;
            }
        }
    } else {
        op.nlimbs = 1;
        op.value_raw = r.p + r.off;
        op.value_raw_len = 8;
        op.limbs[0] = r.u64();
    }
    op.salt_len = r.u32();
    op.salt = r.bytes(op.salt_len);
    op.path_len = r.u32();
    op.path = r.bytes((uint64_t)op.path_len * 33);
    return r.ok;
}

// Leaf = salt || value 8-byte LE (SHA-256) or sponge(salt elems || value
// elems) (Poseidon2, wire v5); position binding: stored index, the path
// flags (LSB-first bits of the index), and the full tree depth must all
// match (toyni_tpu/verifier.py:_verify_opening).
static bool op_verify(const Op& op, const uint8_t* root,
                      uint64_t expected_index, uint64_t tree_size,
                      bool p2 = false) {
    if (op.index != expected_index) return false;
    for (uint32_t l = 0; l < op.path_len; l++)
        // flag parse matches proof.py: the byte is True iff exactly 0x01
        if ((op.path[l * 33 + 32] == 0x01) != (((expected_index >> l) & 1) != 0))
            return false;
    uint64_t ts = tree_size - 1;
    uint32_t depth = 0;
    while (ts) { depth++; ts >>= 1; }
    if (op.path_len != depth) return false;

    if (p2) {
        // Poseidon2 leaf: salt = 4 BE u32 field elements (16 bytes or
        // absent), value = the serialized limbs reduced mod p
        if (op.salt_len != 0 && op.salt_len != 16) return false;
        std::vector<uint64_t> elems;
        elems.reserve(4 + op.nlimbs);
        for (uint32_t i = 0; i < op.salt_len / 4; i++) {
            uint64_t w = 0;
            for (int b = 0; b < 4; b++) w = (w << 8) | op.salt[i * 4 + b];
            if (w >= P) return false; // verifier.py rejects non-field salts
            elems.push_back(w);
        }
        for (uint32_t i = 0; i < op.nlimbs; i++) {
            uint64_t v = 0;
            for (int b = 7; b >= 0; b--)
                v = (v << 8) | op.value_raw[i * 8 + b];
            elems.push_back(v % P); // h_hash_elems reduces
        }
        uint64_t cur[8];
        p2_sponge(elems.data(), (uint32_t)elems.size(), cur);
        for (uint32_t i = 0; i < op.path_len; i++) {
            uint64_t sib[8];
            p2_digest_words(op.path + i * 33, sib);
            uint64_t next[8];
            if (op.path[i * 33 + 32] == 0x01) p2_compress(sib, cur, next);
            else p2_compress(cur, sib, next);
            memcpy(cur, next, sizeof(next));
        }
        uint8_t got[32];
        p2_digest_bytes(cur, got);
        return memcmp(got, root, 32) == 0;
    }

    uint8_t cur[32];
    {
        // leaf = 0x00 tag || salt || value bytes (the serialized LE limbs)
        std::vector<uint8_t> leaf(1 + op.salt_len + op.value_raw_len);
        leaf[0] = 0x00;
        memcpy(leaf.data() + 1, op.salt, op.salt_len);
        memcpy(leaf.data() + 1 + op.salt_len, op.value_raw, op.value_raw_len);
        sha256_one(leaf.data(), leaf.size(), cur);
    }
    uint8_t buf[65];
    buf[0] = 0x01;
    for (uint32_t i = 0; i < op.path_len; i++) {
        const uint8_t* sib = op.path + i * 33;
        if (op.path[i * 33 + 32] == 0x01) {
            memcpy(buf + 1, sib, 32);
            memcpy(buf + 33, cur, 32);
        } else {
            memcpy(buf + 1, cur, 32);
            memcpy(buf + 33, sib, 32);
        }
        sha256_one(buf, 65, cur);
    }
    return memcmp(cur, root, 32) == 0;
}

struct Transcript {
    std::vector<uint8_t> state;
    Transcript() {
        static const char seed[] = "toyni-stark-v1";
        state.assign(seed, seed + 14);
    }
    void absorb(const uint8_t* d, uint64_t n) {
        state.insert(state.end(), d, d + n);
    }
    void absorb_u64le(uint64_t v) {
        uint8_t b[8];
        for (int i = 0; i < 8; i++) b[i] = uint8_t(v >> (8 * i));
        absorb(b, 8);
    }
    uint64_t squeeze_raw() { // hash-ratchet; LE u64 of the first 8 bytes
        uint8_t h[32];
        sha256_one(state.data(), state.size(), h);
        state.assign(h, h + 32);
        uint64_t v = 0;
        for (int i = 7; i >= 0; i--) v = (v << 8) | h[i];
        return v;
    }
    uint64_t challenge() { return squeeze_raw() % P; }
};

} // namespace sv

extern "C" {

// Verify a serialized v1-v5 proof for a BUNDLED AIR. air_id: 0 = Fibonacci
// (the reference protocol, wire v1/v2), 1 = PairFibonacci (k=2, nc=2, ns=2),
// 2 = SboxChain (x^7, ns=2) — the multi formats v3/v4. Wire v5 = Poseidon2
// commitments with a flags header (bit 0 ext, bit 1 multi). Returns 1
// accept, 0 reject, -1 parse error. `final_size` comes from the Python
// config (StarkConfig.final_layer_size); `expect_ext` from
// cfg.ext_challenges; `expect_p2` from cfg.hash == "poseidon2".
int stark_verify_v1(const uint8_t* blob, uint64_t blob_len,
                    uint64_t num_queries, uint64_t blowup,
                    uint64_t coset_shift, uint64_t final_size,
                    int expect_ext, int air_id, int expect_p2) {
    using namespace sv;
    // bundled-AIR shapes (k columns, nc constraints, ns shifted openings)
    uint32_t AK = 1, ANC = 1, ANS = 3;
    if (air_id == 1) { AK = 2; ANC = 2; ANS = 2; }
    else if (air_id == 2) { AK = 1; ANC = 1; ANS = 2; }
    else if (air_id != 0) return -1;
    bool multi = air_id != 0;

    Reader r(blob, blob_len);
    const uint8_t* magic = r.bytes(4);
    if (!magic || memcmp(magic, "TSTK", 4) != 0) return -1;
    uint16_t version = r.u16();
    if (version < 1 || version > 5) return -1;
    bool p2 = (version == 5);
    bool ext, wire_multi;
    if (p2) {
        uint16_t flags = r.u16();
        if (!r.ok || (flags & ~uint16_t(3))) return -1; // unknown flags
        ext = (flags & 1) != 0;
        wire_multi = (flags & 2) != 0;
    } else {
        ext = (version == 2 || version == 4);
        wire_multi = (version >= 3);
    }
    if ((p2 ? 1 : 0) != (expect_p2 ? 1 : 0)) return 0; // hash-mode mismatch
    uint64_t n = r.u64(), N = r.u64();
    uint16_t w_k = 1, w_ns = 3;
    if (wire_multi) {
        w_k = r.u16();
        w_ns = r.u16();
        if (!r.ok || w_k == 0 || w_k > 64 || w_ns == 0 || w_ns > 64)
            return -1;
    }
    if (!r.ok) return -1;
    if ((ext ? 1 : 0) != (expect_ext ? 1 : 0)) return 0; // mode mismatch
    // the proof's shape must match the AIR's (verifier.py multi checks);
    // a v1/v2 blob under a multi AIR (or vice versa) is a clean reject
    if (wire_multi != multi) return 0;
    if (multi && (w_k != AK || w_ns != ANS)) return 0;
    uint32_t K = AK, NS = ANS, NC = ANC;
    // widen the product: n = 2^59 * blowup 32 wraps u64 to 0, which would
    // otherwise accept N = 0 and hang/SIGFPE below (Python compares bigints)
    if ((unsigned __int128)N != (unsigned __int128)n * blowup) return 0;
    if (n == 0 || (n & (n - 1)) != 0 || N == 0) return 0;
    int log_n = 0, log_N = 0;
    for (uint64_t t = n; t > 1; t >>= 1) log_n++;
    for (uint64_t t = N; t > 1; t >>= 1) log_N++;
    if (log_n > 27 || log_N > 27) return 0; // beyond BabyBear 2-adicity
    const uint8_t* trace_c = r.bytes(32);
    const uint8_t* quot_c = r.bytes(32);
    uint32_t SL = ext ? 4 : 1; // scalar limbs

    auto read_scalar = [&](E& e) {
        e = E{{0, 0, 0, 0}};
        for (uint32_t i = 0; i < SL; i++) e.c[i] = r.u64();
    };
    // OOD values: non-multi = (t_z, t_gz, t_ggz, q_z); multi = shift-major
    // column-minor rows then q_z. Uniform storage: ood[s*K + c], then q_z.
    std::vector<E> ood(NS * K);
    E t_z{{0, 0, 0, 0}}, t_gz{{0, 0, 0, 0}}, t_ggz{{0, 0, 0, 0}};
    E q_z{{0, 0, 0, 0}};
    if (multi) {
        for (uint32_t i = 0; i < NS * K; i++) read_scalar(ood[i]);
        read_scalar(q_z);
    } else {
        read_scalar(t_z);
        read_scalar(t_gz);
        read_scalar(t_ggz);
        read_scalar(q_z);
        ood[0] = t_z;
        ood[1] = t_gz;
        ood[2] = t_ggz;
    }
    uint32_t n_fri = r.u32();
    if (!r.ok || (uint64_t)n_fri * 32 > r.len - r.off) return -1;
    const uint8_t* fri_c = r.bytes((uint64_t)n_fri * 32);
    uint32_t final_len = r.u32();
    if (!r.ok || (uint64_t)final_len * 8 * SL > r.len - r.off) return -1;
    std::vector<E> final_layer(final_len);
    for (uint32_t i = 0; i < final_len; i++) read_scalar(final_layer[i]);
    uint32_t n_queries = r.u32();
    if (!r.ok) return -1;

    uint64_t g = root_of_unity(log_n);
    uint64_t omega_N = root_of_unity(log_N);
    uint64_t shift = coset_shift % P;

    // ── transcript replay: roots -> z (verifier.rs:31-41) ───────────────
    Transcript tr;
    tr.absorb(trace_c, 32);
    std::vector<uint64_t> alphas(NC, 0);
    if (multi && NC > 1)
        for (uint32_t i = 0; i < NC; i++) alphas[i] = tr.challenge();
    tr.absorb(quot_c, 32);
    uint64_t h_n = bb_pow(shift, N);
    E z{{0, 0, 0, 0}};
    if (ext) {
        for (;;) {
            for (int i = 0; i < 4; i++) z.c[i] = tr.challenge();
            if (z.c[1] == 0 && z.c[2] == 0 && z.c[3] == 0) {
                uint64_t zn = bb_pow(z.c[0], N);
                if (zn == 1 || zn == h_n) continue;
            }
            break;
        }
    } else {
        for (;;) {
            z.c[0] = tr.challenge();
            uint64_t zn = bb_pow(z.c[0], N);
            if (zn != 1 && zn != h_n) break;
        }
    }

    // ── OOD identity: C(z) = Q(z) * Z_H(z) (verifier.rs:43-49) ──────────
    {
        E c_z;
        E bdry = e_sub(z, e_from_base(bb_pow(g, n - 1)));
        if (air_id == 0) { // Fibonacci (air.py FibonacciAir.constraint_at)
            E fib = e_sub(e_sub(ood[2], ood[1]), ood[0]);
            E b2 = e_sub(z, e_from_base(bb_pow(g, n - 2)));
            c_z = e_mul(e_mul(fib, bdry), b2);
        } else if (air_id == 1) { // PairFibonacci: alpha-composed registers
            const E &a0 = ood[0], &b0 = ood[1], &a1 = ood[2], &b1 = ood[3];
            E c1 = e_mul(e_sub(a1, b0), bdry);
            E c2 = e_mul(e_sub(b1, e_add(a0, b0)), bdry);
            c_z = e_add(e_mul_base(c1, alphas[0]), e_mul_base(c2, alphas[1]));
        } else { // SboxChain: T(gx) = (T(x) + x)^7 with RC(x) = x
            E u = e_add(ood[0], z);
            E u2 = e_mul(u, u);
            E u4 = e_mul(u2, u2);
            E u7 = e_mul(e_mul(u4, u2), u);
            c_z = e_mul(e_sub(ood[1], u7), bdry);
        }
        E z_z = e_sub(ext ? e_pow128(z, n) : e_from_base(bb_pow(z.c[0], n)),
                      e_from_base(1));
        if (!e_eq(c_z, e_mul(q_z, z_z))) return 0;
    }
    for (uint32_t i = 0; i < NS * K; i++)
        for (uint32_t l = 0; l < SL; l++) tr.absorb_u64le(ood[i].c[l]);
    for (uint32_t l = 0; l < SL; l++) tr.absorb_u64le(q_z.c[l]);

    // ── FRI schedule checks (verifier.rs:51-79) ─────────────────────────
    if (n_fri == 0 || final_size == 0 || N % final_size) return 0;
    uint32_t expected_folds = 0;
    for (uint64_t t = N / final_size; t > 1; t >>= 1) expected_folds++;
    if (n_fri != expected_folds + 1) return 0;
    if (final_len != final_size) return 0;
    for (uint32_t i = 1; i < final_len; i++)
        for (uint32_t l = 0; l < SL; l++)
            if (final_layer[i].c[l] != final_layer[0].c[l]) return 0;
    if (p2) {
        // unsalted Poseidon2 final-layer root: leaf = sponge(value elems)
        std::vector<uint64_t> digests((uint64_t)final_len * 8);
        for (uint32_t i = 0; i < final_len; i++) {
            uint64_t elems[4];
            for (uint32_t l = 0; l < SL; l++)
                elems[l] = final_layer[i].c[l] % P;
            p2_sponge(elems, SL, digests.data() + (uint64_t)i * 8);
        }
        uint64_t cnt = final_len;
        std::vector<uint64_t> next;
        while (cnt > 1) {
            uint64_t half = (cnt + 1) / 2;
            next.resize(half * 8);
            for (uint64_t i = 0; i < half; i++) {
                const uint64_t* l = digests.data() + (2 * i) * 8;
                const uint64_t* rr =
                    (2 * i + 1 < cnt) ? digests.data() + (2 * i + 1) * 8 : l;
                p2_compress(l, rr, next.data() + i * 8);
            }
            digests.swap(next);
            cnt = half;
        }
        uint8_t got[32];
        p2_digest_bytes(digests.data(), got);
        if (memcmp(got, fri_c + (uint64_t)(n_fri - 1) * 32, 32)) return 0;
    } else {
        // unsalted final-layer root (leaf = raw value limbs LE, tag 0x00)
        std::vector<uint8_t> digests((uint64_t)final_len * 32);
        uint8_t leaf[1 + 32];
        leaf[0] = 0x00;
        for (uint32_t i = 0; i < final_len; i++) {
            for (uint32_t l = 0; l < SL; l++)
                for (int b = 0; b < 8; b++)
                    leaf[1 + 8 * l + b] = uint8_t(final_layer[i].c[l] >> (8 * b));
            sha256_one(leaf, 1 + 8 * SL, digests.data() + (uint64_t)i * 32);
        }
        uint64_t cnt = final_len;
        uint8_t buf[65];
        buf[0] = 0x01;
        std::vector<uint8_t> next;
        while (cnt > 1) {
            uint64_t half = (cnt + 1) / 2;
            next.resize(half * 32);
            for (uint64_t i = 0; i < half; i++) {
                const uint8_t* l = digests.data() + (2 * i) * 32;
                const uint8_t* rr =
                    (2 * i + 1 < cnt) ? digests.data() + (2 * i + 1) * 32 : l;
                memcpy(buf + 1, l, 32);
                memcpy(buf + 33, rr, 32);
                sha256_one(buf, 65, next.data() + i * 32);
            }
            digests.swap(next);
            cnt = half;
        }
        if (memcmp(digests.data(), fri_c + (uint64_t)(n_fri - 1) * 32, 32))
            return 0;
    }

    tr.absorb(fri_c, 32);
    std::vector<E> betas(expected_folds);
    for (uint32_t i = 1; i < n_fri; i++) {
        betas[i - 1] = E{{0, 0, 0, 0}};
        for (uint32_t l = 0; l < SL; l++) betas[i - 1].c[l] = tr.challenge();
        tr.absorb(fri_c + (uint64_t)i * 32, 32);
    }

    // ── query indices (verifier.rs:92-98) ───────────────────────────────
    uint64_t half0 = N / 2;
    std::vector<uint64_t> qidx;
    {
        std::vector<uint8_t> seen(half0, 0);
        while (qidx.size() < num_queries) {
            uint64_t idx = tr.squeeze_raw() % half0;
            if (!seen[idx]) { seen[idx] = 1; qidx.push_back(idx); }
        }
    }
    if (n_queries != num_queries) return 0;

    uint64_t half_inv = (P + 1) / 2;
    uint32_t VL = SL; // DEEP/FRI opening limb count in this mode

    // python compares the RAW opened value to the reduced expectation; a
    // wrong limb count or any unreduced limb can never match
    auto val_eq = [&](const Op& op, const E& expect) {
        if (op.nlimbs < VL) return false; // python length mismatch / shrink
        for (uint32_t l = 0; l < VL; l++)
            if (op.limbs[l] != expect.c[l]) return false;
        // python tuple equality also requires equal length (>4 truncated
        // limbs live only in the leaf bytes; tuple compare uses all limbs)
        return op.nlimbs == VL;
    };
    auto val_e = [&](const Op& op) { // raw limbs (first 4) as an E
        E e{{0, 0, 0, 0}};
        for (uint32_t l = 0; l < 4 && l < op.nlimbs; l++)
            e.c[l] = op.limbs[l];
        return e;
    };

    // ── per-query checks (verifier.rs:105-229) ──────────────────────────
    // wire v2 opening encoding (limb-count prefix) for ext AND multi formats
    bool v2enc = ext || wire_multi || p2;
    for (uint64_t q = 0; q < n_queries; q++) {
        uint64_t stored_index = r.u64();
        Op deep, deep_pair, quot;
        if (!read_opening(r, deep, v2enc) ||
            !read_opening(r, deep_pair, v2enc))
            return -1;
        std::vector<Op> trace_ops(NS);
        for (uint32_t s = 0; s < NS; s++)
            if (!read_opening(r, trace_ops[s], v2enc)) return -1;
        if (!read_opening(r, quot, v2enc)) return -1;
        uint32_t n_fri_op = r.u32();
        // bounds sanity: each opening is at least 24 bytes (two u64 + two
        // empty-count u32s) — reject hostile counts before allocating
        if (!r.ok || (uint64_t)n_fri_op * 2 * 24 > r.len - r.off) return -1;
        std::vector<Op> fri_ops(2 * (uint64_t)n_fri_op);
        for (uint32_t i = 0; i < 2 * n_fri_op; i++)
            if (!read_opening(r, fri_ops[i], v2enc)) return -1;

        uint64_t qi = qidx[q];
        if (stored_index != qi) return 0;
        if (n_fri_op != expected_folds - 1) return 0;

        for (uint32_t s = 0; s < NS; s++) {
            // multi: the opened value must be exactly the k-column bundle
            // (verifier.py checks len(v) == k before the Merkle proof)
            if (trace_ops[s].nlimbs != K) return 0;
            if (!op_verify(trace_ops[s], trace_c,
                           (qi + (uint64_t)s * blowup) % N, N, p2))
                return 0;
        }
        if (!op_verify(quot, quot_c, qi, N, p2)) return 0;
        if (!op_verify(deep, fri_c, qi, N, p2)) return 0;
        if (!op_verify(deep_pair, fri_c, qi + half0, N, p2)) return 0;
        if (quot.nlimbs != 1) return 0; // base int (tuple => Python raises)
        if (ext) {
            // ext-value slots that shape the fold algebra need >= 4 limbs
            if (deep.nlimbs < 4 || deep_pair.nlimbs < 4) return 0;
            for (const Op& o : fri_ops)
                if (o.nlimbs < 4) return 0;
        }

        // DEEP reconstruction
        uint64_t x_i = bb_mul(shift, bb_pow(omega_N, qi));
        E inv_xz = ext ? e_inv(e_sub(e_from_base(x_i), z))
                       : e_from_base(bb_pow(bb_sub(x_i, z.c[0]), P - 2));
        E num = e_sub(e_from_base(quot.limbs[0] % P), q_z);
        for (uint32_t s = 0; s < NS; s++)
            for (uint32_t c = 0; c < K; c++)
                num = e_add(
                    num, e_sub(e_from_base(trace_ops[s].limbs[c] % P),
                               ood[s * K + c]));
        if (!val_eq(deep, e_mul(num, inv_xz))) return 0;

        // fold layer 0 -> 1
        E a0 = val_e(deep), b0 = val_e(deep_pair);
        E avg = e_mul_base(e_add(a0, b0), half_inv);
        E diff = e_mul_base(e_sub(a0, b0), half_inv);
        E prev = e_add(
            avg,
            e_mul_base(e_mul(diff, betas[0]), bb_pow(x_i, P - 2)));

        uint64_t pos = qi;
        for (uint32_t layer = 0; layer < n_fri_op; layer++) {
            uint32_t fold_k = layer + 1;
            uint64_t layer_size = N >> fold_k;
            uint64_t half = layer_size / 2;
            uint64_t lo = pos % half;
            bool in_first_half = (pos == lo);
            const Op& op = fri_ops[2 * layer];
            const Op& op_pair = fri_ops[2 * layer + 1];
            if (!op_verify(op, fri_c + (uint64_t)fold_k * 32, lo,
                           layer_size, p2))
                return 0;
            if (!op_verify(op_pair, fri_c + (uint64_t)fold_k * 32, lo + half,
                           layer_size, p2))
                return 0;
            if (in_first_half) {
                if (!val_eq(op, prev)) return 0;
            } else if (!val_eq(op_pair, prev)) {
                return 0;
            }
            uint64_t x = bb_pow(bb_mul(shift, bb_pow(omega_N, lo)),
                                1ULL << fold_k);
            E a = val_e(op), b = val_e(op_pair);
            avg = e_mul_base(e_add(a, b), half_inv);
            diff = e_mul_base(e_sub(a, b), half_inv);
            prev = e_add(
                avg,
                e_mul_base(e_mul(diff, betas[fold_k]), bb_pow(x, P - 2)));
            pos = lo;
        }
        for (uint32_t l = 0; l < SL; l++)
            if (final_layer[pos].c[l] != prev.c[l]) return 0;
    }
    return 1;
}

} // extern "C"
