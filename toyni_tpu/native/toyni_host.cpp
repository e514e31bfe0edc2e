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
// Exposed with a C ABI for ctypes (no pybind11 dependency); built by
// native/build.py which degrades gracefully when no toolchain exists
// (mirroring build.rs:28-37).

#include <cstdint>
#include <cstring>
#include <cstdlib>

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
