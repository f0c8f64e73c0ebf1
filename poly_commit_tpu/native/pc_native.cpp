// Native host runtime for poly_commit_tpu: batched hashing + Merkle levels.
//
// The reference's hash layer is ark-crypto-primitives' CRHScheme /
// TwoToOneCRHScheme + MerkleTree (used by the linear-code schemes at
// /root/reference/poly-commit/src/linear_codes/mod.rs:506-521, column
// hashing at :257-263) and the blake2 digests hashed by IPA/Hyrax
// transcripts (ipa_pc/mod.rs:74-87, hyrax/mod.rs:26). Those are native
// (Rust) in the reference; this file is the TPU build's native equivalent
// for the host side of the pipeline: TPU kernels produce column/limb
// buffers, and this module turns them into leaf digests and Merkle levels
// without ping-ponging through Python-per-element code.
//
// C ABI only (loaded via ctypes; no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <cstddef>

// ---------------------------------------------------------------------------
// SHA-256 (FIPS 180-4)
// ---------------------------------------------------------------------------

namespace {

struct Sha256Ctx {
    uint32_t h[8];
    uint64_t len;      // bytes fed so far
    uint8_t buf[64];
    size_t buf_len;
};

static const uint32_t K256[64] = {
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
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline uint32_t rotr32(uint32_t x, int n) {
    return (x >> n) | (x << (32 - n));
}

static void sha256_init(Sha256Ctx* c) {
    static const uint32_t iv[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                   0xa54ff53a, 0x510e527f, 0x9b05688c,
                                   0x1f83d9ab, 0x5be0cd19};
    std::memcpy(c->h, iv, sizeof(iv));
    c->len = 0;
    c->buf_len = 0;
}

static void sha256_block(Sha256Ctx* c, const uint8_t* p) {
    uint32_t w[64];
    for (int i = 0; i < 16; i++)
        w[i] = (uint32_t(p[4 * i]) << 24) | (uint32_t(p[4 * i + 1]) << 16) |
               (uint32_t(p[4 * i + 2]) << 8) | uint32_t(p[4 * i + 3]);
    for (int i = 16; i < 64; i++) {
        uint32_t s0 = rotr32(w[i - 15], 7) ^ rotr32(w[i - 15], 18) ^ (w[i - 15] >> 3);
        uint32_t s1 = rotr32(w[i - 2], 17) ^ rotr32(w[i - 2], 19) ^ (w[i - 2] >> 10);
        w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = c->h[0], b = c->h[1], cc = c->h[2], d = c->h[3];
    uint32_t e = c->h[4], f = c->h[5], g = c->h[6], h = c->h[7];
    for (int i = 0; i < 64; i++) {
        uint32_t S1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = h + S1 + ch + K256[i] + w[i];
        uint32_t S0 = rotr32(a, 2) ^ rotr32(a, 13) ^ rotr32(a, 22);
        uint32_t maj = (a & b) ^ (a & cc) ^ (b & cc);
        uint32_t t2 = S0 + maj;
        h = g; g = f; f = e; e = d + t1;
        d = cc; cc = b; b = a; a = t1 + t2;
    }
    c->h[0] += a; c->h[1] += b; c->h[2] += cc; c->h[3] += d;
    c->h[4] += e; c->h[5] += f; c->h[6] += g; c->h[7] += h;
}

static void sha256_update(Sha256Ctx* c, const uint8_t* p, size_t n) {
    c->len += n;
    if (c->buf_len) {
        size_t take = 64 - c->buf_len;
        if (take > n) take = n;
        std::memcpy(c->buf + c->buf_len, p, take);
        c->buf_len += take;
        p += take;
        n -= take;
        if (c->buf_len == 64) {
            sha256_block(c, c->buf);
            c->buf_len = 0;
        }
    }
    while (n >= 64) {
        sha256_block(c, p);
        p += 64;
        n -= 64;
    }
    if (n) {
        std::memcpy(c->buf, p, n);
        c->buf_len = n;
    }
}

static void sha256_final(Sha256Ctx* c, uint8_t out[32]) {
    uint64_t bits = c->len * 8;
    uint8_t pad = 0x80;
    sha256_update(c, &pad, 1);
    uint8_t z = 0;
    while (c->buf_len != 56) sha256_update(c, &z, 1);
    uint8_t lenb[8];
    for (int i = 0; i < 8; i++) lenb[i] = uint8_t(bits >> (56 - 8 * i));
    sha256_update(c, lenb, 8);
    for (int i = 0; i < 8; i++) {
        out[4 * i] = uint8_t(c->h[i] >> 24);
        out[4 * i + 1] = uint8_t(c->h[i] >> 16);
        out[4 * i + 2] = uint8_t(c->h[i] >> 8);
        out[4 * i + 3] = uint8_t(c->h[i]);
    }
}

// ---------------------------------------------------------------------------
// BLAKE2s-256 (RFC 7693), unkeyed
// ---------------------------------------------------------------------------

static const uint32_t B2S_IV[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                   0xa54ff53a, 0x510e527f, 0x9b05688c,
                                   0x1f83d9ab, 0x5be0cd19};

static const uint8_t B2S_SIGMA[10][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0}};

static inline uint32_t rotr32b(uint32_t x, int n) {
    return (x >> n) | (x << (32 - n));
}

struct Blake2sCtx {
    uint32_t h[8];
    uint64_t t;          // bytes compressed so far
    uint8_t buf[64];
    size_t buf_len;
};

static void b2s_init(Blake2sCtx* c, size_t outlen) {
    for (int i = 0; i < 8; i++) c->h[i] = B2S_IV[i];
    // parameter block: digest_length | key_len<<8 | fanout<<16 | depth<<24
    c->h[0] ^= 0x01010000u ^ uint32_t(outlen);
    c->t = 0;
    c->buf_len = 0;
}

static void b2s_compress(Blake2sCtx* c, const uint8_t* block, uint64_t t,
                         bool last) {
    uint32_t m[16];
    for (int i = 0; i < 16; i++)
        m[i] = uint32_t(block[4 * i]) | (uint32_t(block[4 * i + 1]) << 8) |
               (uint32_t(block[4 * i + 2]) << 16) |
               (uint32_t(block[4 * i + 3]) << 24);
    uint32_t v[16];
    for (int i = 0; i < 8; i++) v[i] = c->h[i];
    for (int i = 0; i < 8; i++) v[8 + i] = B2S_IV[i];
    v[12] ^= uint32_t(t);
    v[13] ^= uint32_t(t >> 32);
    if (last) v[14] = ~v[14];
#define B2S_G(a, b, cc, d, x, y)                 \
    v[a] = v[a] + v[b] + (x);                    \
    v[d] = rotr32b(v[d] ^ v[a], 16);             \
    v[cc] = v[cc] + v[d];                        \
    v[b] = rotr32b(v[b] ^ v[cc], 12);            \
    v[a] = v[a] + v[b] + (y);                    \
    v[d] = rotr32b(v[d] ^ v[a], 8);              \
    v[cc] = v[cc] + v[d];                        \
    v[b] = rotr32b(v[b] ^ v[cc], 7)
    for (int r = 0; r < 10; r++) {
        const uint8_t* s = B2S_SIGMA[r];
        B2S_G(0, 4, 8, 12, m[s[0]], m[s[1]]);
        B2S_G(1, 5, 9, 13, m[s[2]], m[s[3]]);
        B2S_G(2, 6, 10, 14, m[s[4]], m[s[5]]);
        B2S_G(3, 7, 11, 15, m[s[6]], m[s[7]]);
        B2S_G(0, 5, 10, 15, m[s[8]], m[s[9]]);
        B2S_G(1, 6, 11, 12, m[s[10]], m[s[11]]);
        B2S_G(2, 7, 8, 13, m[s[12]], m[s[13]]);
        B2S_G(3, 4, 9, 14, m[s[14]], m[s[15]]);
    }
#undef B2S_G
    for (int i = 0; i < 8; i++) c->h[i] ^= v[i] ^ v[8 + i];
}

static void b2s_update(Blake2sCtx* c, const uint8_t* p, size_t n) {
    while (n > 0) {
        if (c->buf_len == 64) {
            c->t += 64;
            b2s_compress(c, c->buf, c->t, false);
            c->buf_len = 0;
        }
        size_t take = 64 - c->buf_len;
        if (take > n) take = n;
        std::memcpy(c->buf + c->buf_len, p, take);
        c->buf_len += take;
        p += take;
        n -= take;
    }
}

static void b2s_final(Blake2sCtx* c, uint8_t* out, size_t outlen) {
    c->t += c->buf_len;
    std::memset(c->buf + c->buf_len, 0, 64 - c->buf_len);
    b2s_compress(c, c->buf, c->t, true);
    for (size_t i = 0; i < outlen; i++) out[i] = uint8_t(c->h[i / 4] >> (8 * (i % 4)));
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Hash n fixed-size messages laid out contiguously: in[i*msg_len .. ) ->
// out[i*32 .. ). alg: 0 = SHA-256, 1 = BLAKE2s-256.
void pc_hash_many(int alg, const uint8_t* in, uint64_t msg_len, uint64_t n,
                  uint8_t* out) {
    if (alg == 0) {
        for (uint64_t i = 0; i < n; i++) {
            Sha256Ctx c;
            sha256_init(&c);
            sha256_update(&c, in + i * msg_len, msg_len);
            sha256_final(&c, out + i * 32);
        }
    } else {
        for (uint64_t i = 0; i < n; i++) {
            Blake2sCtx c;
            b2s_init(&c, 32);
            b2s_update(&c, in + i * msg_len, msg_len);
            b2s_final(&c, out + i * 32, 32);
        }
    }
}

// One compression level: 2k equal-size nodes -> k digests (32 bytes each).
// Parent i = H(node[2i] || node[2i+1]).
void pc_merkle_level(int alg, const uint8_t* nodes, uint64_t node_len,
                     uint64_t n_pairs, uint8_t* out) {
    pc_hash_many(alg, nodes, 2 * node_len, n_pairs, out);
}

// Full tree from leaves (n_leaves a power of two, each leaf_len bytes,
// identity leaf hash). Writes every internal level bottom-up into `out`:
// level 1 (n/2 digests), level 2 (n/4), ..., root — (n_leaves - 1) * 32
// bytes total. Matches utils/merkle.py MerkleTree level order.
void pc_merkle_levels(int alg, const uint8_t* leaves, uint64_t leaf_len,
                      uint64_t n_leaves, uint8_t* out) {
    uint64_t n = n_leaves / 2;
    pc_hash_many(alg, leaves, 2 * leaf_len, n, out);
    const uint8_t* prev = out;
    uint8_t* cur = out + n * 32;
    while (n > 1) {
        n /= 2;
        pc_hash_many(alg, prev, 64, n, cur);
        prev = cur;
        cur += n * 32;
    }
}

int pc_native_abi_version() { return 1; }

}  // extern "C"
