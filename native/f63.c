/* Native host-side f63 + Rescue63 kernels for the verifier and Fiat-Shamir
 * coin (counterpart of the reference's Rust field/hash used by its verifier;
 * the device side stays JAX/XLA — this accelerates the host paths that the
 * protocol forces to be serial: transcript draws, query checks, path
 * verification).
 *
 * Exposed via ctypes (no pybind11 in this image): see
 * certificate_stark_tpu/utils/native.py. Build: scripts/build_native.sh.
 */
#include <stdint.h>
#include <stddef.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

static const u64 P = 4719772409484279809ULL;

static inline u64 f_add(u64 a, u64 b) {
    u64 s = a + b; /* a,b < p < 2^63: no overflow */
    return s >= P ? s - P : s;
}

static inline u64 f_sub(u64 a, u64 b) {
    return a >= b ? a - b : a + P - b;
}

static inline u64 f_mul(u64 a, u64 b) {
    u128 t = (u128)a * b;
    return (u64)(t % P);
}

static u64 f_pow(u64 a, u64 e) {
    u64 r = 1;
    while (e) {
        if (e & 1) r = f_mul(r, a);
        a = f_mul(a, a);
        e >>= 1;
    }
    return r;
}

/* ---- exported field ops (vector forms) -------------------------------- */
void f63_mul_vec(const u64 *a, const u64 *b, u64 *out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = f_mul(a[i], b[i]);
}

void f63_pow_vec(const u64 *a, u64 e, u64 *out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = f_pow(a[i], e);
}

void f63_inv_vec(const u64 *a, u64 *out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = f_pow(a[i], P - 2);
}

/* Montgomery-form powers table: out[i] = base^i * R mod P (base canonical).
 * Multiplying a Montgomery value by a canonical scalar stays in Montgomery
 * form, so the whole table is one sequential modmul chain. Feeds the
 * host-side protocol tables (ops/field.np_powers), whose limb-form numpy
 * log-doubling costs minutes at a 2^23 domain. */
void f63_powers_mont(u64 base, u64 n, u64 *out) {
    const u64 R = 18446744073709551615ULL % P + 1; /* 2^64 mod P */
    u64 cur = R % P;
    for (u64 i = 0; i < n; i++) {
        out[i] = cur;
        cur = f_mul(cur, base);
    }
}

/* ---- Rescue63 --------------------------------------------------------- */
#define STATE 14
static const u64 INV_ALPHA = 3146514939656186539ULL;

/* constant tables injected at build time (generated from params/data.py) */
#include "rescue_tables.h"

static void mds_apply(u64 *st, const u64 *mds) {
    u64 out[STATE];
    for (int i = 0; i < STATE; i++) {
        u128 acc = 0;
        for (int j = 0; j < STATE; j++)
            acc += (u128)mds[i * STATE + j] * st[j] % P;
        out[i] = (u64)(acc % P);
    }
    for (int i = 0; i < STATE; i++) st[i] = out[i];
}

void rescue_apply_round(u64 *st, int step) {
    const u64 *ark = RESCUE_ARK[step % 8];
    for (int i = 0; i < STATE; i++) st[i] = f_mul(st[i], f_mul(st[i], st[i]));
    mds_apply(st, RESCUE_MDS);
    for (int i = 0; i < STATE; i++) st[i] = f_add(st[i], ark[i]);
    for (int i = 0; i < STATE; i++) st[i] = f_pow(st[i], INV_ALPHA);
    mds_apply(st, RESCUE_MDS);
    for (int i = 0; i < STATE; i++) st[i] = f_add(st[i], ark[STATE + i]);
}

void rescue_permutation(u64 *st) {
    for (int r = 0; r < 7; r++) rescue_apply_round(st, r);
}

/* sponge digest without padding (reference rescue.rs:109-131) */
void rescue_digest(const u64 *data, size_t len, u64 *out7) {
    u64 st[STATE] = {0};
    size_t i = 0;
    for (size_t k = 0; k < len; k++) {
        st[i] = f_add(st[i], data[k] % P);
        if (++i == 7) {
            rescue_permutation(st);
            i = 0;
        }
    }
    if (i > 0) rescue_permutation(st);
    for (int j = 0; j < 7; j++) out7[j] = st[j];
}

void rescue_merge(const u64 *d0, const u64 *d1, u64 *out7) {
    u64 st[STATE];
    for (int j = 0; j < 7; j++) st[j] = d0[j] % P;
    for (int j = 0; j < 7; j++) st[7 + j] = d1[j] % P;
    rescue_permutation(st);
    for (int j = 0; j < 7; j++) out7[j] = st[j];
}

/* full rescue hash-chain trace rows (the reference bench workload,
   benches/rescue.rs trace): cycle k rows are the 8 sponge states
   [d_k || 0], round_1, .., round_7 with d_{k+1} = row_7[0..7].
   out: length*8*14 u64 values (standard form), row-major [cycle, row, col]. */
void rescue_chain_trace(const u64 *seed7, u64 length, u64 *out) {
    u64 st[STATE];
    for (int j = 0; j < 7; j++) st[j] = seed7[j] % P;
    for (u64 k = 0; k < length; k++) {
        for (int j = 7; j < STATE; j++) st[j] = 0;
        u64 *cycle = out + k * 8 * STATE;
        for (int j = 0; j < STATE; j++) cycle[j] = st[j];
        for (int r = 0; r < 7; r++) {
            rescue_apply_round(st, r);
            for (int j = 0; j < STATE; j++) cycle[(r + 1) * STATE + j] = st[j];
        }
    }
}

/* batched merkle path verification: cur = leaf; fold siblings by index bits */
int rescue_verify_path(const u64 *root, u64 index, const u64 *leaf,
                       const u64 *path, size_t depth) {
    u64 cur[7];
    for (int j = 0; j < 7; j++) cur[j] = leaf[j];
    for (size_t l = 0; l < depth; l++) {
        const u64 *sib = path + 7 * l;
        u64 nxt[7];
        if (index & 1) rescue_merge(sib, cur, nxt);
        else rescue_merge(cur, sib, nxt);
        for (int j = 0; j < 7; j++) cur[j] = nxt[j];
        index >>= 1;
    }
    for (int j = 0; j < 7; j++)
        if (cur[j] != root[j]) return 0;
    return 1;
}

/* ---------------------------------------------------------------------------
 * BLAKE3-256 host path (full spec incl. chunk tree; default key, 32B output).
 * Accelerates the Fiat-Shamir coin and verifier Merkle-path checks in blake3
 * commitment mode (the reference's default hash, HashFunction::Blake3_256) —
 * the Python oracle in ops/blake3.py stays the semantic reference.
 * ------------------------------------------------------------------------- */
#include <string.h>

typedef uint32_t u32;

static const u32 B3_IV[8] = {
    0x6a09e667u, 0xbb67ae85u, 0x3c6ef372u, 0xa54ff53au,
    0x510e527fu, 0x9b05688cu, 0x1f83d9abu, 0x5be0cd19u};
static const unsigned char B3_PERM[16] = {
    2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8};

enum { B3_CHUNK_START = 1, B3_CHUNK_END = 2, B3_PARENT = 4, B3_ROOT = 8 };

static inline u32 b3_rotr(u32 x, int n) { return (x >> n) | (x << (32 - n)); }

static inline void b3_g(u32 *v, int a, int b, int c, int d, u32 mx, u32 my) {
    v[a] += v[b] + mx; v[d] = b3_rotr(v[d] ^ v[a], 16);
    v[c] += v[d];      v[b] = b3_rotr(v[b] ^ v[c], 12);
    v[a] += v[b] + my; v[d] = b3_rotr(v[d] ^ v[a], 8);
    v[c] += v[d];      v[b] = b3_rotr(v[b] ^ v[c], 7);
}

static void b3_compress(u32 cv[8], const u32 block[16], u64 counter,
                        u32 block_len, u32 flags) {
    u32 v[16], m[16], t[16];
    for (int i = 0; i < 8; i++) v[i] = cv[i];
    for (int i = 0; i < 4; i++) v[8 + i] = B3_IV[i];
    v[12] = (u32)counter; v[13] = (u32)(counter >> 32);
    v[14] = block_len; v[15] = flags;
    memcpy(m, block, sizeof m);
    for (int r = 0; r < 7; r++) {
        b3_g(v, 0, 4, 8, 12, m[0], m[1]);
        b3_g(v, 1, 5, 9, 13, m[2], m[3]);
        b3_g(v, 2, 6, 10, 14, m[4], m[5]);
        b3_g(v, 3, 7, 11, 15, m[6], m[7]);
        b3_g(v, 0, 5, 10, 15, m[8], m[9]);
        b3_g(v, 1, 6, 11, 12, m[10], m[11]);
        b3_g(v, 2, 7, 8, 13, m[12], m[13]);
        b3_g(v, 3, 4, 9, 14, m[14], m[15]);
        if (r < 6) {
            for (int i = 0; i < 16; i++) t[i] = m[B3_PERM[i]];
            memcpy(m, t, sizeof m);
        }
    }
    for (int i = 0; i < 8; i++) cv[i] = v[i] ^ v[i + 8];
}

static void b3_chunk_cv(const unsigned char *chunk, size_t len, u64 counter,
                        int is_root, u32 out[8]) {
    u32 cv[8];
    memcpy(cv, B3_IV, sizeof cv);
    size_t nblocks = len ? (len + 63) / 64 : 1;
    for (size_t i = 0; i < nblocks; i++) {
        unsigned char buf[64] = {0};
        size_t blen = (i == nblocks - 1) ? len - 64 * i : 64;
        memcpy(buf, chunk + 64 * i, blen);
        u32 m[16];
        memcpy(m, buf, sizeof m); /* little-endian host */
        u32 flags = (i == 0 ? B3_CHUNK_START : 0)
                  | (i == nblocks - 1 ? B3_CHUNK_END : 0)
                  | (is_root && i == nblocks - 1 ? B3_ROOT : 0);
        b3_compress(cv, m, counter, (u32)blen, flags);
    }
    memcpy(out, cv, 8 * sizeof(u32));
}

static void b3_tree(const unsigned char *data, size_t len, u64 counter,
                    int is_root, u32 out[8]) {
    if (len <= 1024) { b3_chunk_cv(data, len, counter, is_root, out); return; }
    size_t chunks = (len + 1023) / 1024;
    size_t left = 1;
    while (left * 2 < chunks) left *= 2; /* largest power of two < chunks */
    u32 l[8], r[8], m[16], cv[8];
    b3_tree(data, left * 1024, counter, 0, l);
    b3_tree(data + left * 1024, len - left * 1024, counter + left, 0, r);
    memcpy(m, l, 8 * sizeof(u32));
    memcpy(m + 8, r, 8 * sizeof(u32));
    memcpy(cv, B3_IV, sizeof cv);
    b3_compress(cv, m, 0, 64, B3_PARENT | (is_root ? B3_ROOT : 0));
    memcpy(out, cv, 8 * sizeof(u32));
}

void blake3_hash(const unsigned char *data, size_t len,
                 unsigned char out32[32]) {
    u32 cv[8];
    b3_tree(data, len, 0, 1, cv);
    memcpy(out32, cv, 32); /* little-endian host */
}
