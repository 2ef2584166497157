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
