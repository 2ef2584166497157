/* CPU-fallback batched NTT / LDE over f63.
 *
 * The TPU compute path for trace low-degree extension is the batched JAX
 * radix-2 NTT (ops/ntt.py, counterpart of winterfell's per-column LDE used by
 * every reference prover, /root/reference/src/prover.rs:101-134).  Off-TPU,
 * XLA:CPU leaves ~10x on the table for this memory-bound butterfly pattern,
 * so the prover substitutes this native transform when running on the CPU
 * backend (engine/prover.py gates it; bit-identical outputs are asserted in
 * tests/test_native.py).
 *
 * All data is Montgomery-form u64 (R = 2^64), the layout produced by
 * ops/field.py pack_u64.  Roots/offsets are passed in standard form and
 * converted on entry.  Each call computes its twiddle tables once (O(n) mults,
 * negligible next to the O(w n log n) butterflies) and runs rows in parallel
 * with OpenMP.
 */
#include <stdint.h>
#include <stddef.h>
#include <stdlib.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

static const u64 P = 4719772409484279809ULL;
static const u64 NPRIME = 0x417fffffffffffffULL;   /* -p^-1 mod 2^64 */
static const u64 R2 = 3635333122111952146ULL;      /* 2^128 mod p */
static const u64 ONE_M = 4287426845256712189ULL;   /* 2^64 mod p (Mont 1) */

static inline u64 madd(u64 a, u64 b) { u64 s = a + b; return s >= P ? s - P : s; }
static inline u64 msub(u64 a, u64 b) { return a >= b ? a - b : a + (P - b); }

static inline u64 mmul(u64 a, u64 b) {
    u128 t = (u128)a * b;
    u64 m = (u64)t * NPRIME;
    u128 u = (t + (u128)m * P) >> 64;
    u64 r = (u64)u;
    return r >= P ? r - P : r;
}

static u64 mpow(u64 a_m, u64 e) {
    u64 r = ONE_M;
    while (e) {
        if (e & 1) r = mmul(r, a_m);
        a_m = mmul(a_m, a_m);
        e >>= 1;
    }
    return r;
}

static inline u64 to_mont(u64 a) { return mmul(a % P, R2); }

/* ---- twiddle / permutation tables ------------------------------------- */

/* stage-packed twiddles: for stage block size m = 2,4,..,n the m/2 powers of
 * w_m = root^(n/m) are stored consecutively (total n-1 entries) — every
 * butterfly pass then reads its twiddles contiguously. */
static void fill_wtab(u64 *wtab, u64 n, u64 root_m) {
    for (u64 m = 2; m <= n; m <<= 1) {
        u64 wm = mpow(root_m, n / m);
        u64 half = m >> 1;
        u64 cur = ONE_M;
        for (u64 j = 0; j < half; j++) {
            *wtab++ = cur;
            cur = mmul(cur, wm);
        }
    }
}

static void fill_bitrev(u32 *rev, u64 n) {
    int logn = 0;
    while ((1ULL << logn) < n) logn++;
    rev[0] = 0;
    for (u64 i = 1; i < n; i++)
        rev[i] = (rev[i >> 1] >> 1) | ((u32)(i & 1) << (logn - 1));
}

/* in-place DIT NTT of one row; input in natural order via scratch bit-rev */
static void ntt_row(u64 *x, u64 n, const u64 *wtab, const u32 *rev) {
    for (u64 i = 0; i < n; i++) {
        u32 r = rev[i];
        if (r > i) { u64 t = x[i]; x[i] = x[r]; x[r] = t; }
    }
    const u64 *wt = wtab;
    for (u64 m = 2; m <= n; m <<= 1) {
        u64 half = m >> 1;
        for (u64 k0 = 0; k0 < n; k0 += m) {
            u64 *lo = x + k0, *hi = x + k0 + half;
            for (u64 j = 0; j < half; j++) {
                u64 t = mmul(hi[j], wt[j]);
                u64 e = lo[j];
                lo[j] = madd(e, t);
                hi[j] = msub(e, t);
            }
        }
        wt += half;
    }
}

/* ---- exported entry points -------------------------------------------- */

/* Batched in-place NTT along rows.  data: [w][n] Montgomery u64.
 * root_std: primitive n-th root of unity, standard form (pass the INVERSE
 * root for an inverse transform).  ninv_std: n^-1 mod p standard form for the
 * inverse scale, or 0 for a forward transform. */
void f63_ntt_batch(u64 *data, u64 w, u64 n, u64 root_std, u64 ninv_std) {
    if (n <= 1) return;
    u64 root_m = to_mont(root_std);
    u64 *wtab = malloc((n - 1) * sizeof(u64));
    u32 *rev = malloc(n * sizeof(u32));
    fill_wtab(wtab, n, root_m);
    fill_bitrev(rev, n);
    u64 ninv_m = ninv_std ? to_mont(ninv_std) : 0;
#pragma omp parallel for schedule(static)
    for (u64 r = 0; r < w; r++) {
        u64 *row = data + r * n;
        ntt_row(row, n, wtab, rev);
        if (ninv_m)
            for (u64 i = 0; i < n; i++) row[i] = mmul(row[i], ninv_m);
    }
    free(wtab);
    free(rev);
}

/* Coset scale in place: row[i] *= offset^i (offset standard form). */
void f63_coset_scale_batch(u64 *data, u64 w, u64 n, u64 offset_std) {
    u64 off_m = to_mont(offset_std);
    u64 *opow = malloc(n * sizeof(u64));
    opow[0] = ONE_M;
    for (u64 i = 1; i < n; i++) opow[i] = mmul(opow[i - 1], off_m);
#pragma omp parallel for schedule(static)
    for (u64 r = 0; r < w; r++) {
        u64 *row = data + r * n;
        for (u64 i = 0; i < n; i++) row[i] = mmul(row[i], opow[i]);
    }
    free(opow);
}

/* Fused trace LDE (engine/prover.py phase_trace): evaluations over the size-n
 * subgroup -> polynomial coefficients AND evaluations over the blowup*n coset.
 *   evals       [w][n]   Montgomery (read-only)
 *   coeffs_out  [w][n]   iNTT(evals)
 *   lde_out     [w][b*n] NTT(pad(coeffs * offset^i))
 * root_n_std / root_bn_std: primitive FORWARD roots for sizes n and b*n. */
void f63_lde_batch(const u64 *evals, u64 w, u64 n, u64 blowup,
                   u64 root_n_std, u64 root_bn_std, u64 offset_std,
                   u64 *coeffs_out, u64 *lde_out) {
    u64 bn = blowup * n;
    u64 root_n_m = to_mont(root_n_std);
    u64 iroot_n_m = mpow(root_n_m, P - 2);
    u64 ninv_m = mpow(to_mont(n), P - 2);
    u64 root_bn_m = to_mont(root_bn_std);
    u64 off_m = to_mont(offset_std);

    u64 *wtab_i = malloc((n - 1) * sizeof(u64));
    u32 *rev_n = malloc(n * sizeof(u32));
    u64 *wtab_f = malloc((bn - 1) * sizeof(u64));
    u32 *rev_bn = malloc(bn * sizeof(u32));
    u64 *opow = malloc(n * sizeof(u64));
    fill_wtab(wtab_i, n, iroot_n_m);
    fill_bitrev(rev_n, n);
    fill_wtab(wtab_f, bn, root_bn_m);
    fill_bitrev(rev_bn, bn);
    opow[0] = ONE_M;
    for (u64 i = 1; i < n; i++) opow[i] = mmul(opow[i - 1], off_m);

#pragma omp parallel for schedule(static)
    for (u64 r = 0; r < w; r++) {
        const u64 *src = evals + r * n;
        u64 *cf = coeffs_out + r * n;
        u64 *big = lde_out + r * bn;
        memcpy(cf, src, n * sizeof(u64));
        ntt_row(cf, n, wtab_i, rev_n);
        for (u64 i = 0; i < n; i++) cf[i] = mmul(cf[i], ninv_m);
        for (u64 i = 0; i < n; i++) big[i] = mmul(cf[i], opow[i]);
        memset(big + n, 0, (bn - n) * sizeof(u64));
        ntt_row(big, bn, wtab_f, rev_bn);
    }
    free(wtab_i);
    free(rev_n);
    free(wtab_f);
    free(rev_bn);
    free(opow);
}

/* Inverse of the big-domain coset evaluation (engine/prover.py intt_big):
 * evaluations over the offset-coset of size n -> coefficients, in place.
 * root_std: FORWARD primitive n-th root; offset_std: the coset offset. */
void f63_intt_coset_batch(u64 *data, u64 w, u64 n, u64 root_std,
                          u64 offset_std) {
    u64 root_m = to_mont(root_std);
    u64 iroot_m = mpow(root_m, P - 2);
    u64 ninv_m = mpow(to_mont(n), P - 2);
    u64 ioff_m = mpow(to_mont(offset_std), P - 2);

    u64 *wtab = malloc((n - 1) * sizeof(u64));
    u32 *rev = malloc(n * sizeof(u32));
    u64 *opow = malloc(n * sizeof(u64));
    fill_wtab(wtab, n, iroot_m);
    fill_bitrev(rev, n);
    opow[0] = ONE_M;
    for (u64 i = 1; i < n; i++) opow[i] = mmul(opow[i - 1], ioff_m);
#pragma omp parallel for schedule(static)
    for (u64 r = 0; r < w; r++) {
        u64 *row = data + r * n;
        ntt_row(row, n, wtab, rev);
        for (u64 i = 0; i < n; i++)
            row[i] = mmul(mmul(row[i], ninv_m), opow[i]);
    }
    free(wtab);
    free(rev);
    free(opow);
}
