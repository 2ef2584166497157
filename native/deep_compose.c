/* CPU-fallback composition-polynomial and DEEP-composition kernels.
 *
 * The TPU compute path for these phases is the fused JAX kernel
 * (engine/prover.py _compose_body / phase_deep, counterpart of the winterfell
 * engine's constraint composition + DEEP stages consumed by every reference
 * prover, /root/reference/src/prover.rs:101-134).  Off-TPU, XLA:CPU leaves
 * ~10x on the table for these bandwidth-bound passes, so the prover
 * substitutes the native kernels on the CPU backend (bit-identical outputs —
 * all arithmetic is exact mod p, asserted in tests/test_native_eval.py).
 *
 * Data is Montgomery-form u64 (R = 2^64).  Extension elements (degree d = 1,
 * 2, 3) are coordinate arrays c[0..d); the towers are those of
 * params/extensions.py: x^2 = 3 (quadratic), x^3 = 3x + 1 (cubic).
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

static inline u64 minv(u64 a_m) { return mpow(a_m, P - 2); }

/* tower constants (params/extensions.py), Montgomery form */
#define NR_M 3422735716801576949ULL    /* to_mont(3): checked via f63_ext_nr_mont */
#define A1_M 3422735716801576949ULL    /* to_mont(3) */
#define A0_M ONE_M                     /* to_mont(1) */

/* ---- extension arithmetic (d = 1, 2, 3) -------------------------------- */

static inline void ext_mul(const u64 *a, const u64 *b, u64 *out, int d) {
    if (d == 1) {
        out[0] = mmul(a[0], b[0]);
    } else if (d == 2) {
        u64 v0 = mmul(a[0], b[0]), v1 = mmul(a[1], b[1]);
        u64 c1 = madd(mmul(a[0], b[1]), mmul(a[1], b[0]));
        out[0] = madd(v0, mmul(NR_M, v1));
        out[1] = c1;
    } else {
        u64 c[5] = {0, 0, 0, 0, 0};
        for (int i = 0; i < 3; i++)
            for (int j = 0; j < 3; j++)
                c[i + j] = madd(c[i + j], mmul(a[i], b[j]));
        /* x^3 = A1 x + A0 ; x^4 = A1 x^2 + A0 x */
        out[0] = madd(c[0], mmul(A0_M, c[3]));
        out[1] = madd(c[1], madd(mmul(A1_M, c[3]), mmul(A0_M, c[4])));
        out[2] = madd(c[2], mmul(A1_M, c[4]));
    }
}

/* out += s * b for base scalar s and ext b */
static inline void ext_axpy(u64 s, const u64 *b, u64 *out, int d) {
    for (int e = 0; e < d; e++) out[e] = madd(out[e], mmul(s, b[e]));
}

static void ext_inv(const u64 *a, u64 *out, int d) {
    if (d == 1) {
        out[0] = minv(a[0]);
    } else if (d == 2) {
        u64 norm = msub(mmul(a[0], a[0]), mmul(NR_M, mmul(a[1], a[1])));
        u64 t = minv(norm);
        out[0] = mmul(a[0], t);
        out[1] = mmul(msub(0, a[1]), t);
    } else {
        /* Cramer on the multiplication matrix (ops/extfield.py ext_inv_vec) */
        u64 a0 = a[0], a1 = a[1], a2 = a[2];
        u64 m11 = madd(a0, mmul(A1_M, a2));
        u64 m12 = mmul(A0_M, a2);
        u64 m13 = mmul(A0_M, a1);
        u64 m22 = m11;
        u64 m23 = madd(m12, mmul(A1_M, a1));
        u64 c00 = msub(mmul(m22, m11), mmul(m23, a1));
        u64 c01 = msub(0, msub(mmul(a1, m11), mmul(m23, a2)));
        u64 c02 = msub(mmul(a1, a1), mmul(m22, a2));
        u64 det = madd(mmul(a0, c00), madd(mmul(m12, c01), mmul(m13, c02)));
        u64 dinv = minv(det);
        out[0] = mmul(c00, dinv);
        out[1] = mmul(c01, dinv);
        out[2] = mmul(c02, dinv);
    }
}

/* exported sanity hook: returns to_mont(3) so Python can assert the tower
 * constants baked above match params/extensions.py */
u64 f63_ext_nr_mont(void) { return mmul(3, R2); }

#define CH 2048   /* points per accumulation block (fits L1/L2 comfortably) */

/* ---- composition polynomial over the LDE domain ------------------------
 * comp[e][i] = zt_inv[i] * sum_c evals[c][i] * (ta[c][e] + tb[c][e]*xpow[adj_c][i])
 *            + sum_g invz[g][i] * sum_{a in group g}
 *                (lde[col_a][i] - bev[a][i]) * (ba[a][e] + bb[a][e]*bxp[g][i])
 *
 * evals [C][bn], lde [w][bn], xpow [n_adj][bn], zt_inv [bn];
 * ta/tb [C][d]; t_adj [C] row index into xpow.
 * Boundary assertions are sorted by divisor group: b_col [NA], b_ev [NA][bn],
 * ba/bb [NA][d], group start offsets b_start [G+1], per-group b_xpow / b_invz
 * [G][bn].  Output comp [d][bn]. */
void f63_compose(const u64 *evals, u64 C, u64 bn, u64 d,
                 const u64 *ta, const u64 *tb, const u32 *t_adj,
                 const u64 *xpow, const u64 *zt_inv,
                 const u64 *lde,
                 const u32 *b_col, const u64 *b_ev,
                 const u64 *ba, const u64 *bb,
                 const u32 *b_start, u64 G,
                 const u64 *b_xpow, const u64 *b_invz,
                 u64 *comp) {
#pragma omp parallel for schedule(static)
    for (u64 i0 = 0; i0 < bn; i0 += CH) {
        u64 len = bn - i0 < CH ? bn - i0 : CH;
        u64 acc[CH][3];
        u64 tmp[CH][3];
        memset(acc, 0, sizeof(u64) * len * 3);
        /* transition constraints */
        for (u64 c = 0; c < C; c++) {
            const u64 *ev = evals + c * bn + i0;
            const u64 *xp = xpow + (u64)t_adj[c] * bn + i0;
            const u64 *al = ta + c * d, *be = tb + c * d;
            for (u64 i = 0; i < len; i++) {
                u64 x = xp[i], v = ev[i];
                for (u64 e = 0; e < d; e++)
                    acc[i][e] = madd(acc[i][e],
                                     mmul(v, madd(al[e], mmul(be[e], x))));
            }
        }
        for (u64 i = 0; i < len; i++) {
            u64 zi = zt_inv[i0 + i];
            for (u64 e = 0; e < d; e++) acc[i][e] = mmul(acc[i][e], zi);
        }
        /* boundary groups */
        for (u64 g = 0; g < G; g++) {
            memset(tmp, 0, sizeof(u64) * len * 3);
            const u64 *xp = b_xpow + g * bn + i0;
            for (u32 a = b_start[g]; a < b_start[g + 1]; a++) {
                const u64 *row = lde + (u64)b_col[a] * bn + i0;
                const u64 *bev = b_ev + (u64)a * bn + i0;
                const u64 *al = ba + (u64)a * d, *be = bb + (u64)a * d;
                for (u64 i = 0; i < len; i++) {
                    u64 num = msub(row[i], bev[i]);
                    u64 x = xp[i];
                    for (u64 e = 0; e < d; e++)
                        tmp[i][e] = madd(tmp[i][e],
                                         mmul(num, madd(al[e], mmul(be[e], x))));
                }
            }
            const u64 *iz = b_invz + g * bn + i0;
            for (u64 i = 0; i < len; i++)
                for (u64 e = 0; e < d; e++)
                    acc[i][e] = madd(acc[i][e], mmul(tmp[i][e], iz[i]));
        }
        for (u64 e = 0; e < d; e++)
            for (u64 i = 0; i < len; i++)
                comp[e * bn + i0 + i] = acc[i][e];
    }
}

/* ---- DEEP composition over the LDE domain ------------------------------
 * deep[.][i] = (sum_r lift(lde[r][i] - ood_z[r]) * g_z[r])  / (x_i - z)
 *            + (sum_r lift(lde[r][i] - ood_zg[r]) * g_zg[r]) / (x_i - z*g)
 *            + (sum_m (h[m][i] - ood_h[m]) * g_h[m])         / (x_i - z^k)
 * where lift embeds base values in the extension.  The i-independent parts
 * sum_r ext_mul(ood, g) are hoisted; per point the numerator dots reduce to
 * base-scalar-times-ext accumulations over the trace rows plus k full ext
 * muls for the (ext-valued) composition columns.
 *
 * lde [w][bn] base; h [d][k][bn] (ext coordinate outer); xs [bn];
 * z/zg/zk [d]; ood_z/ood_zg [d][w]; ood_h [d][k] -- note coordinate-outer
 * layouts match the Python flat lists; g_z/g_zg [w][d], g_h [k][d]
 * (element-outer).  Output deep [d][bn]. */
void f63_deep(const u64 *lde, u64 w, u64 bn, u64 d,
              const u64 *h, u64 k, const u64 *xs,
              const u64 *z, const u64 *zg, const u64 *zk,
              const u64 *ood_z, const u64 *ood_zg, const u64 *ood_h,
              const u64 *g_z, const u64 *g_zg, const u64 *g_h,
              u64 *deep) {
    /* hoisted constants: sum_r ext_mul(ood[r], coeff[r]) */
    u64 const_z[3] = {0, 0, 0}, const_zg[3] = {0, 0, 0},
        const_h[3] = {0, 0, 0};
    u64 o[3], t[3];
    for (u64 r = 0; r < w; r++) {
        for (u64 e = 0; e < d; e++) o[e] = ood_z[e * w + r];
        ext_mul(o, g_z + r * d, t, d);
        for (u64 e = 0; e < d; e++) const_z[e] = madd(const_z[e], t[e]);
        for (u64 e = 0; e < d; e++) o[e] = ood_zg[e * w + r];
        ext_mul(o, g_zg + r * d, t, d);
        for (u64 e = 0; e < d; e++) const_zg[e] = madd(const_zg[e], t[e]);
    }
    for (u64 m = 0; m < k; m++) {
        for (u64 e = 0; e < d; e++) o[e] = ood_h[e * k + m];
        ext_mul(o, g_h + m * d, t, d);
        for (u64 e = 0; e < d; e++) const_h[e] = madd(const_h[e], t[e]);
    }

#pragma omp parallel for schedule(static)
    for (u64 i0 = 0; i0 < bn; i0 += CH) {
        u64 len = bn - i0 < CH ? bn - i0 : CH;
        u64 t1[CH][3], t2[CH][3], th[CH][3];
        u64 dz[CH][3], dzg[CH][3], dzk[CH][3];
        u64 pz[CH][3], q[CH][3], chain[CH][3];
        memset(t1, 0, sizeof(u64) * len * 3);
        memset(t2, 0, sizeof(u64) * len * 3);
        memset(th, 0, sizeof(u64) * len * 3);
        /* numerator dots over trace rows (base scalar x ext coeff) */
        for (u64 r = 0; r < w; r++) {
            const u64 *row = lde + r * bn + i0;
            const u64 *cz = g_z + r * d, *czg = g_zg + r * d;
            for (u64 i = 0; i < len; i++) {
                ext_axpy(row[i], cz, t1[i], d);
                ext_axpy(row[i], czg, t2[i], d);
            }
        }
        /* composition columns: full ext muls */
        for (u64 m = 0; m < k; m++) {
            const u64 *ch = g_h + m * d;
            for (u64 i = 0; i < len; i++) {
                u64 hv[3], pr[3];
                for (u64 e = 0; e < d; e++) hv[e] = h[(e * k + m) * bn + i0 + i];
                ext_mul(hv, ch, pr, d);
                for (u64 e = 0; e < d; e++) th[i][e] = madd(th[i][e], pr[e]);
            }
        }
        for (u64 i = 0; i < len; i++)
            for (u64 e = 0; e < d; e++) {
                t1[i][e] = msub(t1[i][e], const_z[e]);
                t2[i][e] = msub(t2[i][e], const_zg[e]);
                th[i][e] = msub(th[i][e], const_h[e]);
            }
        /* denominators + batched inverse over the block: one inversion for
         * all 3*len denominators (prefix chain over q = dz*dzg*dzk) */
        for (u64 i = 0; i < len; i++) {
            u64 x = xs[i0 + i];
            dz[i][0] = msub(x, z[0]);
            dzg[i][0] = msub(x, zg[0]);
            dzk[i][0] = msub(x, zk[0]);
            for (u64 e = 1; e < d; e++) {
                dz[i][e] = msub(0, z[e]);
                dzg[i][e] = msub(0, zg[e]);
                dzk[i][e] = msub(0, zk[e]);
            }
            ext_mul(dz[i], dzg[i], pz[i], d);
            ext_mul(pz[i], dzk[i], q[i], d);
        }
        u64 run[3] = {ONE_M, 0, 0};
        for (u64 i = 0; i < len; i++) {
            memcpy(chain[i], run, sizeof(u64) * 3);
            ext_mul(run, q[i], run, d);
        }
        u64 rinv[3];
        ext_inv(run, rinv, d);
        for (u64 i = len; i-- > 0;) {
            u64 qi[3];
            ext_mul(rinv, chain[i], qi, d);      /* 1/q[i] */
            ext_mul(rinv, q[i], rinv, d);
            /* inv_xz = qi * dzg * dzk ; inv_xzg = qi * dz * dzk ;
             * inv_xzk = qi * pz */
            u64 u1[3], u2[3], r1[3], r2[3], r3[3], s[3];
            ext_mul(dzg[i], dzk[i], u1, d);
            ext_mul(qi, u1, r1, d);
            ext_mul(dz[i], dzk[i], u2, d);
            ext_mul(qi, u2, r2, d);
            ext_mul(qi, pz[i], r3, d);
            ext_mul(t1[i], r1, s, d);
            u64 acc[3];
            memcpy(acc, s, sizeof(u64) * 3);
            ext_mul(t2[i], r2, s, d);
            for (u64 e = 0; e < d; e++) acc[e] = madd(acc[e], s[e]);
            ext_mul(th[i], r3, s, d);
            for (u64 e = 0; e < d; e++) acc[e] = madd(acc[e], s[e]);
            for (u64 e = 0; e < d; e++) deep[e * bn + i0 + i] = acc[e];
        }
    }
}

/* ---- FRI radix-2 fold (engine/fri.py fold2_ext) ------------------------
 * out[.][i] = (cur[.][i] + cur[.][i+n/2])/2
 *           + xi * invxs[i] * (cur[.][i] - cur[.][i+n/2])/2
 * cur [d][n] (coordinate-outer), xi [d] ext, invxs [n/2] base. */
void f63_fri_fold2(const u64 *cur, u64 d, u64 n, const u64 *xi,
                   const u64 *invxs, u64 *out) {
    u64 half = n / 2;
    u64 inv2 = mpow(madd(ONE_M, ONE_M), P - 2);
#pragma omp parallel for schedule(static)
    for (u64 i0 = 0; i0 < half; i0 += CH) {
        u64 len = half - i0 < CH ? half - i0 : CH;
        for (u64 i = 0; i < len; i++) {
            u64 s[3], dt[3], pr[3];
            u64 ix = invxs[i0 + i];
            for (u64 e = 0; e < d; e++) {
                u64 a = cur[e * n + i0 + i], b = cur[e * n + half + i0 + i];
                s[e] = mmul(madd(a, b), inv2);
                dt[e] = mmul(mmul(msub(a, b), inv2), ix);
            }
            ext_mul(dt, xi, pr, d);
            for (u64 e = 0; e < d; e++)
                out[e * half + i0 + i] = madd(s[e], pr[e]);
        }
    }
}

/* ---- coefficients -> coset evaluations (the h_lde leg) ----------------- */
/* forward declaration of the transform core in ntt.c */
void f63_ntt_batch(u64 *data, u64 w, u64 n, u64 root_std, u64 ninv_std);
void f63_coset_scale_batch(u64 *data, u64 w, u64 n, u64 offset_std);

void f63_coeffs_lde_batch(const u64 *coeffs, u64 w, u64 n, u64 blowup,
                          u64 root_bn_std, u64 offset_std, u64 *out) {
    u64 bn = blowup * n;
#pragma omp parallel for schedule(static)
    for (u64 r = 0; r < w; r++) {
        memcpy(out + r * bn, coeffs + r * n, n * sizeof(u64));
        memset(out + r * bn + n, 0, (bn - n) * sizeof(u64));
    }
    f63_coset_scale_batch(out, w, bn, offset_std);   /* opow beyond n hits 0s */
    f63_ntt_batch(out, w, bn, root_bn_std, 0);
}

/* ---- Montgomery batch inversion ----------------------------------------
 * Inverse-divisor tables for boundary groups (engine/boundary.py) need
 * 1/(x - c) over the whole LDE domain; one Fermat ladder per element on the
 * numpy limb path costs ~250 vector muls.  Classic prefix-product batch
 * inversion: 3 muls per element + one scalar inversion. */
void f63_batch_inv(const u64 *a, u64 n, u64 *out) {
    if (!n) return;
    u64 *pre = (u64 *)malloc(n * sizeof(u64));
    u64 acc = ONE_M;
    for (u64 i = 0; i < n; i++) { pre[i] = acc; acc = mmul(acc, a[i]); }
    u64 inv = minv(acc);
    for (u64 i = n; i-- > 0;) {
        out[i] = mmul(inv, pre[i]);
        inv = mmul(inv, a[i]);
    }
    free(pre);
}
