/* Point counting over F_{p^2} for curves E: y^2 = x^3 + x + b with b in
 * F_{p^2}, by parallel Pollard kangaroo on the Hasse interval.
 *
 * Purpose: find a curve instance (same form / tower as the reference,
 * src/utils/ecc.rs) whose F_{p^6} group order carries a ~252-bit prime
 * factor, closing the Schnorr scalar-field gap (VERDICT round 1 item 4):
 * for b in F_p the "new" part of #E(F_{p^6}) caps at ~p^2 (126 bits), but
 * for b in F_{p^2}\F_p the primitive part is N6/N2 ~ p^4 (252 bits).
 *
 * Method: for random Q on E(F_{p^2}), find t2 in [-2p, 2p] with
 * (p^2+1)Q = t2*Q — a discrete log in an interval of width W = 4p ~ 2^65,
 * van Oorschot–Wiener parallel kangaroo (tame+wild herds, distinguished
 * points, batched-inversion affine steps), ~2*sqrt(W) ~ 2^33.5 group ops.
 * The result is verified via (p^2+1-t2)Q = O on fresh random points.
 *
 * Usage: fp2_count b0 b1 [seed]   -> prints "t2 <signed value>" on success.
 * Test vector: b=(57,0) must give t2 = TRACE_FP^2 - 2p (params/curve_subfield).
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <pthread.h>

typedef unsigned __int128 u128;
typedef __int128 i128;
typedef uint64_t u64;

static const u64 P = 4719772409484279809ULL;

static inline u64 addm(u64 a, u64 b) { u64 s = a + b; return (s >= P || s < a) ? s - P : s; }
static inline u64 subm(u64 a, u64 b) { return a >= b ? a - b : a + (P - b); }
static inline u64 mulm(u64 a, u64 b) { return (u64)(((u128)a * b) % P); }

static u64 powm(u64 a, u128 e) {
    u64 r = 1;
    while (e) { if (e & 1) r = mulm(r, a); a = mulm(a, a); e >>= 1; }
    return r;
}
static u64 invm(u64 a) { return powm(a, (u128)P - 2); }

/* ---- fp2 = fp[u]/(u^2 - 2u - 2) (ops/ecc.py, ecc.rs:424-446) ---------- */
typedef struct { u64 c0, c1; } f2;

static inline f2 f2add(f2 a, f2 b) { return (f2){addm(a.c0, b.c0), addm(a.c1, b.c1)}; }
static inline f2 f2sub(f2 a, f2 b) { return (f2){subm(a.c0, b.c0), subm(a.c1, b.c1)}; }
static inline f2 f2neg(f2 a) { return (f2){subm(0, a.c0), subm(0, a.c1)}; }
static inline f2 f2mul(f2 a, f2 b) {
    u64 aa = mulm(a.c0, b.c0);
    u64 bb = mulm(a.c1, b.c1);
    u64 w = mulm(subm(a.c0, a.c1), subm(b.c1, b.c0));
    u64 c0 = addm(aa, addm(bb, bb));
    return (f2){c0, addm(addm(bb, c0), w)};
}
static inline f2 f2sqr(f2 a) { return f2mul(a, a); }
static inline int f2is0(f2 a) { return a.c0 == 0 && a.c1 == 0; }
static inline int f2eq(f2 a, f2 b) { return a.c0 == b.c0 && a.c1 == b.c1; }

static f2 f2inv(f2 a) {
    /* conj(a) = a^p: for u^2 = 2u+2, u^p = 2 - u (the other root).
     * a = c0 + c1*u -> conj = (c0 + 2c1) - c1*u.
     * norm = a * conj in F_p. */
    f2 conj = {addm(a.c0, addm(a.c1, a.c1)), subm(0, a.c1)};
    f2 n = f2mul(a, conj);
    u64 ninv = invm(n.c0);   /* n.c1 == 0 */
    return (f2){mulm(conj.c0, ninv), mulm(conj.c1, ninv)};
}

static f2 f2pow(f2 a, const u64 *e, int words) {
    f2 r = {1, 0};
    for (int w = words - 1; w >= 0; w--)
        for (int b = 63; b >= 0; b--) {
            r = f2sqr(r);
            if ((e[w] >> b) & 1) r = f2mul(r, a);
        }
    return r;
}

/* ---- rng ---------------------------------------------------------------- */
static u64 rng_s[4];
static u64 rotl(u64 x, int k) { return (x << k) | (x >> (64 - k)); }
static u64 rnd(void) {
    u64 r = rotl(rng_s[1] * 5, 7) * 9;
    u64 t = rng_s[1] << 17;
    rng_s[2] ^= rng_s[0]; rng_s[3] ^= rng_s[1];
    rng_s[1] ^= rng_s[2]; rng_s[0] ^= rng_s[3];
    rng_s[2] ^= t; rng_s[3] = rotl(rng_s[3], 45);
    return r;
}

/* ---- fp2 square root (Tonelli–Shanks; p^2-1 = Q2 * 2^56) --------------- */
static int f2_sqrt(f2 a, f2 *out) {
    /* q2 = (p^2-1) >> 56, as two 64-bit words (little-endian) */
    u128 pm1 = (u128)P * P - 1;
    int S = 0;
    while (!(pm1 & 1)) { pm1 >>= 1; S++; }
    u64 q2w[2] = {(u64)pm1, (u64)(pm1 >> 64)};
    /* exponent (q2+1)/2 */
    u128 qq = ((u128)q2w[1] << 64 | q2w[0]) + 1;
    qq >>= 1;
    u64 qh[2] = {(u64)qq, (u64)(qq >> 64)};

    /* find a non-residue z */
    f2 z;
    do {
        z.c0 = rnd() % P; z.c1 = rnd() % P;
        if (f2is0(z)) continue;
    } while (1 != 1 && 0); /* placeholder; residue test below */
    /* Euler test helper */
    for (;;) {
        if (!f2is0(z)) {
            /* z^((p^2-1)/2): compute via z^q2 then square S-1 times */
            f2 t = f2pow(z, q2w, 2);
            for (int i = 0; i < S - 1; i++) t = f2sqr(t);
            if (!(t.c0 == 1 && t.c1 == 0)) break;  /* non-residue found */
        }
        z.c0 = rnd() % P; z.c1 = rnd() % P;
    }

    /* Euler criterion for a */
    f2 chk = f2pow(a, q2w, 2);
    f2 e = chk;
    for (int i = 0; i < S - 1; i++) e = f2sqr(e);
    if (!(e.c0 == 1 && e.c1 == 0)) return 0;       /* not a square */

    int M = S;
    f2 c = f2pow(z, q2w, 2);
    f2 t = chk;
    f2 r = f2pow(a, qh, 2);
    while (!(t.c0 == 1 && t.c1 == 0)) {
        f2 tt = t; int i = 0;
        while (!(tt.c0 == 1 && tt.c1 == 0)) { tt = f2sqr(tt); i++; }
        f2 b = c;
        for (int j = 0; j < M - i - 1; j++) b = f2sqr(b);
        M = i; c = f2sqr(b);
        t = f2mul(t, c); r = f2mul(r, b);
    }
    *out = r;
    return 1;
}

/* ---- affine curve ops --------------------------------------------------- */
typedef struct { f2 x, y; int inf; } pt;

static f2 CURVE_B;

static int on_curve(pt q) {
    if (q.inf) return 1;
    f2 l = f2sqr(q.y);
    f2 r = f2add(f2add(f2mul(f2sqr(q.x), q.x), q.x), CURVE_B);
    return f2eq(l, r);
}

static pt pt_add(pt a, pt b) {
    if (a.inf) return b;
    if (b.inf) return a;
    f2 lam;
    if (f2eq(a.x, b.x)) {
        if (f2is0(f2add(a.y, b.y))) return (pt){{0,0},{0,0},1};
        f2 num = f2add(f2mul((f2){3,0}, f2sqr(a.x)), (f2){1,0});
        lam = f2mul(num, f2inv(f2add(a.y, a.y)));
    } else {
        lam = f2mul(f2sub(b.y, a.y), f2inv(f2sub(b.x, a.x)));
    }
    f2 x3 = f2sub(f2sub(f2sqr(lam), a.x), b.x);
    f2 y3 = f2sub(f2mul(lam, f2sub(a.x, x3)), a.y);
    return (pt){x3, y3, 0};
}

static pt pt_mul_u128(u128 k, pt q) {
    pt r = {{0,0},{0,0},1};
    while (k) {
        if (k & 1) r = pt_add(r, q);
        q = pt_add(q, q);
        k >>= 1;
    }
    return r;
}

static pt random_point(void) {
    for (;;) {
        f2 x = {rnd() % P, rnd() % P};
        f2 rhs = f2add(f2add(f2mul(f2sqr(x), x), x), CURVE_B);
        f2 y;
        if (f2_sqrt(rhs, &y)) {
            pt q = {x, y, 0};
            if (!on_curve(q)) { fprintf(stderr, "sqrt bug\n"); exit(2); }
            return q;
        }
    }
}

/* ---- parallel kangaroo --------------------------------------------------
 * u = log_Q(H) in [0, W], H = P0 + 2p*Q, P0 = (p^2+1)*Q, W = 4p.
 * Tame walkers start at (W/2 + j)*Q, wild at H + (j)*Q; jump k = f(x);
 * distinguished point: low DP_BITS bits of x.c0 zero. */
#define NJUMP 64
#define WALKS 64          /* per thread */
#define DP_BITS 18

static f2 JX[NJUMP], JY[NJUMP];     /* jump points j_k = d_k * Q */
static u64 JD[NJUMP];               /* jump distances d_k */
static pt BASE_Q, BASE_H;

typedef struct { u64 x0, x1, y0; u64 dist; int tame; } dp_entry;
#define DP_CAP (1 << 22)
static dp_entry *DP_TAB;
static pthread_mutex_t dp_lock = PTHREAD_MUTEX_INITIALIZER;
static volatile int found_flag = 0;
static volatile u64 found_u = 0;
static volatile int found_neg = 0;

static int dp_insert(f2 x, f2 y, u64 dist, int tame, u64 *other_dist,
                     int *other_tame) {
    u64 h = (x.c0 ^ (x.c1 * 0x9E3779B97F4A7C15ULL)) & (DP_CAP - 1);
    pthread_mutex_lock(&dp_lock);
    for (u64 i = h;; i = (i + 1) & (DP_CAP - 1)) {
        dp_entry *e = &DP_TAB[i];
        if (e->x0 == 0 && e->x1 == 0 && e->y0 == 0) {
            e->x0 = x.c0; e->x1 = x.c1; e->y0 = y.c0;
            e->dist = dist; e->tame = tame;
            pthread_mutex_unlock(&dp_lock);
            return 0;
        }
        if (e->x0 == x.c0 && e->x1 == x.c1 && e->y0 == y.c0) {
            if (e->tame != tame) {
                *other_dist = e->dist; *other_tame = e->tame;
                pthread_mutex_unlock(&dp_lock);
                return 1;
            }
            pthread_mutex_unlock(&dp_lock);
            return 0;
        }
    }
}

typedef struct { int tid; u64 seed; } targ;

static void *kangaroo_thread(void *vp) {
    targ *ta = (targ *)vp;
    u64 W_half_lo; /* W/2 = 2p */
    W_half_lo = 2 * P;
    /* local rng */
    u64 s[4] = {ta->seed ^ 0x123456789ABCDEFULL, ta->seed * 7 + 1,
                ta->seed ^ 0xFEDCBA987654321ULL, ta->seed * 13 + 5};
    #define LRND() ({ u64 _r = rotl(s[1] * 5, 7) * 9; u64 _t = s[1] << 17; \
        s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3]; \
        s[2] ^= _t; s[3] = rotl(s[3], 45); _r; })

    pt cur[WALKS];
    u64 dist[WALKS];
    int tame[WALKS];
    for (int i = 0; i < WALKS; i++) {
        tame[i] = (i & 1);
        u64 off = LRND() & 0xFFFFF;
        if (tame[i]) {
            cur[i] = pt_add(pt_mul_u128(W_half_lo + off, BASE_Q),
                            (pt){{0,0},{0,0},1});
            dist[i] = W_half_lo + off;
        } else {
            cur[i] = pt_add(BASE_H, pt_mul_u128(off, BASE_Q));
            dist[i] = off;
        }
    }

    f2 denom[WALKS], pref[WALKS], lam[WALKS];
    int jidx[WALKS];
    while (!found_flag) {
        for (int it = 0; it < 1024 && !found_flag; it++) {
            /* choose jumps, batch-invert denominators */
            for (int i = 0; i < WALKS; i++) {
                int k = (int)(cur[i].x.c0 & (NJUMP - 1));
                jidx[i] = k;
                denom[i] = f2sub((f2){JX[k].c0, JX[k].c1}, cur[i].x);
                if (f2is0(denom[i])) denom[i] = (f2){1, 0};  /* rare; walk resets below via bogus step */
            }
            pref[0] = denom[0];
            for (int i = 1; i < WALKS; i++) pref[i] = f2mul(pref[i-1], denom[i]);
            f2 inv_all = f2inv(pref[WALKS-1]);
            for (int i = WALKS - 1; i > 0; i--) {
                lam[i] = f2mul(inv_all, pref[i-1]);
                inv_all = f2mul(inv_all, denom[i]);
            }
            lam[0] = inv_all;
            for (int i = 0; i < WALKS; i++) {
                int k = jidx[i];
                f2 slope = f2mul(f2sub(JY[k], cur[i].y), lam[i]);
                f2 x3 = f2sub(f2sub(f2sqr(slope), cur[i].x), JX[k]);
                f2 y3 = f2sub(f2mul(slope, f2sub(cur[i].x, x3)), cur[i].y);
                cur[i].x = x3; cur[i].y = y3;
                dist[i] += JD[k];
                if ((cur[i].x.c0 & ((1 << DP_BITS) - 1)) == 0) {
                    u64 od; int ot;
                    if (dp_insert(cur[i].x, cur[i].y, dist[i], tame[i],
                                  &od, &ot)) {
                        u64 t_dist = tame[i] ? dist[i] : od;
                        u64 w_dist = tame[i] ? od : dist[i];
                        if (t_dist >= w_dist) {
                            found_u = t_dist - w_dist;
                            found_neg = 0;
                        } else {
                            found_u = w_dist - t_dist;
                            found_neg = 1;
                        }
                        found_flag = 1;
                    }
                }
            }
        }
    }
    return NULL;
}

int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: fp2_count b0 b1 [seed]\n"); return 1; }
    CURVE_B.c0 = strtoull(argv[1], 0, 10) % P;
    CURVE_B.c1 = strtoull(argv[2], 0, 10) % P;
    u64 seed = argc > 3 ? strtoull(argv[3], 0, 10) : 42;
    rng_s[0] = seed; rng_s[1] = seed * 6364136223846793005ULL + 1;
    rng_s[2] = seed ^ 0xDEADBEEF; rng_s[3] = seed * 2862933555777941757ULL + 3;
    for (int i = 0; i < 16; i++) rnd();

    DP_TAB = calloc(DP_CAP, sizeof(dp_entry));

    BASE_Q = random_point();
    /* P0 = (p^2+1)*Q ; H = P0 + 2p*Q  (u = t2 + 2p in [0, 4p]) */
    u128 m0 = (u128)P * P + 1;
    pt P0 = pt_mul_u128(m0, BASE_Q);
    BASE_H = pt_add(P0, pt_mul_u128((u128)2 * P, BASE_Q));

    /* jump table: mean ~ T*sqrt(W)/4, T = 4 threads * WALKS walkers */
    /* sqrt(W) = sqrt(4p) = 2^32.57 ; T = 256 -> m ~ 2^38.6 */
    u64 mean = 1ULL << 38;
    for (int k = 0; k < NJUMP; k++) {
        JD[k] = (rnd() % (2 * mean)) + 1;
        pt j = pt_mul_u128(JD[k], BASE_Q);
        while (j.inf) { JD[k]++; j = pt_mul_u128(JD[k], BASE_Q); }
        JX[k] = j.x; JY[k] = j.y;
    }

    int nthreads = argc > 4 ? atoi(argv[4]) : 4;
    pthread_t th[64];
    targ ta[64];
    for (int i = 0; i < nthreads; i++) {
        ta[i].tid = i; ta[i].seed = seed * 1000 + i * 77 + 7;
        pthread_create(&th[i], 0, kangaroo_thread, &ta[i]);
    }
    for (int i = 0; i < nthreads; i++) pthread_join(th[i], 0);

    if (!found_flag) { printf("NOTFOUND\n"); return 3; }
    /* u = tame - wild (non-negative case expected); t2 = u - 2p */
    if (found_neg) { printf("NEGATIVE-U\n"); return 4; }
    i128 t2 = (i128)found_u - (i128)(2 * P);
    /* verify: (p^2 + 1 - t2) * Q = O on the base point and a fresh point */
    u128 order_mult;
    if (t2 >= 0) order_mult = (u128)P * P + 1 - (u128)(u64)t2;
    else order_mult = (u128)P * P + 1 + (u128)(u64)(-t2);
    pt chk = pt_mul_u128(order_mult, BASE_Q);
    if (!chk.inf) { printf("VERIFY-FAIL\n"); return 5; }
    pt q2 = random_point();
    pt chk2 = pt_mul_u128(order_mult, q2);
    if (!chk2.inf) { printf("AMBIGUOUS\n"); return 6; }
    long long t2ll = (long long)t2;
    printf("t2 %lld\n", t2ll);
    return 0;
}
