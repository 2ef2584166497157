/* CPU-fallback constraint evaluators for the schnorr / merkle-update /
 * composed-transaction AIRs.
 *
 * The TPU compute path for constraint evaluation is the fused JAX kernel
 * (models/*.py evaluate_transition).  Off-TPU, XLA:CPU executes the EC-heavy
 * graphs one small op at a time (~100x away from scalar-code speed), so the
 * prover substitutes this native evaluator when running on the CPU backend
 * (engine/prover.py gates it; bit-identical outputs are asserted in tests).
 *
 * Everything operates on Montgomery-form u64 (R = 2^64), matching the device
 * limb arrays after pack_u64.  The formula sequences mirror the Python
 * evaluators, which mirror reference src/utils/ecc.rs, src/utils/rescue.rs,
 * src/merkle/update/air.rs, src/schnorr/air.rs, src/air.rs.
 */
#include <stdint.h>
#include <stddef.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

static const u64 P = 4719772409484279809ULL;
static const u64 NPRIME = 0x417fffffffffffffULL;   /* -p^-1 mod 2^64 */
static const u64 R2 = 3635333122111952146ULL;      /* 2^128 mod p */
static const u64 ONE_M = 4287426845256712189ULL;   /* 2^64 mod p (Mont 1) */

#include "rescue_tables.h"

static inline u64 madd(u64 a, u64 b) { u64 s = a + b; return s >= P ? s - P : s; }
static inline u64 msub(u64 a, u64 b) { return a >= b ? a - b : a + (P - b); }
static inline u64 mdbl(u64 a) { return madd(a, a); }

static inline u64 mmul(u64 a, u64 b) {
    u128 t = (u128)a * b;
    u64 m = (u64)t * NPRIME;
    u128 u = (t + (u128)m * P) >> 64;
    u64 r = (u64)u;
    return r >= P ? r - P : r;
}

/* Montgomery MDS tables, converted once from the standard-form header */
static u64 MDS_M[196], INV_MDS_M[196], ARK_M[8][28];
static int air_tables_ready = 0;
void air_eval_init(void) {
    if (air_tables_ready) return;
    for (int i = 0; i < 196; i++) {
        MDS_M[i] = mmul(RESCUE_MDS[i] % P, R2);
        INV_MDS_M[i] = mmul(RESCUE_INV_MDS[i] % P, R2);
    }
    for (int r = 0; r < 8; r++)
        for (int i = 0; i < 28; i++)
            ARK_M[r][i] = mmul(RESCUE_ARK[r][i] % P, R2);
    air_tables_ready = 1;
}

/* ---- rescue round constraint (models/constraints.py rescue_enforce_round,
 * reference rescue.rs:269-300) ------------------------------------------- */
static void rescue_enforce(const u64 *cur, const u64 *nxt,
                           const u64 *ark0, const u64 *ark1, u64 *out) {
    u64 s1[14], s2[14], t[14];
    for (int i = 0; i < 14; i++) s1[i] = mmul(cur[i], mmul(cur[i], cur[i]));
    for (int i = 0; i < 14; i++) {
        u64 acc = 0;
        for (int j = 0; j < 14; j++) acc = madd(acc, mmul(MDS_M[i * 14 + j], s1[j]));
        t[i] = madd(acc, ark0[i]);
    }
    for (int i = 0; i < 14; i++) s2[i] = msub(nxt[i], ark1[i]);
    for (int i = 0; i < 14; i++) {
        u64 acc = 0;
        for (int j = 0; j < 14; j++) acc = madd(acc, mmul(INV_MDS_M[i * 14 + j], s2[j]));
        u64 x = acc;
        out[i] = msub(mmul(x, mmul(x, x)), t[i]);
    }
}

/* ---- fp2 / fp6 tower (ops/ecc.py, reference ecc.rs:424-548) ------------ */
static inline void f2mul(const u64 *a, const u64 *b, u64 *c) {
    u64 u = mmul(a[0], b[0]);
    u64 v = mmul(a[1], b[1]);
    u64 w = mmul(msub(a[0], a[1]), msub(b[1], b[0]));
    u64 c0 = madd(u, mdbl(v));
    c[0] = c0;
    c[1] = madd(madd(v, c0), w);
}

static void f6mul(const u64 *a, const u64 *b, u64 *c) {
    u64 aa[2], bb[2], cc[2], ab[2], ac[2], bc[2], x[2], y[2];
    f2mul(a, b, aa);
    f2mul(a + 2, b + 2, bb);
    f2mul(a + 4, b + 4, cc);
    x[0] = madd(a[0], a[2]); x[1] = madd(a[1], a[3]);
    y[0] = madd(b[0], b[2]); y[1] = madd(b[1], b[3]);
    f2mul(x, y, ab);
    x[0] = madd(a[0], a[4]); x[1] = madd(a[1], a[5]);
    y[0] = madd(b[0], b[4]); y[1] = madd(b[1], b[5]);
    f2mul(x, y, ac);
    x[0] = madd(a[2], a[4]); x[1] = madd(a[3], a[5]);
    y[0] = madd(b[2], b[4]); y[1] = madd(b[3], b[5]);
    f2mul(x, y, bc);
    for (int j = 0; j < 2; j++) {
        u64 tmp = madd(madd(aa[j], bb[j]), cc[j]);
        c[j] = msub(tmp, bc[j]);
        c[2 + j] = msub(msub(ab[j], bc[j]), aa[j]);
        c[4 + j] = madd(msub(msub(ac[j], tmp), cc[j]), mdbl(bb[j]));
    }
}

static inline void f6add(const u64 *a, const u64 *b, u64 *c) {
    for (int i = 0; i < 6; i++) c[i] = madd(a[i], b[i]);
}
static inline void f6sub(const u64 *a, const u64 *b, u64 *c) {
    for (int i = 0; i < 6; i++) c[i] = msub(a[i], b[i]);
}
static inline void f6dbl_ip(u64 *a) { for (int i = 0; i < 6; i++) a[i] = mdbl(a[i]); }
static inline void f6scal(const u64 *a, u64 s, u64 *c) {
    for (int i = 0; i < 6; i++) c[i] = mmul(a[i], s);
}

/* b3 * a in fp6, dispatching on the sparsity of the curve constant
 * (utils/curve.py B3_LIMBS, 6 Montgomery limbs): base-subfield scalar
 * (limbs 1..5 zero, e.g. the b=57 test instance), fp2 scalar (limbs 2..5
 * zero, e.g. the reference-strength b=5+29u instance; 3 f2muls), or a
 * full fp6 element. Safe when c aliases a. */
static void f6mulb3(const u64 *a, const u64 *b3, u64 *c) {
    if (!(b3[2] | b3[3] | b3[4] | b3[5])) {
        if (!b3[1]) { f6scal(a, b3[0], c); return; }
        for (int i = 0; i < 3; i++) f2mul(a + 2 * i, b3, c + 2 * i);
        return;
    }
    f6mul(a, b3, c);
}

/* ---- EC ops on projective points [X||Y||Z] (ops/ecc.py compute_*,
 * reference ecc.rs:73-172; b3 is a base-subfield scalar) ------------------ */
static void ec_double(const u64 *pt, const u64 *b3, u64 *o) {
    const u64 *x = pt, *y = pt + 6, *z = pt + 12;
    u64 t0[6], t1[6], t2[6], t3[6], x3[6], y3[6], z3[6], tm[6];
    f6mul(x, x, t0);
    f6mul(y, y, t1);
    f6mul(z, z, t2);
    f6mul(x, y, t3); f6dbl_ip(t3);
    f6mul(x, z, z3); f6dbl_ip(z3);
    f6mulb3(t2, b3, y3);
    f6add(z3, y3, y3);
    f6sub(t1, y3, x3);
    f6add(t1, y3, y3);
    f6mul(x3, y3, y3);
    f6mul(t3, x3, x3);
    f6mulb3(z3, b3, z3);
    f6sub(t0, t2, t3);
    f6add(t3, z3, t3);
    for (int i = 0; i < 6; i++) tm[i] = mdbl(t0[i]);   /* z3 = 2 t0 */
    f6add(tm, t0, t0);
    f6add(t0, t2, t0);
    f6mul(t0, t3, t0);
    f6add(y3, t0, y3);
    f6mul(y, z, t2); f6dbl_ip(t2);
    f6mul(t2, t3, t0);
    f6sub(x3, t0, x3);
    f6mul(t2, t1, z3); f6dbl_ip(z3); f6dbl_ip(z3);
    for (int i = 0; i < 6; i++) { o[i] = x3[i]; o[6 + i] = y3[i]; o[12 + i] = z3[i]; }
}

static void ec_add_mixed(const u64 *pt1, const u64 *pt2, const u64 *b3, u64 *o) {
    const u64 *x1 = pt1, *y1 = pt1 + 6, *z1 = pt1 + 12;
    const u64 *x2 = pt2, *y2 = pt2 + 6;
    u64 t0[6], t1[6], t2[6], t3[6], t4[6], t5[6], x3[6], y3[6], z3[6], a[6], b[6];
    f6mul(x1, x2, t0);
    f6mul(y1, y2, t1);
    f6add(x2, y2, a); f6add(x1, y1, b);
    f6mul(a, b, t3);
    f6add(t0, t1, a);
    f6sub(t3, a, t3);
    f6mul(x2, z1, t4); f6add(t4, x1, t4);
    f6mul(y2, z1, t5); f6add(t5, y1, t5);
    f6mulb3(z1, b3, x3);
    f6add(x3, t4, z3);
    f6sub(t1, z3, x3);
    f6add(t1, z3, z3);
    f6mul(x3, z3, y3);
    for (int i = 0; i < 6; i++) t1[i] = madd(mdbl(t0[i]), t0[i]);
    f6mulb3(t4, b3, t4);
    f6add(t1, z1, t1);
    f6sub(t0, z1, t2);
    f6add(t4, t2, t4);
    f6mul(t1, t4, t0);
    f6add(y3, t0, y3);
    f6mul(t5, t4, t0);
    f6mul(t3, x3, a);
    f6sub(a, t0, x3);
    f6mul(t3, t1, t0);
    f6mul(t5, z3, a);
    f6add(a, t0, z3);
    for (int i = 0; i < 6; i++) { o[i] = x3[i]; o[6 + i] = y3[i]; o[12 + i] = z3[i]; }
}

static void ec_add(const u64 *pt1, const u64 *pt2, const u64 *b3, u64 *o) {
    const u64 *x1 = pt1, *y1 = pt1 + 6, *z1 = pt1 + 12;
    const u64 *x2 = pt2, *y2 = pt2 + 6, *z2 = pt2 + 12;
    u64 t0[6], t1[6], t2[6], t3[6], t4[6], t5[6], x3[6], y3[6], z3[6], a[6], b[6];
    f6mul(x1, x2, t0);
    f6mul(y1, y2, t1);
    f6mul(z1, z2, t2);
    f6add(x1, y1, a); f6add(x2, y2, b);
    f6mul(a, b, t3);
    f6add(t0, t1, a); f6sub(t3, a, t3);
    f6add(x1, z1, a); f6add(x2, z2, b);
    f6mul(a, b, t4);
    f6add(t0, t2, a); f6sub(t4, a, t4);
    f6add(y1, z1, a); f6add(y2, z2, b);
    f6mul(a, b, t5);
    f6add(t1, t2, a); f6sub(t5, a, t5);
    f6mulb3(t2, b3, x3);
    f6add(x3, t4, z3);
    f6sub(t1, z3, x3);
    f6add(t1, z3, z3);
    f6mul(x3, z3, y3);
    for (int i = 0; i < 6; i++) t1[i] = madd(mdbl(t0[i]), t0[i]);
    f6mulb3(t4, b3, t4);
    f6add(t1, t2, t1);
    f6sub(t0, t2, t2);
    f6add(t4, t2, t4);
    f6mul(t1, t4, t0);
    f6add(y3, t0, y3);
    f6mul(t5, t4, t0);
    f6mul(t3, x3, a);
    f6sub(a, t0, x3);
    f6mul(t3, t1, t0);
    f6mul(t5, z3, a);
    f6add(a, t0, z3);
    for (int i = 0; i < 6; i++) { o[i] = x3[i]; o[6 + i] = y3[i]; o[12 + i] = z3[i]; }
}

/* ---- shared schnorr constraint block (models/schnorr.py evaluate_schnorr,
 * reference schnorr/air.rs:394-531) -------------------------------------- */
static void schnorr_block(const u64 *cur, const u64 *nxt,
                          const u64 *ark0, const u64 *ark1,
                          u64 doubling, u64 addition,
                          const u64 *digest_flags,  /* 4 */
                          const u64 *pkey,          /* 12 (affine) */
                          u64 final_flag, u64 hash_flag, u64 copy_hash,
                          const u64 *internal,      /* 7 */
                          const u64 *gen12,         /* 12 (affine G) */
                          const u64 *b3, u64 *res) {
    u64 tmp18[18], added[18];
    /* points 1 (s*G) and 2 (h*P): doubling + conditional mixed add */
    for (int c = 0; c < 2; c++) {
        int off = c == 0 ? 0 : 19;
        const u64 *pt2 = c == 0 ? gen12 : pkey;
        u64 bit = cur[off + 18];
        u64 nbit = msub(ONE_M, bit);
        ec_double(cur + off, b3, tmp18);
        ec_add_mixed(cur + off, pt2, b3, added);
        for (int i = 0; i < 18; i++) {
            u64 dbl_eq = mmul(msub(nxt[off + i], tmp18[i]), doubling);
            u64 expect = madd(mmul(added[i], bit), mmul(cur[off + i], nbit));
            u64 add_eq = mmul(msub(nxt[off + i], expect), addition);
            res[off + i] = madd(res[off + i], madd(dbl_eq, add_eq));
        }
        u64 binc = mmul(msub(mmul(bit, bit), bit), doubling);
        u64 bitcopy = mmul(msub(cur[off + 18], nxt[off + 18]), addition);
        res[off + 18] = madd(res[off + 18], madd(binc, bitcopy));
    }
    /* final S + h.P with affine-x reduction (slots 0..18) */
    ec_add(cur, cur + 19, b3, added);
    u64 xz[6];
    f6mul(nxt, added + 12, xz);
    for (int i = 0; i < 6; i++)
        res[i] = madd(res[i], mmul(msub(xz[i], added[i]), final_flag));
    for (int i = 6; i < 18; i++)
        res[i] = madd(res[i], mmul(msub(nxt[i], added[i]), final_flag));
    /* h-limb accumulators (slots 38..42) */
    u64 hbit = nxt[37];
    for (int i = 0; i < 4; i++) {
        int vp = 41 - i;
        u64 acc = msub(nxt[vp], madd(mdbl(cur[vp]), hbit));
        res[vp] = madd(res[vp], mmul(acc, mmul(digest_flags[i], doubling)));
        u64 cp = msub(cur[vp], nxt[vp]);
        res[vp] = madd(res[vp],
                       mmul(cp, mmul(msub(ONE_M, digest_flags[i]), doubling)));
    }
    for (int i = 0; i < 4; i++) {
        u64 cp = msub(cur[38 + i], nxt[38 + i]);
        res[38 + i] = madd(res[38 + i], mmul(cp, addition));
        u64 eq = msub(cur[38 + i], cur[42 + i]);
        res[38 + i] = madd(res[38 + i], mmul(eq, final_flag));
    }
    /* hash rows (slots 42..56) */
    u64 rc[14];
    rescue_enforce(cur + 42, nxt + 42, ark0, ark1, rc);
    for (int i = 0; i < 14; i++)
        res[42 + i] = madd(res[42 + i], mmul(rc[i], hash_flag));
    for (int i = 0; i < 7; i++) {
        res[42 + i] = madd(res[42 + i],
                           mmul(msub(cur[42 + i], nxt[42 + i]), copy_hash));
        res[49 + i] = madd(res[49 + i],
                           mmul(msub(nxt[49 + i], internal[i]), copy_hash));
    }
}

/* ---- merkle-update blocks (models/merkle_update.py, update/air.rs) ------ */
static void merkle_setup_values(const u64 *cur, u64 setup, u64 *res) {
    /* S_INIT=0 S_UPD=15 R_INIT=29 R_UPD=44; slots 65..92 */
    for (int i = 0; i < 12; i++) {
        res[65 + i] = madd(res[65 + i], mmul(msub(cur[0 + i], cur[15 + i]), setup));
        res[77 + i] = madd(res[77 + i], mmul(msub(cur[29 + i], cur[44 + i]), setup));
    }
    res[89] = madd(res[89], mmul(msub(cur[29 + 13], cur[44 + 13]), setup));
    u64 bal = msub(msub(cur[12], cur[15 + 12]), msub(cur[44 + 12], cur[29 + 12]));
    res[90] = madd(res[90], mmul(bal, setup));
    u64 nonce = msub(cur[15 + 13], madd(cur[13], ONE_M));
    res[91] = madd(res[91], mmul(nonce, setup));
}

static void merkle_auth(const u64 *cur, const u64 *nxt,
                        const u64 *ark0, const u64 *ark1,
                        u64 tx_hash, u64 hash_input, u64 finish, u64 hash_flag,
                        u64 *res) {
    u64 not_finish = msub(ONE_M, finish);
    u64 not_input = msub(ONE_M, madd(hash_flag, hash_input));
    u64 copy_flag = mmul(tx_hash, not_input);
    u64 init_flag = mmul(tx_hash, hash_input);
    u64 rc[14];
    static const int res_base[2] = {0, 29}, tr_base[2] = {0, 29},
                     bit_pos[2] = {14, 43};
    for (int c = 0; c < 2; c++) {
        u64 bit = nxt[bit_pos[c]];
        u64 nbit = msub(ONE_M, bit);
        res[res_base[c] + 14] = madd(res[res_base[c] + 14],
                                     mmul(msub(mmul(bit, bit), bit), tx_hash));
        for (int half = 0; half < 2; half++) {
            int roff = half * 15, reg = tr_base[c] + half * 15;
            rescue_enforce(cur + reg, nxt + reg, ark0, ark1, rc);
            for (int i = 0; i < 14; i++)
                res[res_base[c] + roff + i] =
                    madd(res[res_base[c] + roff + i], mmul(rc[i], hash_flag));
            for (int i = 0; i < 7; i++) {
                u64 cp = mmul(msub(cur[reg + i], nxt[reg + i]), copy_flag);
                u64 ini = mmul(mmul(msub(cur[reg + i], nxt[reg + i]), nbit),
                               init_flag);
                u64 mv = mmul(mmul(msub(cur[reg + i], nxt[reg + 7 + i]), bit),
                              init_flag);
                res[res_base[c] + roff + i] =
                    madd(res[res_base[c] + roff + i], madd(cp, ini));
                res[res_base[c] + roff + 7 + i] =
                    madd(res[res_base[c] + roff + 7 + i], mv);
            }
        }
        for (int i = 0; i < 7; i++) {
            u64 sib_lo = mmul(mmul(msub(nxt[tr_base[c] + 15 + i],
                                        nxt[tr_base[c] + i]), bit), init_flag);
            u64 sib_hi = mmul(mmul(msub(nxt[tr_base[c] + 22 + i],
                                        nxt[tr_base[c] + 7 + i]), nbit),
                              init_flag);
            res[res_base[c] + i] = madd(res[res_base[c] + i], sib_lo);
            res[res_base[c] + 7 + i] = madd(res[res_base[c] + 7 + i], sib_hi);
        }
    }
    for (int i = 0; i < 7; i++) {
        u64 keep = mmul(msub(nxt[58 + i], cur[58 + i]), not_finish);
        u64 load = mmul(msub(nxt[58 + i], nxt[44 + i]), finish);
        res[58 + i] = madd(res[58 + i], madd(keep, load));
    }
    /* intermediate-root equality (92..99) / prev-root match (99..106) */
    for (int i = 0; i < 7; i++) {
        u64 int_eq = mmul(msub(cur[15 + i], cur[29 + i]), finish);
        u64 pm = mmul(msub(nxt[i], cur[58 + i]), finish);
        res[92 + i] = madd(res[92 + i], int_eq);
        res[99 + i] = madd(res[99 + i], pm);
    }
}

/* =========================== exported evaluators =========================
 * Layouts: column-major-per-row arrays [ncols][B] (row i of column c at
 * c*B + i); all values Montgomery u64.  out zero-initialised here.        */

#define COL(arr, c) ((arr) + (size_t)(c) * B)

void eval_schnorr_air(const u64 *cur, const u64 *nxt, const u64 *per,
                      u64 *out, u64 B, const u64 *gen12m, const u64 *b3m) {
    air_eval_init();
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < B; i++) {
        u64 c[56], n[56], p[55], res[56] = {0};
        for (int k = 0; k < 56; k++) { c[k] = COL(cur, k)[i]; n[k] = COL(nxt, k)[i]; }
        for (int k = 0; k < 55; k++) p[k] = COL(per, k)[i];
        u64 global_mask = p[0], scalar_flag = p[1], doubling = p[2];
        const u64 *digest_flags = p + 3;
        const u64 *pkey = p + 7;
        u64 hash_flag = p[19];
        const u64 *internal = p + 20;
        const u64 *ark0 = p + 27, *ark1 = p + 41;
        u64 copy_hash = mmul(msub(ONE_M, hash_flag), global_mask);
        u64 final_flag = mmul(msub(ONE_M, scalar_flag), global_mask);
        u64 addition = mmul(msub(ONE_M, doubling), scalar_flag);
        schnorr_block(c, n, ark0, ark1, doubling, addition, digest_flags,
                      pkey, final_flag, hash_flag, copy_hash, internal,
                      gen12m, b3m, res);
        for (int k = 0; k < 56; k++) COL(out, k)[i] = res[k];
    }
}

/* ---- batched BLAKE3 commitment path (engine/hasher.py Blake3Hasher):
 * leaf = blake3(k elements, 8-byte LE standard form); merge = blake3(d0||d1).
 * blake3_hash lives in f63.c (same shared object). ------------------------ */
extern void blake3_hash(const unsigned char *data, size_t len,
                        unsigned char *out32);

void blake3_leaves(const u64 *cols_mont, u64 ncols, u64 B,
                   unsigned char *out /* 32*B */) {
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < B; i++) {
        unsigned char buf[8 * 256];
        for (size_t c = 0; c < ncols && c < 256; c++) {
            u64 v = mmul(cols_mont[c * B + i], 1);   /* Montgomery -> std */
            for (int j = 0; j < 8; j++) buf[c * 8 + j] = (v >> (8 * j)) & 0xff;
        }
        blake3_hash(buf, (size_t)ncols * 8, out + 32 * i);
    }
}

void blake3_merge_level(const unsigned char *digests /* 32B x m */, u64 m,
                        unsigned char *out /* 32B x m/2 */) {
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < m / 2; i++)
        blake3_hash(digests + 64 * i, 64, out + 32 * i);
}

/* rescue hash-chain AIR (models/rescue_chain.py evaluate_transition):
 * per = [hash flag, ark0(14), ark1(14)]; 14 slots. */
void eval_rescue_chain_air(const u64 *cur, const u64 *nxt, const u64 *per,
                           u64 *out, u64 B) {
    air_eval_init();
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < B; i++) {
        u64 c[14], n[14], p[29], rc[14];
        for (int k = 0; k < 14; k++) { c[k] = COL(cur, k)[i]; n[k] = COL(nxt, k)[i]; }
        for (int k = 0; k < 29; k++) p[k] = COL(per, k)[i];
        u64 flag = p[0], nflag = msub(ONE_M, p[0]);
        rescue_enforce(c, n, p + 1, p + 15, rc);
        for (int k = 0; k < 7; k++) {
            u64 copy = mmul(msub(n[k], c[k]), nflag);
            COL(out, k)[i] = madd(mmul(rc[k], flag), copy);
            COL(out, 7 + k)[i] = madd(mmul(rc[7 + k], flag),
                                      mmul(n[7 + k], nflag));
        }
    }
}

void eval_merkle_air(const u64 *cur, const u64 *nxt, const u64 *per,
                     u64 *out, u64 B) {
    air_eval_init();
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < B; i++) {
        u64 c[65], n[65], p[33], res[106] = {0};
        for (int k = 0; k < 65; k++) { c[k] = COL(cur, k)[i]; n[k] = COL(nxt, k)[i]; }
        for (int k = 0; k < 33; k++) p[k] = COL(per, k)[i];
        merkle_setup_values(c, p[0], res);
        merkle_auth(c, n, p + 5, p + 19, p[1], p[2], p[3], p[4], res);
        for (int k = 0; k < 106; k++) COL(out, k)[i] = res[k];
    }
}

void eval_transaction_air(const u64 *cur, const u64 *nxt, const u64 *per,
                          u64 *out, u64 B, const u64 *gen12m, const u64 *b3m) {
    air_eval_init();
#pragma omp parallel for schedule(static)
    for (size_t i = 0; i < B; i++) {
        u64 c[94], n[94], p[48], res[115] = {0};
        for (int k = 0; k < 94; k++) { c[k] = COL(cur, k)[i]; n[k] = COL(nxt, k)[i]; }
        for (int k = 0; k < 48; k++) p[k] = COL(per, k)[i];
        u64 setup = p[0], merkle_mask = p[1], hash_input = p[2], finish = p[3],
            hash_mask = p[4], schnorr_mask = p[5], scalar_mult = p[6],
            doubling = p[7];
        const u64 *digest_flags = p + 8;
        u64 schnorr_hash = p[12];
        const u64 *internal_flags = p + 13;
        u64 range_step = p[17], range_finish = p[18], value_copy = p[19];
        const u64 *ark0 = p + 20, *ark1 = p + 34;

        u64 copy_hash = mmul(msub(ONE_M, schnorr_hash), schnorr_mask);
        u64 final_flag = mmul(msub(ONE_M, scalar_mult), schnorr_mask);
        u64 addition = mmul(msub(ONE_M, doubling), scalar_mult);
        u64 rc[14];

        /* 1. merkle-init rounds at setup (slots 0..56) */
        static const int init_map[4][2] = {{0, 0}, {14, 15}, {28, 29}, {42, 44}};
        for (int m = 0; m < 4; m++) {
            rescue_enforce(c + init_map[m][1], n + init_map[m][1], ark0, ark1, rc);
            for (int k = 0; k < 14; k++)
                res[init_map[m][0] + k] =
                    madd(res[init_map[m][0] + k], mmul(rc[k], setup));
        }
        /* 2. setup value constraints (slots 65..92) */
        merkle_setup_values(c, setup, res);
        /* 3. key/delta/sigma/nonce copies (slots 101..108) */
        static const int key_map[2][3] = {{101, 0, 65}, {103, 29, 77}};
        for (int m = 0; m < 2; m++) {
            int res_idx = key_map[m][0], origin = key_map[m][1],
                cp_pos = key_map[m][2];
            for (int k = 0; k < 12; k++) {
                u64 st = mmul(msub(n[cp_pos + k], c[origin + k]), setup);
                u64 cp = mmul(msub(n[cp_pos + k], c[cp_pos + k]), value_copy);
                res[res_idx + k] = madd(res[res_idx + k], madd(st, cp));
            }
        }
        u64 delta_src = msub(c[12], c[15 + 12]);
        res[105] = madd(res[105], mmul(msub(n[89], delta_src), setup));
        res[106] = madd(res[106], mmul(msub(n[90], c[15 + 12]), setup));
        res[107] = madd(res[107], mmul(msub(n[91], c[13]), setup));
        static const int cp_map[3][2] = {{105, 89}, {106, 90}, {107, 91}};
        for (int m = 0; m < 3; m++)
            res[cp_map[m][0]] = madd(res[cp_map[m][0]],
                mmul(msub(n[cp_map[m][1]], c[cp_map[m][1]]), value_copy));
        /* 4. merkle auth (slots 0..65) */
        merkle_auth(c, n, ark0, ark1, merkle_mask, hash_input, finish,
                    hash_mask, res);
        /* 5. schnorr with copy-register pkey + hash internal inputs */
        const u64 *pkey = n + 65;
        u64 internal[7];
        u64 srcs[4][7];
        for (int j = 0; j < 7; j++) srcs[0][j] = n[65 + j];
        for (int j = 0; j < 5; j++) srcs[1][j] = n[72 + j];
        srcs[1][5] = n[77]; srcs[1][6] = n[78];
        for (int j = 0; j < 7; j++) srcs[2][j] = n[79 + j];
        srcs[3][0] = n[86]; srcs[3][1] = n[87]; srcs[3][2] = n[88];
        srcs[3][3] = n[89]; srcs[3][4] = n[91]; srcs[3][5] = 0; srcs[3][6] = 0;
        for (int j = 0; j < 7; j++) {
            u64 acc = 0;
            for (int k = 0; k < 4; k++)
                acc = madd(acc, mmul(srcs[k][j], internal_flags[k]));
            internal[j] = acc;
        }
        schnorr_block(c, n, ark0, ark1, doubling, addition, digest_flags,
                      pkey, final_flag, schnorr_hash, copy_hash, internal,
                      gen12m, b3m, res);
        /* 6. range proofs on delta and sigma */
        static const int rng_map[2][2] = {{57, 56}, {93, 92}};
        for (int m = 0; m < 2; m++) {
            int acc_p = rng_map[m][0], bit_p = rng_map[m][1];
            u64 bit = n[bit_p];
            u64 acc = msub(n[acc_p], madd(mdbl(c[acc_p]), bit));
            res[acc_p] = madd(res[acc_p], mmul(acc, range_step));
            res[bit_p] = madd(res[bit_p],
                              mmul(msub(mmul(bit, bit), bit), range_step));
        }
        /* endpoint equalities — the reference's sigma bug replicated:
           both compare the DELTA registers (air.rs:605-609) */
        u64 delta_eq = msub(n[57], n[89]);
        res[108] = madd(res[108], mmul(delta_eq, range_finish));
        res[109] = madd(res[109], mmul(delta_eq, range_finish));

        for (int k = 0; k < 115; k++) COL(out, k)[i] = res[k];
    }
}

/* ---- Montgomery rescue hash-chain trace (the reference bench workload,
 * benches/rescue.rs) -- like f63.c rescue_chain_trace but (a) all-Montgomery
 * arithmetic (~2x on the x^INV_ALPHA exponentiations) and (b) COLUMN-major
 * output [14][8*length] in Montgomery form, ready for the limb view
 * (ops/field.py unpack_u64) with no further transpose or device multiply. */
static const u64 CHAIN_INV_ALPHA = 3146514939656186539ULL;

static u64 mpow_m(u64 a, u64 e) {
    u64 r = ONE_M;
    while (e) {
        if (e & 1) r = mmul(r, a);
        a = mmul(a, a);
        e >>= 1;
    }
    return r;
}

void rescue_chain_trace_mont(const u64 *seed7, u64 length, u64 *out) {
    air_eval_init();
    u64 st[14], tmp[14];
    u64 rows = length * 8;
    for (int j = 0; j < 7; j++) st[j] = mmul(seed7[j] % P, R2);
    for (u64 k = 0; k < length; k++) {
        for (int j = 7; j < 14; j++) st[j] = 0;
        u64 base = k * 8;
        for (int j = 0; j < 14; j++) out[j * rows + base] = st[j];
        for (int r = 0; r < 7; r++) {
            const u64 *ark = ARK_M[r];
            for (int i = 0; i < 14; i++) st[i] = mmul(st[i], mmul(st[i], st[i]));
            for (int i = 0; i < 14; i++) {
                u64 acc = 0;
                for (int j = 0; j < 14; j++)
                    acc = madd(acc, mmul(MDS_M[i * 14 + j], st[j]));
                tmp[i] = madd(acc, ark[i]);
            }
            for (int i = 0; i < 14; i++) st[i] = mpow_m(tmp[i], CHAIN_INV_ALPHA);
            for (int i = 0; i < 14; i++) {
                u64 acc = 0;
                for (int j = 0; j < 14; j++)
                    acc = madd(acc, mmul(MDS_M[i * 14 + j], st[j]));
                tmp[i] = madd(acc, ark[14 + i]);
            }
            for (int i = 0; i < 14; i++) st[i] = tmp[i];
            for (int j = 0; j < 14; j++) out[j * rows + base + r + 1] = st[j];
        }
    }
}

/* =========================================================================
 * Native composed-transaction trace generation (models/trace_np.py spec;
 * reference src/trace.rs:28-142 + src/prover.rs:37-98).
 *
 * Trace generation is an inherently sequential per-transaction recurrence
 * (1023 steps of EC double/add + Rescue rounds); the reference fills it with
 * scalar Rust under rayon.  The TPU framework's equivalent is this scalar C
 * builder (OpenMP over transactions), feeding Montgomery column-major output
 * straight into the device pipeline — measured ~1000x over the XLA:CPU scan
 * and ~50x over the vectorized numpy host path.
 * ========================================================================= */

static const u64 F6_INV_EXP[6] = {            /* p^6 - 2, little-endian */
    0x88ffffffffffffffULL, 0xfb61c00000000001ULL, 0x55c2038000000000ULL,
    0x1074daebf0000000ULL, 0x1af28ce25900000ULL, 0x1262d2ca6f6400ULL};

static void f6inv(const u64 *a, u64 *out) {
    u64 r[6] = {ONE_M, 0, 0, 0, 0, 0}, base[6], t[6];
    for (int i = 0; i < 6; i++) base[i] = a[i];
    for (int w = 0; w < 6; w++) {
        u64 e = F6_INV_EXP[w];
        for (int b = 0; b < 64; b++) {
            if (e & 1) { f6mul(r, base, t); for (int i = 0; i < 6; i++) r[i] = t[i]; }
            e >>= 1;
            f6mul(base, base, t); for (int i = 0; i < 6; i++) base[i] = t[i];
        }
    }
    for (int i = 0; i < 6; i++) out[i] = r[i];
}

static const u64 TX_INV_ALPHA = 3146514939656186539ULL;

/* one forward Rescue round on a 14-element state slice, ark row r */
static void tx_rescue_round(u64 *st, int r) {
    u64 tmp[14];
    const u64 *ark = ARK_M[r];
    for (int i = 0; i < 14; i++) st[i] = mmul(st[i], mmul(st[i], st[i]));
    for (int i = 0; i < 14; i++) {
        u64 acc = 0;
        for (int j = 0; j < 14; j++) acc = madd(acc, mmul(MDS_M[i * 14 + j], st[j]));
        tmp[i] = madd(acc, ark[i]);
    }
    for (int i = 0; i < 14; i++) st[i] = mpow_m(tmp[i], TX_INV_ALPHA);
    for (int i = 0; i < 14; i++) {
        u64 acc = 0;
        for (int j = 0; j < 14; j++) acc = madd(acc, mmul(MDS_M[i * 14 + j], st[j]));
        tmp[i] = madd(acc, ark[14 + i]);
    }
    for (int i = 0; i < 14; i++) st[i] = tmp[i];
}

static void tx_inject(u64 *state, int base, const u64 *sib_m, u64 bit) {
    for (int k = 0; k < 2; k++) {
        int reg = base + 15 * k;
        u64 digest[7];
        for (int i = 0; i < 7; i++) digest[i] = state[reg + i];
        for (int i = 0; i < 7; i++) state[reg + 7 + i] = bit ? digest[i] : sib_m[i];
        for (int i = 0; i < 7; i++) state[reg + i] = bit ? sib_m[i] : digest[i];
    }
    state[base + 14] = bit ? ONE_M : 0;
}

/* register map (models/transaction.py / models/merkle_update.py):
 * clusters 0,15,29,44 (+bit regs 14,43); PREV_ROOT 58; copies 65..92;
 * schnorr points 0..17 / 19..36 with bit regs 18/37, recomposition 38..41,
 * hash state 42..55; delta range 56/57; sigma range 92/93. */
void transaction_trace(
    const u64 *init_rows,  /* [T][94] standard form */
    const u64 *sibs,       /* [T][2][depth][7] standard (s side then r) */
    const u64 *path_bits,  /* [T][2][depth] 0/1 */
    const u64 *pkey12,     /* [T][12] standard */
    const u64 *rx6,        /* [T][6] standard */
    const u64 *sbits,      /* [T][256] 0/1 */
    const u64 *hbits,      /* [T][256] 0/1 */
    const u64 *msgch,      /* [T][4][7] standard */
    const u64 *dbits,      /* [T][64] 0/1 */
    const u64 *gbits,      /* [T][64] 0/1 (sigma) */
    const u64 *gen12,      /* [12] standard */
    const u64 *b3_std, /* [6] */ u64 depth, u64 T,
    uint32_t *out)         /* [4][94][T*1024] Montgomery 16-bit limb planes
                            * (the device limb layout; see ops/field.py) */
{
    air_eval_init();
    u64 b3[6];
    for (int i = 0; i < 6; i++) b3[i] = mmul(b3_std[i] % P, R2);
    const u64 thl = 8 * depth + 7;
    const u64 n = T * 1024;
    u64 gen_m[12];
    for (int i = 0; i < 12; i++) gen_m[i] = mmul(gen12[i] % P, R2);

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (u64 t = 0; t < T; t++) {
        u64 state[94], pk_m[12], rx_m[6], sib_m[2][32][7], msg_m[4][7];
        for (int i = 0; i < 94; i++) state[i] = mmul(init_rows[t * 94 + i] % P, R2);
        for (int i = 0; i < 12; i++) pk_m[i] = mmul(pkey12[t * 12 + i] % P, R2);
        for (int i = 0; i < 6; i++) rx_m[i] = mmul(rx6[t * 6 + i] % P, R2);
        for (int s = 0; s < 2; s++)
            for (u64 l = 0; l < depth; l++)
                for (int i = 0; i < 7; i++)
                    sib_m[s][l][i] = mmul(
                        sibs[((t * 2 + s) * depth + l) * 7 + i] % P, R2);
        for (int c = 0; c < 4; c++)
            for (int i = 0; i < 7; i++)
                msg_m[c][i] = mmul(msgch[(t * 4 + c) * 7 + i] % P, R2);
        const u64 *sb_t = sbits + t * 256, *hb_t = hbits + t * 256;
        const u64 *db_t = dbits + t * 64, *gb_t = gbits + t * 64;
        const u64 *bit_s = path_bits + t * 2 * depth;
        const u64 *bit_r = bit_s + depth;

        u64 base_col = t * 1024;
#define TX_EMIT(col) do { u64 _c = (col); \
    for (int _i = 0; _i < 94; _i++) { u64 _v = state[_i]; \
        out[(u64)_i * n + _c] = (uint32_t)(_v & 0xFFFF); \
        out[94 * n + (u64)_i * n + _c] = (uint32_t)((_v >> 16) & 0xFFFF); \
        out[2 * 94 * n + (u64)_i * n + _c] = (uint32_t)((_v >> 32) & 0xFFFF); \
        out[3 * 94 * n + (u64)_i * n + _c] = (uint32_t)(_v >> 48); } \
    } while (0)
        TX_EMIT(base_col);

        for (u64 step = 0; step < 1023; step++) {
            if (step < 511) {
                if (step < thl) {
                    u64 cyc = step / 8, pos = step % 8;
                    if (pos < 7) {
                        tx_rescue_round(state + 0, (int)pos);
                        tx_rescue_round(state + 15, (int)pos);
                        tx_rescue_round(state + 29, (int)pos);
                        tx_rescue_round(state + 44, (int)pos);
                    } else {
                        tx_inject(state, 0, sib_m[0][cyc], bit_s[cyc]);
                        tx_inject(state, 29, sib_m[1][cyc], bit_r[cyc]);
                    }
                }
                if (step == thl - 1)
                    for (int i = 0; i < 7; i++) state[58 + i] = state[44 + i];
            } else if (step == 511) {
                for (int i = 0; i < 58; i++) state[i] = 0;
                state[6] = ONE_M;                      /* y(S) = 1 */
                state[25] = ONE_M;                     /* y(h.P) = 1 */
                for (int i = 0; i < 6; i++) state[42 + i] = rx_m[i];
                state[92] = 0; state[93] = 0;
            } else {
                u64 sstep = step - 512;
                /* hash lane: cols 42..56 */
                if (sstep < 40) {
                    u64 pos = sstep % 8;
                    if (pos < 7) tx_rescue_round(state + 42, (int)pos);
                    else if (sstep < 32)
                        for (int i = 0; i < 7; i++) state[49 + i] = msg_m[sstep / 8][i];
                    else
                        for (int i = 0; i < 7; i++) state[49 + i] = 0;
                }
                /* scalar-mul lane: cols 0..42 */
                if (sstep < 510) {
                    u64 real = sstep / 2;
                    u64 chunk = real < 63 ? 0 : (real - 63) / 64 + 1;
                    u64 sb = sb_t[254 - real], hb = hb_t[254 - real];
                    state[18] = sb ? ONE_M : 0;
                    state[37] = hb ? ONE_M : 0;
                    if ((sstep & 1) == 0) {
                        u64 o[18];
                        ec_double(state + 0, b3, o);
                        for (int i = 0; i < 18; i++) state[i] = o[i];
                        ec_double(state + 19, b3, o);
                        for (int i = 0; i < 18; i++) state[19 + i] = o[i];
                        int vp = (int)(41 - chunk);
                        state[vp] = madd(mdbl(state[vp]), state[37]);
                    } else {
                        u64 o[18];
                        if (sb) {
                            ec_add_mixed(state + 0, gen_m, b3, o);
                            for (int i = 0; i < 18; i++) state[i] = o[i];
                        }
                        if (hb) {
                            ec_add_mixed(state + 19, pk_m, b3, o);
                            for (int i = 0; i < 18; i++) state[19 + i] = o[i];
                        }
                    }
                } else if (sstep == 510) {
                    u64 hp[18], o[18], zinv[6], xn[6];
                    for (int i = 0; i < 18; i++) hp[i] = state[19 + i];
                    state[18] = ONE_M;
                    ec_add(state + 0, hp, b3, o);
                    for (int i = 0; i < 18; i++) state[i] = o[i];
                    f6inv(state + 12, zinv);
                    f6mul(state + 0, zinv, xn);
                    for (int i = 0; i < 6; i++) state[i] = xn[i];
                }
                /* range lanes: cols 56/57 (delta), 92/93 (sigma) */
                if (sstep < 64) {
                    state[56] = db_t[63 - sstep] ? ONE_M : 0;
                    state[57] = madd(mdbl(state[57]), state[56]);
                    state[92] = gb_t[63 - sstep] ? ONE_M : 0;
                    state[93] = madd(mdbl(state[93]), state[92]);
                }
            }
            TX_EMIT(base_col + step + 1);
        }
#undef TX_EMIT
    }
}

/* Batch fixed-base scalar multiplication k_i * G for witness generation
 * (reference Scalar::random + pkey derivation / schnorr::sign R = r*G,
 * src/lib.rs:272-333, schnorr/mod.rs:197-217).  scalars are 256-bit LE words;
 * output affine (x||y) 12 limbs per point in STANDARD form. */
void ec_mul_gen_batch(const u64 *scalars, /* [T][4] 256-bit LE words */
                      const u64 *gen12,   /* [12] standard */
                      const u64 *b3_std, /* [6] */ u64 T,
                      u64 *out)           /* [T][12] standard */
{
    air_eval_init();
    u64 b3[6];
    for (int i = 0; i < 6; i++) b3[i] = mmul(b3_std[i] % P, R2);
    u64 gen_m[12];
    for (int i = 0; i < 12; i++) gen_m[i] = mmul(gen12[i] % P, R2);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (u64 t = 0; t < T; t++) {
        const u64 *k = scalars + t * 4;
        int top = 255;
        while (top >= 0 && !((k[top >> 6] >> (top & 63)) & 1)) top--;
        u64 st[18] = {0}, o[18];
        st[6] = ONE_M;                       /* identity (0 : 1 : 0) */
        for (int b = top; b >= 0; b--) {
            ec_double(st, b3, o);
            for (int i = 0; i < 18; i++) st[i] = o[i];
            if ((k[b >> 6] >> (b & 63)) & 1) {
                ec_add_mixed(st, gen_m, b3, o);
                for (int i = 0; i < 18; i++) st[i] = o[i];
            }
        }
        u64 zinv[6], xa[6], ya[6];
        f6inv(st + 12, zinv);
        f6mul(st + 0, zinv, xa);
        f6mul(st + 6, zinv, ya);
        for (int i = 0; i < 6; i++) {
            out[t * 12 + i] = mmul(xa[i], 1);        /* Montgomery -> std */
            out[t * 12 + 6 + i] = mmul(ya[i], 1);
        }
    }
}
