#!/usr/bin/env python
"""Verify and adopt the fp2-b Cheetah-f63 curve instance found by the
fp2 search (scripts/find_fp2_curve.py + native/fp2_count kangaroo):

    E: y^2 = x^3 + x + b,  b = B0 + B1*u in F_{p^2} \\ F_p

The search recorded the F_{p^2} Frobenius trace t2; this script independently
validates it (random E(F_p2) point annihilated by N2 = p^2+1-t2), lifts the
zeta function to F_{p^6} (s6 = t2^3 - 3 p^2 t2, N6 = p^6+1-s6), extracts the
large prime scalar field q from N6, verifies a random E(F_p6) point is
annihilated by N6, derives an order-q generator (cofactor multiplication),
and writes certificate_stark_tpu/params/curve_fp2.py.

Reference strength target: the reference's Cheetah scalar field is ~254 bits
(/root/reference/src/utils/ecc.rs:23-45, schnorr/mod.rs:197-245); an fp2-b
curve's primitive part caps at ~249 bits (M ~ p^4). q >= 240 bits gives
~2^120 generic-DL security, matching the reference's ~2^127 class.
"""
import json
import random
import sys

sys.path.insert(0, "/root/repo")

from certificate_stark_tpu.params.data import P          # noqa: E402
from certificate_stark_tpu.utils import field_ref as FR  # noqa: E402
from certificate_stark_tpu.utils import ecc_ref as ER    # noqa: E402

# the best prime-core hit from scripts/fp2_search_state.jsonl (see the
# round-3 re-analysis: 245-bit prime core at b=(5,29))
B0, B1 = 5, 29
T2 = -675552048108761573

rng = random.Random(20260819)


def is_probable_prime(n, rounds=64):
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    rg = random.Random(0xBEEF ^ n)
    for _ in range(rounds):
        a = rg.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def strip_small(n, bound=1 << 20):
    for q in (2, 3, 5, 7, 11, 13):
        while n % q == 0:
            n //= q
    f = 17
    while f < bound and f * f <= n:
        while n % f == 0:
            n //= f
        f += 2
    return n


B6 = ((B0, B1), (0, 0), (0, 0))
B3_LIMBS = [(3 * B0) % P, (3 * B1) % P, 0, 0, 0, 0]

Q6 = P ** 6
S2ADIC = 56  # v2(p^6 - 1) = v2(p-1)+1 = 56
T_ODD = (Q6 - 1) >> S2ADIC
assert T_ODD % 2 == 1


def f6_rand(sub_fp2=False):
    if sub_fp2:
        return ((rng.randrange(P), rng.randrange(P)), (0, 0), (0, 0))
    return ((rng.randrange(P), rng.randrange(P)),
            (rng.randrange(P), rng.randrange(P)),
            (rng.randrange(P), rng.randrange(P)))


def is_qr(a):
    return FR.f6_pow(a, (Q6 - 1) // 2) == FR.F6_ONE


def f6_sqrt(a):
    z = f6_rand()
    while is_qr(z):
        z = f6_rand()
    m, c = S2ADIC, FR.f6_pow(z, T_ODD)
    t, r = FR.f6_pow(a, T_ODD), FR.f6_pow(a, (T_ODD + 1) // 2)
    while t != FR.F6_ONE:
        i, tt = 0, t
        while tt != FR.F6_ONE:
            tt = FR.f6_mul(tt, tt)
            i += 1
        b = FR.f6_pow(c, 1 << (m - i - 1))
        m, c = i, FR.f6_mul(b, b)
        t, r = FR.f6_mul(t, c), FR.f6_mul(r, b)
    return r


def rand_point(sub_fp2=False):
    """Random affine point on E (coords in fp2 if sub_fp2)."""
    while True:
        x = f6_rand(sub_fp2)
        rhs = FR.f6_add(FR.f6_add(FR.f6_mul(x, FR.f6_mul(x, x)), x), B6)
        if not is_qr(rhs):
            continue
        y = f6_sqrt(rhs)
        if sub_fp2:
            assert y[1] == (0, 0) and y[2] == (0, 0), "sqrt left fp2"
        return FR.f6_to_limbs(x) + FR.f6_to_limbs(y)


def proj_mul(k, affine12):
    """k * P via projective double-and-add (complete RCB formulas,
    b3 passed explicitly). Returns projective 18-limb state."""
    acc = [0] * 6 + [1] + [0] * 11  # (0 : 1 : 0)
    base = list(affine12) + [1, 0, 0, 0, 0, 0]
    bit = k.bit_length() - 1
    while bit >= 0:
        acc = ER.compute_double(acc, B3_LIMBS)
        if (k >> bit) & 1:
            acc = ER.compute_add_mixed(acc, affine12, B3_LIMBS)
        bit -= 1
    return acc


def is_identity(state18):
    return all(v == 0 for v in state18[12:18])


def to_affine(state18):
    z = FR.f6_from_limbs(state18[12:18])
    zi = FR.f6_inv(z)
    x = FR.f6_mul(FR.f6_from_limbs(state18[0:6]), zi)
    y = FR.f6_mul(FR.f6_from_limbs(state18[6:12]), zi)
    return FR.f6_to_limbs(x) + FR.f6_to_limbs(y)


def main():
    n2 = P * P + 1 - T2
    s6 = T2 ** 3 - 3 * (P * P) * T2
    n6 = P ** 6 + 1 - s6
    assert n6 % n2 == 0, "zeta lift: N2 must divide N6"
    m = n6 // n2
    q = strip_small(m)
    print(f"q bits = {q.bit_length()}")
    assert q.bit_length() >= 240, "scalar field below the 240-bit bar"
    assert is_probable_prime(q), "core not prime"
    cof = n6 // q
    assert cof * q == n6

    # 1. independent check of the kangaroo trace: N2 kills E(F_p2)
    for _ in range(2):
        pt2 = rand_point(sub_fp2=True)
        assert is_identity(proj_mul(n2, pt2)), "N2 check failed (bad t2?)"
    print("N2 * random E(F_p2) point == O  [t2 verified]")

    # 2. N6 kills E(F_p6)
    pt6 = rand_point()
    assert is_identity(proj_mul(n6, pt6)), "N6 check failed"
    print("N6 * random E(F_p6) point == O  [zeta lift verified]")

    # 3. order-q generator
    while True:
        pt6 = rand_point()
        g_proj = proj_mul(cof, pt6)
        if not is_identity(g_proj):
            break
    g12 = to_affine(g_proj)
    assert is_identity(proj_mul(q, g12)), "generator order mismatch"
    # sanity: q is the exact order (g has order dividing q, q prime, g != O)
    print("generator verified: order q,", q.bit_length(), "bits")

    path = "/root/repo/certificate_stark_tpu/params/curve_fp2.py"
    with open(path, "w") as f:
        f.write('"""Reference-strength fp2-b Cheetah-f63 instance '
                '(scripts/adopt_fp2_curve.py).\n'
                'E: y^2 = x^3 + x + (B0 + B1*u) over fp6; scalar field = the '
                f'{q.bit_length()}-bit prime\nfactor of #E(F_p6) '
                '(~2^122 generic-DL security; reference ecc.rs:23-45 is '
                '~2^127).\nFound by parallel-kangaroo point counting over '
                'F_p2 (native/fp2_count.c) +\nzeta-function lift; '
                'order and generator verified by scalar multiplication\n'
                'here AND in tests/test_curve_params.py."""\n\n')
        f.write(f"B_LIMBS = [{B0}, {B1}, 0, 0, 0, 0]\n")
        f.write(f"TRACE_FP2 = {T2}  # Frobenius trace over F_p2\n")
        f.write(f"N2 = {n2}  # points over F_p2\n")
        f.write(f"N6 = {n6}\n")
        f.write(f"SCALAR_Q = {q}  # {q.bit_length()}-bit prime scalar field\n")
        f.write(f"COFACTOR = {cof}\n")
        f.write(f"GX = {g12[:6]!r}\n")
        f.write(f"GY = {g12[6:]!r}\n")
    print("wrote", path)
    with open("/root/repo/scripts/fp2_found.json", "w") as f:
        json.dump({"b0": B0, "b1": B1, "t2": T2, "n6": str(n6),
                   "prime_q": str(q), "cofactor": str(cof),
                   "q_bits": q.bit_length()}, f, indent=1)


if __name__ == "__main__":
    main()
