#!/usr/bin/env python
"""Determine the group structure of the Cheetah-f63 curve used by the reference.

The curve is E: y^2 = x^3 + b over fp6 (j-invariant 0). Since p ≡ 2 (mod 3), all
j=0 curves over extensions of F_p are supersingular, so the trace of Frobenius over
F_{p^6} is one of {0, ±p^3, ±2p^3}. We test which candidate order kills the
reference generator (src/utils/ecc.rs:23-36), then compute ord(G) and the prime
scalar-field order q (the largest prime factor).

Writes certificate_stark_tpu/params/curve_order.py
"""
import sys
sys.path.insert(0, "/root/repo")
from certificate_stark_tpu.params.data import P, CURVE_GENERATOR, CURVE_B3
import sympy

p = P

# ---- fp2 = fp[u]/(u^2 - 2u - 2), fp6 = fp2[v]/(v^3 + v + 1) -------------------


def f2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 + 2 * a1 * b1) % p, (a0 * b1 + a1 * b0 + 2 * a1 * b1) % p)


def f2_add(a, b):
    return ((a[0] + b[0]) % p, (a[1] + b[1]) % p)


def f2_sub(a, b):
    return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)


def f2_neg(a):
    return ((-a[0]) % p, (-a[1]) % p)


def f6_mul(A, B):
    # A, B: tuples of 3 fp2 elements; v^3 = -v - 1
    a0, a1, a2 = A
    b0, b1, b2 = B
    aa = f2_mul(a0, b0)
    bb = f2_mul(a1, b1)
    cc = f2_mul(a2, b2)
    c3 = f2_add(f2_mul(a1, b2), f2_mul(a2, b1))  # coeff of v^3
    c4 = cc                                       # coeff of v^4
    m1 = f2_add(f2_mul(a0, b1), f2_mul(a1, b0))
    m2 = f2_add(f2_add(f2_mul(a0, b2), f2_mul(a2, b0)), bb)
    # v^3 = -1 - v ; v^4 = -v - v^2
    c0 = f2_sub(aa, c3)
    c1 = f2_sub(f2_sub(m1, c3), c4)
    c2 = f2_sub(m2, c4)
    return (c0, c1, c2)


def f6_add(A, B):
    return tuple(f2_add(x, y) for x, y in zip(A, B))


def f6_sub(A, B):
    return tuple(f2_sub(x, y) for x, y in zip(A, B))


def f6_neg(A):
    return tuple(f2_neg(x) for x in A)


F6_ZERO = (((0, 0),) * 3)
F6_ONE = (((1, 0),) + ((0, 0),) * 2)


def f6_from_limbs(limbs):
    return ((limbs[0], limbs[1]), (limbs[2], limbs[3]), (limbs[4], limbs[5]))


def f6_scalar(c):
    return (((c % p, 0),) + ((0, 0),) * 2)


def f6_pow(A, e):
    r = F6_ONE
    while e:
        if e & 1:
            r = f6_mul(r, A)
        A = f6_mul(A, A)
        e >>= 1
    return r


def f6_inv(A):
    # A^(p^6 - 2)
    return f6_pow(A, p ** 6 - 2)


def f6_is_zero(A):
    return all(x == (0, 0) for x in A)


# ---- projective point ops on y^2 = x^3 + b (generic, for order checking) ------
INF = None


def pt_add(Q1, Q2, b):
    if Q1 is INF:
        return Q2
    if Q2 is INF:
        return Q1
    x1, y1 = Q1
    x2, y2 = Q2
    if x1 == x2:
        if f6_is_zero(f6_add(y1, y2)):
            return INF
        # doubling: lam = 3x^2 / 2y
        num = f6_mul(f6_scalar(3), f6_mul(x1, x1))
        den = f6_inv(f6_mul(f6_scalar(2), y1))
    else:
        num = f6_sub(y2, y1)
        den = f6_inv(f6_sub(x2, x1))
    lam = f6_mul(num, den)
    x3 = f6_sub(f6_sub(f6_mul(lam, lam), x1), x2)
    y3 = f6_sub(f6_mul(lam, f6_sub(x1, x3)), y1)
    return (x3, y3)


def pt_mul(k, Q, b):
    r = INF
    while k:
        if k & 1:
            r = pt_add(r, Q, b)
        Q = pt_add(Q, Q, b)
        k >>= 1
    return r


def main():
    G = (f6_from_limbs(CURVE_GENERATOR[:6]), f6_from_limbs(CURVE_GENERATOR[6:]))
    b3 = f6_from_limbs(CURVE_B3)
    inv3 = pow(3, p - 2, p)
    b = f6_mul(f6_scalar(inv3), b3)

    # on-curve check
    x, y = G
    lhs = f6_mul(y, y)
    rhs = f6_add(f6_mul(x, f6_mul(x, x)), b)
    assert lhs == rhs, "generator not on curve — tower derivation wrong!"
    print("generator is on curve: OK")

    q6 = p ** 6
    p3 = p ** 3
    candidates = {"t=0": q6 + 1, "t=p3": q6 + 1 - p3, "t=-p3": q6 + 1 + p3,
                  "t=2p3": q6 + 1 - 2 * p3, "t=-2p3": q6 + 1 + 2 * p3}
    order = None
    for name, n in candidates.items():
        if pt_mul(n, G, b) is INF:
            print(f"group order candidate {name} = {n} kills G")
            order = n
            break
    assert order is not None, "no candidate order kills G; curve is not supersingular?"

    # factor the order (sympy: the structured candidates factor algebraically)
    fac = sympy.factorint(order)
    print("factorization:", fac)
    # ord(G): strip each prime as far as possible
    n = order
    for prime, e in fac.items():
        for _ in range(e):
            if pt_mul(n // prime, G, b) is INF:
                n //= prime
            else:
                break
    print("ord(G) =", n, f"({n.bit_length()} bits)")
    q = max(fac)  # largest prime factor = scalar field order
    print("largest prime factor q =", q, f"({q.bit_length()} bits)")
    print("ord(G) == q:", n == q)

    with open("/root/repo/certificate_stark_tpu/params/curve_order.py", "w") as f:
        f.write('"""Cheetah-f63 group structure, computed by scripts/find_curve_order.py.\n'
                'The curve (j=0, p=2 mod 3) is supersingular; the order below was verified\n'
                'by scalar-multiplying the reference generator (src/utils/ecc.rs:23-36).\n"""\n\n')
        f.write("CURVE_ORDER = %d\n" % order)
        f.write("GENERATOR_ORDER = %d\n" % n)
        f.write("SCALAR_Q = %d  # %d-bit prime; Schnorr scalar field\n" % (q, q.bit_length()))
        f.write("COFACTOR = %d\n" % (order // n))
    print("wrote params/curve_order.py")


if __name__ == "__main__":
    main()
