#!/usr/bin/env python
"""Find a curve y^2 = x^3 + x + b0 with b0 in F_p (inside fp6) whose F_{p^6} group
order has a large prime factor, for the Schnorr sub-AIR's scalar field.

Why: the reference's curve (src/utils/ecc.rs:23-45) uses b in fp6\\F_p whose group
order lives only in the (unvendored) winterfell fork; counting points on a generic
curve over a 378-bit field requires SEA, infeasible here. A subfield-b curve keeps
the exact same curve form / formulas / tower, with a computable order:
  #E(F_p) = p+1-t by interval-BSGS, then #E(F_{p^6}) = p^6+1-s6 via the zeta
  recurrence s_{k+1} = t*s_k - p*s_{k-1}. The 'new' part M6 = N6/(N1*M2*M3) is
  ~126 bits; we search b0 such that M6 is prime and use it as the scalar field.

Output: certificate_stark_tpu/params/curve_subfield.py
"""
import sys
import random
from math import isqrt, gcd
sys.path.insert(0, "/root/repo")
from certificate_stark_tpu.params.data import P as p

random.seed(12345)


def legendre(a):
    return pow(a % p, (p - 1) // 2, p)


def sqrt_fp(a):
    # Tonelli-Shanks for p-1 = 131 * 2^55
    a %= p
    if a == 0:
        return 0
    assert legendre(a) == 1
    Q, S = 131, 55
    z = 2
    while legendre(z) != p - 1:
        z += 1
    M, c, t, r = S, pow(z, Q, p), pow(a, Q, p), pow(a, (Q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (M - i - 1), p)
        M, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


class Curve:
    def __init__(self, b0):
        self.b = b0 % p

    def on(self, Q):
        if Q is None:
            return True
        x, y = Q
        return (y * y - x * x * x - x - self.b) % p == 0

    def add(self, Q1, Q2):
        if Q1 is None:
            return Q2
        if Q2 is None:
            return Q1
        x1, y1 = Q1
        x2, y2 = Q2
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            lam = (3 * x1 * x1 + 1) * pow(2 * y1, p - 2, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    def neg(self, Q):
        return None if Q is None else (Q[0], (-Q[1]) % p)

    def mul(self, k, Q):
        if k < 0:
            return self.mul(-k, self.neg(Q))
        r = None
        while k:
            if k & 1:
                r = self.add(r, Q)
            Q = self.add(Q, Q)
            k >>= 1
        return r

    def rand_point(self):
        while True:
            x = random.randrange(p)
            rhs = (x * x * x + x + self.b) % p
            if rhs == 0:
                return (x, 0)
            if legendre(rhs) == 1:
                return (x, sqrt_fp(rhs))


def point_order_multiple(E, Q, lo, width):
    """Return all n in [0, width) with (lo+n)Q = O, via BSGS."""
    m = isqrt(width) + 1
    table = {}
    R = None  # j*Q
    for j in range(m):
        if R is not None:
            table.setdefault(R, j)
        else:
            table[None] = j
        R = E.add(R, Q)
    # want (lo+n)Q = O -> nQ = -(lo)Q ; n = i*m + j -> jQ = -(lo)Q - i*m*Q
    target = E.neg(E.mul(lo, Q))
    mQ = E.neg(E.mul(m, Q))
    sols = []
    S = target
    for i in range(m + 1):
        if S in table or (S is None and None in table):
            j = table[S]
            n = i * m + j
            if n < width:
                sols.append(n)
        S = E.add(S, mQ)
    return sorted(set(sols))


def count_points(E):
    s = isqrt(4 * p)
    lo = p + 1 - s - 1
    width = 2 * s + 3
    L = 1
    for _ in range(24):
        Q = E.rand_point()
        sols = [lo + n for n in point_order_multiple(E, Q, lo, width)]
        assert sols, "BSGS found no kill — bug"
        if len(sols) == 1:
            d = sols[0]
        else:
            d = sols[0]
            for x in sols[1:]:
                d = gcd(d, x)
            # ord(Q) divides gcd of all sols? sols are multiples of ord in window
            diffs = gcd(sols[1] - sols[0], sols[-1] - sols[0])
            d = gcd(sols[0], diffs)
        L = L * d // gcd(L, d)
        # unique multiple of L in window?
        k0 = (lo + L - 1) // L
        if (k0 + 1) * L > lo + width - 1:
            N = k0 * L
            assert E.mul(N, E.rand_point()) is None
            return N
    raise RuntimeError("ambiguous order")


def is_prime(n):
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
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


def main():
    for b0 in range(2, 2000):
        # nonsingular: 4a^3+27b^2 != 0 with a=1
        if (4 + 27 * b0 * b0) % p == 0:
            continue
        E = Curve(b0)
        try:
            N1 = count_points(E)
        except RuntimeError:
            continue
        t = p + 1 - N1
        s = [2, t]
        for _ in range(5):
            s.append(t * s[-1] - p * s[-2])
        N6 = p ** 6 + 1 - s[6]
        M2 = p + 1 + t
        N3 = p ** 3 + 1 - s[3]
        assert N3 % N1 == 0
        M3 = N3 // N1
        assert N6 % (N1 * M2 * M3) == 0
        M6 = N6 // (N1 * M2 * M3)
        print(f"b0={b0} t={t} M6 bits={M6.bit_length()} prime={is_prime(M6)}", flush=True)
        if is_prime(M6) and M6.bit_length() >= 120:
            cof = N6 // M6
            out = "/root/repo/certificate_stark_tpu/params/curve_subfield.py"
            with open(out, "w") as f:
                f.write('"""Subfield-b Cheetah-f63 instance (scripts/find_subfield_curve.py).\n'
                        'Same curve form y^2 = x^3 + x + b as the reference (a=1 tower),\n'
                        'with b in F_p so the group order is computable. See DESIGN.md.\n"""\n\n')
                f.write("B0 = %d  # curve: y^2 = x^3 + x + B0 (b3 = 3*B0)\n" % b0)
                f.write("TRACE_FP = %d  # trace of Frobenius over F_p\n" % t)
                f.write("N1 = %d  # number of points over F_p\n" % N1)
                f.write("N6 = %d  # number of points over F_p6\n" % N6)
                f.write("SCALAR_Q = %d  # %d-bit prime scalar field (new part of N6)\n"
                        % (M6, M6.bit_length()))
                f.write("COFACTOR = %d\n" % cof)
            print("wrote params/curve_subfield.py")
            return
    raise SystemExit("no candidate found")


if __name__ == "__main__":
    main()
