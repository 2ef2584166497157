#!/usr/bin/env python
"""Generate a scalar-field generator point for the subfield Cheetah-f63 curve:
a random fp6 point multiplied by the cofactor -> order-SCALAR_Q generator.
Writes certificate_stark_tpu/params/curve_subfield_gen.py"""
import sys
import random
sys.path.insert(0, "/root/repo")

from certificate_stark_tpu.utils import field_ref as FR
from certificate_stark_tpu.params import curve_subfield as CS
from certificate_stark_tpu.params.data import P

rng = random.Random(2024)
B6 = FR.f6_scalar(CS.B0)
A6 = FR.f6_scalar(1)

# v2(p^6-1) = 55 + 1 = 56 ; tonelli-shanks in fp6
Q6 = P ** 6
S = 56
T = (Q6 - 1) >> S
assert T % 2 == 1


def f6_rand():
    return ((rng.randrange(P), rng.randrange(P)),
            (rng.randrange(P), rng.randrange(P)),
            (rng.randrange(P), rng.randrange(P)))


def is_qr(a):
    return FR.f6_pow(a, (Q6 - 1) // 2) == FR.F6_ONE


def f6_sqrt(a):
    assert is_qr(a)
    z = f6_rand()
    while is_qr(z):
        z = f6_rand()
    m, c, t, r = S, FR.f6_pow(z, T), FR.f6_pow(a, T), FR.f6_pow(a, (T + 1) // 2)
    while t != FR.F6_ONE:
        i, tt = 0, t
        while tt != FR.F6_ONE:
            tt = FR.f6_mul(tt, tt)
            i += 1
        b = FR.f6_pow(c, 1 << (m - i - 1))
        m, c = i, FR.f6_mul(b, b)
        t, r = FR.f6_mul(t, c), FR.f6_mul(r, b)
    return r


def main():
    from certificate_stark_tpu.utils import curve as CV
    while True:
        x = f6_rand()
        rhs = FR.f6_add(FR.f6_add(FR.f6_mul(x, FR.f6_mul(x, x)), x), B6)
        if not is_qr(rhs):
            continue
        y = f6_sqrt(rhs)
        pt = (x, y)
        g = CV.mul(CS.COFACTOR, pt)
        if g is None:
            continue
        assert CV.mul(CS.SCALAR_Q, g) is None, "generator order mismatch"
        gx, gy = FR.f6_to_limbs(g[0]), FR.f6_to_limbs(g[1])
        with open("/root/repo/certificate_stark_tpu/params/curve_subfield_gen.py", "w") as f:
            f.write('"""Order-SCALAR_Q generator of the subfield Cheetah-f63 curve\n'
                    '(scripts/gen_subfield_generator.py)."""\n\n')
            f.write("GX = %r\n" % (gx,))
            f.write("GY = %r\n" % (gy,))
        print("wrote generator; verified order", CS.SCALAR_Q.bit_length(), "bits")
        return


if __name__ == "__main__":
    main()
