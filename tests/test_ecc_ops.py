"""Device ECC kernels vs Python-int reference formulas."""
import random

import numpy as np
import jax.numpy as jnp

from certificate_stark_tpu.engine.fieldops import BASE
from certificate_stark_tpu.ops import ecc as E, field as F
from certificate_stark_tpu.utils import curve as CV, ecc_ref as ER, field_ref as FR

rng = random.Random(1)


def dev(x):
    return jnp.asarray(F.from_int(np.array(x, dtype=object)[:, None]))


def ints(arr):
    return [int(v) for v in F.to_int(np.asarray(arr))[:, 0]]


def test_f6_mul_matches():
    a = [rng.randrange(F.P) for _ in range(6)]
    b = [rng.randrange(F.P) for _ in range(6)]
    got = ints(E.f6_mul(BASE, dev(a), dev(b)))
    exp = FR.f6_to_limbs(FR.f6_mul(FR.f6_from_limbs(a), FR.f6_from_limbs(b)))
    assert got == exp


def test_point_ops_match():
    b3 = dev(CV.B3_LIMBS)
    pt = [rng.randrange(F.P) for _ in range(18)]
    pt2 = [rng.randrange(F.P) for _ in range(18)]
    aff = [rng.randrange(F.P) for _ in range(12)]
    assert ints(E.compute_double(BASE, dev(pt), b3)) == ER.compute_double(pt)
    assert ints(E.compute_add_mixed(BASE, dev(pt), dev(aff), b3)) == \
        ER.compute_add_mixed(pt, aff)
    assert ints(E.compute_add(BASE, dev(pt), dev(pt2), b3)) == ER.compute_add(pt, pt2)


def test_point_ops_match_fp2_b3():
    # the reference-strength instance's b3 = 3*(5+29u) exercises the fp2
    # fast path of ops/ecc._mul_b3 (9 base muls) — must be bit-identical to
    # the Python-int formulas with the same constant
    b3_limbs = [15, 87, 0, 0, 0, 0]
    b3 = dev(b3_limbs)
    assert E._is_fp2_const(np.asarray(b3)) and not E._is_scalar_const(b3)
    pt = [rng.randrange(F.P) for _ in range(18)]
    pt2 = [rng.randrange(F.P) for _ in range(18)]
    aff = [rng.randrange(F.P) for _ in range(12)]
    assert ints(E.compute_double(BASE, dev(pt), b3)) == \
        ER.compute_double(pt, b3_limbs)
    assert ints(E.compute_add_mixed(BASE, dev(pt), dev(aff), b3)) == \
        ER.compute_add_mixed(pt, aff, b3_limbs)
    assert ints(E.compute_add(BASE, dev(pt), dev(pt2), b3)) == \
        ER.compute_add(pt, pt2, b3_limbs)
    # full-fp6 b3 falls through to the generic karatsuba — same answers
    b3f_limbs = [rng.randrange(F.P) for _ in range(6)]
    b3f = dev(b3f_limbs)
    assert ints(E.compute_double(BASE, dev(pt), b3f)) == \
        ER.compute_double(pt, b3f_limbs)


def test_projective_formulas_match_group_law():
    G = CV.generator()
    g18 = (FR.f6_to_limbs(G[0]) + FR.f6_to_limbs(G[1]) + FR.f6_to_limbs(FR.F6_ONE))
    d = ER.compute_double(g18)
    assert ER.to_affine_x(d) == FR.f6_to_limbs(CV.mul(2, G)[0])
    m = ER.compute_add_mixed(d, FR.f6_to_limbs(G[0]) + FR.f6_to_limbs(G[1]))
    assert ER.to_affine_x(m) == FR.f6_to_limbs(CV.mul(3, G)[0])
