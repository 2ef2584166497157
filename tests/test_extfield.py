"""Extension-field ops: device vs host mirrors, field axioms."""
import random

import numpy as np
import jax.numpy as jnp

from certificate_stark_tpu.ops import extfield as XF, field as F

rng = random.Random(8)


def dev(x):
    return jnp.asarray(F.from_int(np.array(x, dtype=object)[:, None]))


def ints(arr):
    return [int(v) for v in F.to_int(np.asarray(arr))[:, 0]]


def test_e2_mul_matches_host():
    a = [rng.randrange(F.P) for _ in range(2)]
    b = [rng.randrange(F.P) for _ in range(2)]
    assert ints(XF.e2_mul(dev(a), dev(b))) == XF.host_e2_mul(a, b)


def test_e3_mul_matches_host():
    a = [rng.randrange(F.P) for _ in range(3)]
    b = [rng.randrange(F.P) for _ in range(3)]
    assert ints(XF.e3_mul(dev(a), dev(b))) == XF.host_e3_mul(a, b)


def test_ext_inverse():
    for d in (2, 3):
        a = [rng.randrange(1, F.P) for _ in range(d)]
        inv = XF.host_ext_inv(a, d)
        one = XF.host_ext_mul(a, inv, d)
        assert one == [1] + [0] * (d - 1)


def test_ext_mul_associative_distributive():
    for d in (2, 3):
        a = [rng.randrange(F.P) for _ in range(d)]
        b = [rng.randrange(F.P) for _ in range(d)]
        c = [rng.randrange(F.P) for _ in range(d)]
        ab_c = XF.host_ext_mul(XF.host_ext_mul(a, b, d), c, d)
        a_bc = XF.host_ext_mul(a, XF.host_ext_mul(b, c, d), d)
        assert ab_c == a_bc
