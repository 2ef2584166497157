"""Field arithmetic kernels vs the Python-int golden reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certificate_stark_tpu.ops import field as F
from certificate_stark_tpu.utils import field_ref as FR

rng = np.random.default_rng(7)


def rand_ints(n):
    vals = rng.integers(0, F.P, size=n, dtype=np.uint64).astype(object)
    # sprinkle edge cases
    vals[0] = 0
    vals[1] = F.P - 1
    vals[2] = 1
    return vals


def test_roundtrip():
    v = rand_ints(64)
    limbs = F.from_int(v)
    back = F.to_int(limbs)
    assert all(int(a) == int(b) for a, b in zip(v, back))


def test_add_sub_neg():
    a, b = rand_ints(256), rand_ints(256)
    la, lb = jnp.asarray(F.from_int(a)), jnp.asarray(F.from_int(b))
    got = F.to_int(np.asarray(F.add(la, lb)))
    exp = [FR.fadd(int(x), int(y)) for x, y in zip(a, b)]
    assert list(got) == exp
    got = F.to_int(np.asarray(F.sub(la, lb)))
    exp = [FR.fsub(int(x), int(y)) for x, y in zip(a, b)]
    assert list(got) == exp
    got = F.to_int(np.asarray(F.neg(la)))
    exp = [(-int(x)) % F.P for x in a]
    assert list(got) == exp


def test_mul():
    a, b = rand_ints(256), rand_ints(256)
    la, lb = jnp.asarray(F.from_int(a)), jnp.asarray(F.from_int(b))
    got = F.to_int(np.asarray(F.mul(la, lb)))
    exp = [FR.fmul(int(x), int(y)) for x, y in zip(a, b)]
    assert list(got) == exp


def test_mul_jit_and_square():
    a, b = rand_ints(128), rand_ints(128)
    la, lb = jnp.asarray(F.from_int(a)), jnp.asarray(F.from_int(b))
    got = F.to_int(np.asarray(jax.jit(F.mul)(la, lb)))
    exp = [FR.fmul(int(x), int(y)) for x, y in zip(a, b)]
    assert list(got) == exp
    got = F.to_int(np.asarray(F.square(la)))
    exp = [FR.fmul(int(x), int(x)) for x in a]
    assert list(got) == exp


def test_pow_inv():
    a = rand_ints(32)
    a[0] = 5  # avoid 0 for inv
    la = jnp.asarray(F.from_int(a))
    got = F.to_int(np.asarray(F.pow_const(la, 3)))
    exp = [FR.fpow(int(x), 3) for x in a]
    assert list(got) == exp
    nz = a.copy()
    nz[nz == 0] = 1
    lnz = jnp.asarray(F.from_int(nz))
    got = F.to_int(np.asarray(F.inv(lnz)))
    exp = [FR.finv(int(x)) for x in nz]
    assert list(got) == exp


def test_mont_domain_helpers():
    a = rand_ints(32)
    std = jnp.asarray(F.from_int(a, mont=False))
    m = F.to_mont(std)
    assert list(F.to_int(np.asarray(m), mont=True)) == [int(x) for x in a]
    back = F.from_mont(m)
    assert list(F.to_int(np.asarray(back), mont=False)) == [int(x) for x in a]


def test_generator_is_generator():
    g = F.GENERATOR
    assert pow(g, (F.P - 1) // 2, F.P) != 1
    assert pow(g, (F.P - 1) // 131, F.P) != 1


def test_pack_unpack_u64():
    a = rand_ints(64)
    limbs = F.from_int(a)
    u = F.pack_u64(limbs)
    again = F.unpack_u64(u)
    assert np.array_equal(limbs, again)
