"""Pallas kernel prototypes (interpret mode on CPU) vs jnp field kernels."""
import numpy as np
import jax.numpy as jnp

from certificate_stark_tpu.ops import field as F
from certificate_stark_tpu.ops import pallas_kernels as PK


def test_pallas_mul_matches():
    rng = np.random.default_rng(2)
    a = rng.integers(0, F.P, size=2048, dtype=np.uint64)
    b = rng.integers(0, F.P, size=2048, dtype=np.uint64)
    la, lb = jnp.asarray(F.from_int(a)), jnp.asarray(F.from_int(b))
    got = np.asarray(PK.pallas_mul(la, lb, interpret=True))
    exp = np.asarray(F.mul(la, lb))
    assert np.array_equal(got, exp)


def test_pallas_rescue_permutation_matches():
    from certificate_stark_tpu.ops import rescue as R
    rng = np.random.default_rng(3)
    vals = rng.integers(0, F.P, size=(14, 8), dtype=np.uint64)
    st = jnp.asarray(F.from_int(vals))
    got = np.asarray(PK.pallas_rescue_permutation(st, interpret=True))
    exp = np.asarray(R.permutation(st))
    assert np.array_equal(got, exp)



def test_pallas_rescue_permutation_tpu_compiles():
    """Mosaic lowering regression guard (ADVICE r4): the interpret-mode tests
    above never exercise real TPU compilation, so the odd-n concatenate
    zero-pad branch of _k_sumred could regress silently. Runs only when a TPU
    backend is attached."""
    import jax
    import pytest
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    from certificate_stark_tpu.ops import rescue as R
    rng = np.random.default_rng(4)
    vals = rng.integers(0, F.P, size=(14, 256), dtype=np.uint64)
    st = jnp.asarray(F.from_int(vals))
    got = np.asarray(PK.pallas_rescue_permutation(st, interpret=False))
    exp = np.asarray(R.permutation(st))
    assert np.array_equal(got, exp)
