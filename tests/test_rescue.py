"""Rescue kernels vs the Python-int golden implementation."""
import numpy as np
import jax
import jax.numpy as jnp

from certificate_stark_tpu.ops import field as F, rescue as R
from certificate_stark_tpu.utils import rescue_ref as RR

rng = np.random.default_rng(3)


def rand_states(b):
    return rng.integers(0, F.P, size=(14, b), dtype=np.uint64)


def test_round_matches_reference():
    vals = rand_states(4)
    st = jnp.asarray(F.from_int(vals))
    got = F.to_int(np.asarray(jax.jit(lambda s: R.apply_round(s, 0))(st)))
    for col in range(4):
        exp = RR.apply_round([int(v) for v in vals[:, col]], 0)
        assert [int(x) for x in got[:, col]] == exp


def test_permutation_batch():
    vals = rand_states(8)
    st = jnp.asarray(F.from_int(vals))
    got = F.to_int(np.asarray(jax.jit(R.permutation)(st)))
    for col in range(8):
        exp = RR.permutation([int(v) for v in vals[:, col]])
        assert [int(x) for x in got[:, col]] == exp


def test_digest_and_merge():
    data = rng.integers(0, F.P, size=(10, 3), dtype=np.uint64)  # partial chunk
    el = jnp.asarray(F.from_int(data))
    got = F.to_int(np.asarray(R.digest(el)))
    for col in range(3):
        exp = RR.digest([int(v) for v in data[:, col]])
        assert [int(x) for x in got[:, col]] == exp

    d0 = rng.integers(0, F.P, size=(7, 3), dtype=np.uint64)
    d1 = rng.integers(0, F.P, size=(7, 3), dtype=np.uint64)
    gm = F.to_int(np.asarray(R.merge(jnp.asarray(F.from_int(d0)), jnp.asarray(F.from_int(d1)))))
    for col in range(3):
        exp = RR.merge([int(v) for v in d0[:, col]], [int(v) for v in d1[:, col]])
        assert [int(x) for x in gm[:, col]] == exp


def test_inv_sbox_is_cube_root():
    vals = rand_states(2)
    st = jnp.asarray(F.from_int(vals))
    cubed = R.sbox(st)
    back = jax.jit(R.inv_sbox)(cubed)
    assert np.array_equal(np.asarray(back), np.asarray(st))


def test_mds_mxu_path_matches_mul_sum():
    """The MXU byte-plane MDS (ops/rescue._mds_apply_mxu) must be bit-exact
    vs the deferred-REDC VPU dot, for both tables."""
    import numpy as np
    import jax.numpy as jnp
    from certificate_stark_tpu.ops import field as F
    from certificate_stark_tpu.ops import rescue as R

    rng = np.random.default_rng(7)
    vals = rng.integers(0, F.P, size=(2, 14, 65), dtype=np.uint64)
    st = jnp.asarray(F.from_int(vals.astype(object)))
    for tbl in (R.MDS, R.INV_MDS):
        ref = F.mul_sum(jnp.asarray(tbl).reshape((4, 1, 14, 14, 1)),
                        st[:, :, None, :, :], axis=-2)
        got = R._mds_apply_mxu(st, tbl)
        assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_merge4_device_native_ref_agree():
    """Truncated-digest merge (ops/rescue.merge4 / native merge4 /
    rescue_ref.merge4) must agree; used by the rescue commitment trees."""
    import numpy as np
    import jax.numpy as jnp
    from certificate_stark_tpu.ops import field as F
    from certificate_stark_tpu.ops import rescue as R
    from certificate_stark_tpu.utils import rescue_ref as RR
    from certificate_stark_tpu.utils import native as NV

    rng = np.random.default_rng(21)
    d0 = rng.integers(0, F.P, size=(4, 3), dtype=np.uint64)
    d1 = rng.integers(0, F.P, size=(4, 3), dtype=np.uint64)
    got = F.to_int(np.asarray(R.merge4(jnp.asarray(F.from_int(d0)),
                                       jnp.asarray(F.from_int(d1)))))
    for col in range(3):
        exp = RR.merge4([int(v) for v in d0[:, col]],
                        [int(v) for v in d1[:, col]])
        assert [int(x) for x in got[:, col]] == [int(x) for x in exp]
        if NV.available():
            assert NV.merge4(tuple(d0[:, col]), tuple(d1[:, col])) == \
                tuple(int(x) for x in exp)
