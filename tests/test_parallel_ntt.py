"""Distributed six-step NTT (shard_map + all_to_all) vs single-device NTT."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from certificate_stark_tpu.ops import field as F, ntt as NTT
from certificate_stark_tpu.parallel import ntt as PN


def test_sharded_ntt_matches_and_roundtrips():
    mesh = Mesh(np.array(jax.devices()[:8]), ("domain",))
    n = 512
    rng = np.random.default_rng(1)
    vals = rng.integers(0, F.P, size=(2, n), dtype=np.uint64)
    arr = jnp.asarray(F.from_int(vals))
    ref = np.asarray(NTT.ntt(arr))
    fwd = PN.ntt_sharded(mesh, 8, n, batch_shape=(2,))
    inv = PN.ntt_sharded(mesh, 8, n, batch_shape=(2,), inverse=True)
    with mesh:
        got = fwd(arr)
        back = np.asarray(inv(got))
    assert np.array_equal(ref, np.asarray(got))
    assert np.array_equal(back, np.asarray(arr))
