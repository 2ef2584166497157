"""Distributed six-step NTT over a device mesh.

The 2^23-point LDE transforms of the north-star workload exceed single-chip
comfort; the classic six-step factorization N = n1*n2 turns one large NTT into
local small NTTs + twiddle scaling + transposes, and on a mesh the transposes
become `all_to_all` collectives over ICI (SURVEY.md §2c / §7 step 6):

    view x[i1, i2] (i1 = n1 rows, sharded);  X[k2*n1 + k1] =
      DFT_n2( twiddle[i2,k1] * DFT_n1(x[:, i2])[k1] )[k2]

Layout contract: flat coefficient arrays [4, B, N] sharded in contiguous
blocks of the last axis; the result (natural evaluation order) has the same
sharding. Three all_to_alls per transform.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import field as F, ntt as NTT
from ..utils import poly_host as PH


def _twiddle_matrix(n1: int, n2: int, inverse: bool) -> np.ndarray:
    """w^(i2*k1) table [4, n2, n1] (Montgomery limbs, host-built)."""
    w = PH.root_of_unity(n1 * n2)
    if inverse:
        w = pow(w, F.P - 2, F.P)
    col = F.np_powers(w, n2)                      # [4, n2] : w^(i2)
    # row i2 = (w^(i2))^(k1) — build by per-row powers (vectorized doubling)
    out = np.empty((4, n2, n1), dtype=np.uint32)
    ones = np.broadcast_to(F.ONE_MONT.reshape(4, 1), (4, n2)).copy()
    cur = ones
    base = col
    # out[:, :, k1] = w^(i2*k1): iterate k1 with running product
    for k1 in range(n1):
        out[:, :, k1] = cur
        cur = F.mul(cur, base, np)
    return out


def ntt_sharded(mesh: Mesh, n_devices: int, n: int, batch_shape=(),
                inverse: bool = False, axis: str = "domain"):
    """Build a jitted distributed NTT: [4, *batch, n] -> same, both sharded in
    contiguous blocks of the last axis across `axis`."""
    dev = n_devices
    # choose n1 divisible by dev^2 constraints: n1 rows sharded, n2 cols sharded
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    assert n1 % dev == 0 and n2 % dev == 0, (n1, n2, dev)
    tw = _twiddle_matrix(n1, n2, inverse)         # [4, n2, n1]
    # per-device i2 slices: device d needs tw[:, d*n2/D:(d+1)*n2/D, :]
    tw_sh = tw.reshape(4, dev, n2 // dev, n1).transpose(1, 0, 2, 3)  # [D,4,n2/D,n1]
    nb = len(batch_shape)
    spec_data = P(*([None] * (nb + 1) + [axis]))
    spec_tw = P(axis)

    def body(x_loc, tw_loc):
        # x_loc [4, *B, n/D] = rows i1 slice; view [4, *B, n1/D, n2]
        x = x_loc.reshape(x_loc.shape[:-1] + (n1 // dev, n2))
        # transpose to i2-sharding
        y = jax.lax.all_to_all(x, axis, split_axis=nb + 2, concat_axis=nb + 1,
                               tiled=True)        # [4, *B, n1, n2/D]
        y = jnp.swapaxes(y, -1, -2)               # [4, *B, n2/D, n1]
        y = NTT.ntt(y, inverse=inverse)           # DFT_n1 over last axis
        twl = tw_loc[0].reshape((4,) + (1,) * nb + (n2 // dev, n1))
        y = F.mul(y, jnp.broadcast_to(twl, y.shape))
        # transpose to k1-sharding
        z = jax.lax.all_to_all(y, axis, split_axis=nb + 2, concat_axis=nb + 1,
                               tiled=True)        # [4, *B, n2, n1/D]
        z = jnp.swapaxes(z, -1, -2)               # [4, *B, n1/D, n2]
        z = NTT.ntt(z, inverse=inverse)           # DFT_n2 over last axis
        if inverse:
            # our NTT.intt scales by 1/len per stage-transform; combined scale
            # is 1/(n1*n2) as required, nothing further to do
            pass
        # output: X[k2*n1 + k1]; currently [k1/D, k2] — transpose to k2-major
        u = jax.lax.all_to_all(z, axis, split_axis=nb + 2, concat_axis=nb + 1,
                               tiled=True)        # [4, *B, n1, n2/D]
        u = jnp.swapaxes(u, -1, -2)               # [4, *B, n2/D, n1]
        return u.reshape(u.shape[:-2] + (n2 // dev * n1,))

    # note: tw_loc arrives as [1, 4, n2/D... wait sharded over first axis ->
    # local [1, 4, n2, n1/D]? see spec below: we pre-split by device instead.
    fn = shard_map(body, mesh=mesh, in_specs=(spec_data, spec_tw),
                   out_specs=spec_data, check_rep=False)

    def run(arr):
        return fn(arr, jnp.asarray(tw_sh))

    return jax.jit(run)
