"""Pallas TPU kernels for the f63 hot ops (prototype layer).

The jnp limb kernels in ops/field.py already vectorize well under XLA; the
Pallas layer exists to (a) pin hot chains (Montgomery multiply, Rescue round,
NTT butterflies) into VMEM-resident fused kernels, and (b) control tiling for
the 2^23-point LDE domain. Kernels fall back to interpret mode off-TPU, so the
suite validates them on CPU.

Round-1 scope: the fused Montgomery multiply over tiled [4, N] arrays; the
Rescue round / NTT-stage kernels follow the same pattern (next round).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import field as F

BLK = 1024


def _mul_kernel(a_ref, b_ref, o_ref):
    # Montgomery REDC with the modulus limbs as scalar literals (pallas
    # kernels cannot capture constant arrays)
    import numpy as np

    a = a_ref[...]
    b = b_ref[...]
    np_l = [np.uint32(int(x)) for x in F.NPRIME_LIMBS]
    p_l = [np.uint32(int(x)) for x in F.P_LIMBS]
    t = F._mul_wide_t(a, b, jnp)
    m, _ = F._mul_wide([t[i] for i in range(4)], np_l, 4)
    mp, _ = F._mul_wide(m, p_l, 8)
    carry = np.uint32(0)
    out = []
    for k in range(8):
        s = t[k] + mp[k] + carry
        carry = s >> 16
        if k >= 4:
            out.append(s & F.MASK16)
    o_ref[...] = jnp.stack(F._cond_sub_p(out), axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mul(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Montgomery multiply of [4, N] limb arrays as a tiled Pallas kernel."""
    n = a.shape[-1]
    assert n % BLK == 0 or n < BLK
    blk = min(n, BLK)
    grid = (n // blk,)
    spec = pl.BlockSpec((4, blk), lambda i: (0, i))
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a, b)
