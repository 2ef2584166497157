"""Pallas TPU kernels for the f63 hot ops (prototype layer).

The jnp limb kernels in ops/field.py already vectorize well under XLA; the
Pallas layer exists to (a) pin hot chains (Montgomery multiply, Rescue round,
NTT butterflies) into VMEM-resident fused kernels, and (b) control tiling for
the 2^23-point LDE domain. Kernels fall back to interpret mode off-TPU, so the
suite validates them on CPU.

Scope after the round-4 fix-or-delete verdict: the fused Montgomery multiply
over tiled [4, N] arrays and the full 7-round Rescue permutation (state
resident in VMEM across all rounds — the XLA path round-trips the [4, 14, B]
state through HBM between fused regions). A local-NTT stage kernel was tried
and DELETED with evidence (see the deletion note below): NTT stays on the XLA
four-step/matmul path, which already hits its measured roofline share.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import field as F

BLK = 1024


import numpy as np

# kernel-local field helpers: Montgomery REDC with the modulus limbs as
# scalar literals — pallas kernels cannot capture constant ARRAYS, and
# F.mul/pow_const materialize NPRIME/P/ONE as np arrays. F.add/_cond_sub_p
# use only scalar literals and are safe to call directly.


def _k_mul_wide(a, b):
    """Pallas-safe variant of F._mul_wide_t: Mosaic rejects jnp.sum over
    unsigned ints ("Reductions over unsigned integers not implemented"), so
    the anti-diagonal column sums accumulate with an unrolled chain of
    elementwise adds instead of a stacked reduction."""
    prods = a[:, None] * b[None, :]               # [4, 4, *S]
    lo = prods & np.uint32(0xFFFF)
    hi = prods >> 16
    zero = jnp.zeros(prods.shape[2:], jnp.uint32)
    cols = [zero] * 8
    for i in range(4):
        for j in range(4):
            cols[i + j] = cols[i + j] + lo[i, j]
            cols[i + j + 1] = cols[i + j + 1] + hi[i, j]
    out = []
    carry = zero
    for k in range(8):
        s = cols[k] + carry
        carry = s >> 16
        out.append(s & np.uint32(0xFFFF))
    return out


def _k_mul(a, b):
    # structured-modulus REDC (F._redc): scalar literals only, pallas-safe
    t = _k_mul_wide(a, b)
    u = F._redc(t, jnp)
    return jnp.stack(F._cond_sub_p(u[:4]), axis=0)


def _k_pow(a, e: int):
    """Straight-line square-and-multiply (e > 0 static)."""
    r = a
    for bit in bin(e)[3:]:
        r = _k_mul(r, r)
        if bit == "1":
            r = _k_mul(r, a)
    return r


def _k_sumred(x):
    """Field-sum over axis -2 of [4, ..., n, blk] via tree halving.

    Folds the CONTIGUOUS top half onto the bottom half each step: stride-2
    slices ([..., 0::2, :]) lower to a >2D gather, which Mosaic rejects
    ("Only 2D gather is supported"); contiguous static slices lower to
    plain vector slices. Field addition is commutative+associative, so the
    pairing order does not change the sum."""
    while x.shape[-2] > 1:
        n = x.shape[-2]
        h = (n + 1) // 2
        lo, hi = x[..., :h, :], x[..., h:, :]
        if hi.shape[-2] < h:
            hi = jnp.concatenate(
                [hi, jnp.zeros(hi.shape[:-2] + (h - hi.shape[-2],)
                               + hi.shape[-1:], hi.dtype)], axis=-2)
        x = F.add(lo, hi)
    return x[..., 0, :]


def _mul_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = _k_mul(a_ref[...], b_ref[...])


RESCUE_BLK = 256


def _rescue_perm_kernel(state_ref, mds_ref, ark_ref, o_ref):
    """Full 7-round Rescue permutation on a [4, 14, blk] state block.

    MDS/ARK Montgomery tables arrive as kernel inputs (constant arrays can't
    be captured by pallas kernels). Rounds run as a fori_loop; the inverse
    s-box is the straight-line 62-bit square-and-multiply chain (compiled once
    inside the round body). Mirrors ops/rescue.apply_round exactly.
    """
    from ..params import data as D

    st0 = state_ref[...]                       # [4, 14, blk]
    mds = mds_ref[...]                         # [4, 14, 14]
    ark = ark_ref[...]                         # [4, 8, 28]
    blk = st0.shape[-1]

    def mds_apply(st):
        m = mds[:, :, :, None]                 # [4, 14, 14, 1]
        s = st[:, None, :, :]                  # [4, 1, 14, blk]
        prod = _k_mul(jnp.broadcast_to(m, (4, 14, 14, blk)),
                      jnp.broadcast_to(s, (4, 14, 14, blk)))
        return _k_sumred(prod)

    st = st0
    # rounds unrolled with STATIC ark slices: a traced fori_loop index made
    # the dynamic_slice on the 3D table lower to a >2D gather, which Mosaic
    # rejects ("Only 2D gather is supported")
    for r in range(7):
        st = _k_mul(st, _k_mul(st, st))        # s-box x^3
        st = mds_apply(st)
        st = F.add(st, jnp.broadcast_to(
            ark[:, r, :14].reshape(4, 14, 1), st.shape))
        st = _k_pow(st, D.INV_ALPHA)           # inverse s-box
        st = mds_apply(st)
        st = F.add(st, jnp.broadcast_to(
            ark[:, r, 14:].reshape(4, 14, 1), st.shape))
    o_ref[...] = st


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_rescue_permutation(state: jnp.ndarray, interpret: bool = False):
    """Rescue permutation of [4, 14, N] states, tiled over the lane axis."""
    from . import rescue as R

    n = state.shape[-1]
    assert state.shape[:2] == (4, 14)
    blk = min(n, RESCUE_BLK)
    assert n % blk == 0
    tbl_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        _rescue_perm_kernel,
        out_shape=jax.ShapeDtypeStruct(state.shape, state.dtype),
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((4, 14, blk), lambda i: (0, 0, i)),
                  tbl_spec((4, 14, 14)), tbl_spec((4, 8, 28))],
        out_specs=pl.BlockSpec((4, 14, blk), lambda i: (0, 0, i)),
        interpret=interpret,
    )(state, jnp.asarray(R.MDS), jnp.asarray(R.ARK))


# pallas_local_ntt DELETED (round 4, with data): the fused-stage radix-2
# kernel requires merging (m/ms, ms) sub-block axes into the lane axis each
# stage, and Mosaic rejects lane-merging reshapes outright ("Shape mismatch"
# at the final .reshape(4, blk_b, m)); avoiding it needs per-stage twiddle
# inputs whose 1- or 8-lane minor dims pad to 128 lanes (~10 MB VMEM at
# m=1024) or in-kernel transposes Mosaic also lacks. Meanwhile the XLA
# four-step path this kernel was meant to beat measures 2.60 ms at 2^20
# (scripts/tpu_tune_r4.json) with the local DFT-128 already on the MXU —
# there is no headroom a hand kernel can claim at the ~0.5-1 ms dispatch
# floor of the remote-tunnel runtime. Decision + evidence: DESIGN.md
# ("Pallas layer verdict").


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
