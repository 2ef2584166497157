"""Rescue-Prime (Rescue-XLIX) over f63 as batched JAX limb kernels.

Functional parity with the reference hash (src/utils/rescue.rs): STATE_WIDTH=14,
RATE=7, DIGEST=7, 7 rounds, alpha=3, INV_ALPHA=3146514939656186539, hash cycle 8
(8th ARK row all-zero), sponge without padding (rescue.rs:93,123 TODO upstream),
`merge` concatenating two digests across the full state (rescue.rs:143-152).

TPU design: a batch of states is a limb array [4, 14, B] (B = lanes axis); the
s-box is 2 field muls, the inverse s-box a 63-step fori_loop power, and the MDS
layer a broadcasted mul + log-tree reduction. Everything fuses under jit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from . import ntt as NTT
from ..params import data as D

STATE_WIDTH = 14
RATE_WIDTH = 7
DIGEST_SIZE = 7
NUM_ROUNDS = 7
CYCLE_LENGTH = 8
INV_ALPHA = D.INV_ALPHA

# Montgomery-form constant tables
MDS = np.stack([F.from_int(np.array(D.RESCUE_MDS, dtype=object).reshape(14, 14))])[0]      # [4,14,14]
INV_MDS = np.stack([F.from_int(np.array(D.RESCUE_INV_MDS, dtype=object).reshape(14, 14))])[0]
ARK = F.from_int(np.array(D.RESCUE_ARK, dtype=object))  # [4, 8, 28]


def sbox(state, xp=jnp):
    """x -> x^3 elementwise."""
    return F.mul(state, F.square(state, xp), xp)


def inv_sbox(state, xp=jnp):
    """x -> x^(1/3) elementwise (exponent INV_ALPHA)."""
    return F.pow_const(state, INV_ALPHA, xp=xp)


def mds_apply(state, mds_table=None, xp=jnp):
    """MDS matrix-vector product. state: [4, ..., 14, B] -> same shape.

    mds[i] = sum_j MDS[i][j] * state[j].
    """
    if mds_table is None:
        mds_table = MDS
    lead = state.ndim - 3  # extra axes between limbs and the (14, B) tail
    m = xp.asarray(mds_table).reshape((4,) + (1,) * lead + (14, 14, 1))
    s = state[..., None, :, :]  # [4, ..., 1, 14, B]
    # fused dot: one deferred Montgomery reduction per output element instead
    # of 14 (F.mul_sum) — the MDS layer dominates Rescue constraint evaluation
    return F.mul_sum(m, s, axis=-2, xp=xp)


def add_ark(state, round_idx, half, xp=jnp):
    """Add round constants; half=0 first 14, half=1 last 14. Static round."""
    ark = xp.asarray(ARK[:, round_idx, half * 14:(half + 1) * 14])
    lead = state.ndim - 3
    ark = ark.reshape((4,) + (1,) * lead + (14, 1))
    return F.add(state, xp.broadcast_to(ark, state.shape), xp)


def _add_ark_dyn(state, ark_row):
    """Add a (possibly traced-index) ARK row [4, 14] to state [4, ..., 14, B]."""
    lead = state.ndim - 3
    ark = ark_row.reshape((4,) + (1,) * lead + (14, 1))
    return F.add(state, jnp.broadcast_to(ark, state.shape))


def apply_round(state, round_idx: int, xp=jnp):
    """One Rescue round (reference rescue.rs:246-263)."""
    state = sbox(state, xp)
    state = mds_apply(state, xp=xp)
    state = add_ark(state, round_idx % CYCLE_LENGTH, 0, xp)
    state = inv_sbox(state, xp)
    state = mds_apply(state, xp=xp)
    state = add_ark(state, round_idx % CYCLE_LENGTH, 1, xp)
    return state


def permutation(state):
    """Full 7-round permutation as a fori_loop (one compiled round body —
    keeps kernel graphs small enough for fast XLA compiles)."""
    ark_tbl = jnp.asarray(ARK)  # [4, 8, 28]

    def body(r, st):
        st = sbox(st)
        st = mds_apply(st)
        st = _add_ark_dyn(st, ark_tbl[:, r, :14])
        st = inv_sbox(st)
        st = mds_apply(st)
        st = _add_ark_dyn(st, ark_tbl[:, r, 14:])
        return st

    return jax.lax.fori_loop(0, NUM_ROUNDS, body, state)


def digest(elements):
    """Sponge digest of [4, k, B] element columns -> [4, 7, B].

    Absorbs rate-width chunks with addition, permuting after each full chunk and
    once more for a trailing partial chunk (no padding, matching the reference).
    """
    k = elements.shape[1]
    b = elements.shape[2:]
    state = jnp.zeros((4, STATE_WIDTH) + b, dtype=jnp.uint32)
    i = 0
    while i < k:
        chunk = elements[:, i:i + RATE_WIDTH]
        c = chunk.shape[1]
        state = state.at[:, :c].set(F.add(state[:, :c], chunk))
        state = permutation(state)
        i += RATE_WIDTH
    return state[:, :DIGEST_SIZE]


def merge(d0, d1):
    """2-to-1 merge of digests [4, 7, B] -> [4, 7, B] (reference rescue.rs:143-152)."""
    state = jnp.concatenate([d0, d1], axis=1)
    state = permutation(state)
    return state[:, :DIGEST_SIZE]


merge_jit = jax.jit(merge)
digest_jit = jax.jit(digest)
