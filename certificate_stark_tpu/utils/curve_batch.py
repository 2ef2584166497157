"""Batched (numpy-vectorized) Cheetah-f63 curve operations for witness
generation at scale: key derivation and Schnorr signing for whole transaction
batches at once, using the same projective kernels as the trace/constraints
(ops/ecc.py under the numpy facade).

The reference signs per-transaction with scalar Rust code (schnorr::sign,
src/lib.rs:440-448); at 1024 transactions the per-signature Python loop costs
minutes while this path costs seconds.
"""
from __future__ import annotations

import numpy as np

from ..engine.fieldops import NP
from ..ops import ecc as E, field as F
from . import curve as CV


def _gen12_arr(T):
    from ..params import curve_subfield_gen as G
    g = F.from_int(np.array(list(G.GX) + list(G.GY), dtype=object))[:, :, None]
    return np.broadcast_to(g, (4, 12, T))


def _b3_arr(T):
    b = F.from_int(np.array(CV.B3_LIMBS, dtype=object))[:, :, None]
    return np.broadcast_to(b, (4, 6, T))


def batch_mul_gen(scalars) -> np.ndarray:
    """[k_0..k_{T-1}] -> affine points [T][12 limbs] of k_i * G (MSB-first
    double-and-add with the shared trace formulas)."""
    T = len(scalars)
    nbits = max(int(k).bit_length() for k in scalars)
    bits = np.array([[(int(k) >> i) & 1 for k in scalars]
                     for i in range(nbits)], dtype=np.uint32)
    gen12 = _gen12_arr(T)
    b3 = _b3_arr(T)
    # projective identity-ish start (0 : 1 : 0), as in the trace
    st = np.zeros((4, 18, T), dtype=np.uint32)
    st[:, 6] = F.ONE_MONT[:, None]
    one = F.ONE_MONT.reshape(4, 1)
    for i in range(nbits - 1, -1, -1):
        st = E.compute_double(NP, st, b3)
        added = E.compute_add_mixed(NP, st, gen12, b3)
        sel = (bits[i][None, None, :] != 0)
        st = np.where(sel, added, st)
    zinv = E.f6_inv(NP, st[:, 12:18])
    x = E.f6_mul(NP, st[:, 0:6], zinv)
    y = E.f6_mul(NP, st[:, 6:12], zinv)
    aff = np.concatenate([x, y], axis=1)           # [4, 12, T]
    ints = F.to_int(aff)                            # object [12, T]
    return [[int(ints[j, t]) for j in range(12)] for t in range(T)]


def batch_pkeys(skeys):
    return batch_mul_gen(skeys)


def batch_sign(messages, skeys, rng):
    """Schnorr-sign a batch: returns [(r_x 6 limbs, s int)] per message."""
    T = len(messages)
    rs = [rng.randrange(1, CV.SCALAR_Q) for _ in range(T)]
    r_points = batch_mul_gen(rs)
    sigs = []
    for i in range(T):
        r_x = r_points[i][:6]
        h = CV.hash_message(r_x, messages[i])
        h_scalar = int.from_bytes(
            b"".join(int(x).to_bytes(8, "little") for x in h[:4]),
            "little") % CV.SCALAR_Q
        s = (rs[i] - skeys[i] * h_scalar) % CV.SCALAR_Q
        sigs.append((list(r_x), s))
    return sigs
