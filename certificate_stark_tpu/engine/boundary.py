"""Boundary (assertion) constraint machinery shared by prover and verifier.

Supports the three winterfell assertion kinds used by the reference
(Assertion::single/periodic/sequence, e.g. src/schnorr/air.rs:111-227):

  single   (col, step, v):        numer = T_col - v,    Z = x - g^step
  periodic (col, first, T, v):    numer = T_col - v,    Z = x^m - g^(first*m)
  sequence (col, first, T, vals): numer = T_col - B(x), Z = x^m - g^(first*m)

with m = n/T and B(x) = q(x * g^-first) where q interpolates vals over the
size-m subgroup. Assertions sharing a divisor form one group with one
precomputed inverse-divisor table and one degree adjustment.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops import field as F
from ..utils import poly_host as PH
from .air import Assertion, SequenceAssertion


@dataclass
class BoundaryGroup:
    key: tuple
    columns: np.ndarray          # int32 [g]
    b_evals: np.ndarray          # [4, g, bn] value-poly evals on the domain
                                 # (compact mode: [4, g, 1] when all values
                                 # are constants over the domain)
    inv_z: np.ndarray            # [4, bn]; compact mode: None for single-
                                 # step divisors (computed in-graph) and the
                                 # UNTILED [4, period] block for periodic
                                 # ones (tile on demand)
    adj: int
    # host-side data for the verifier
    assertions: list = None


def _divisor_inv(n, bn, offset, g_trace, m, first, xs, tile=True):
    """1/(x^m - c) on the LDE domain, exploiting the period bn/m of x^m.
    tile=False returns only the [4, period] base block."""
    c = pow(g_trace, first * m, F.P)
    w = PH.root_of_unity(bn)
    wm = pow(w, m, F.P)
    o_m = pow(offset, m, F.P)
    period = bn // m if m <= bn else 1
    # x_j^m = o^m * wm^j has period `period` in j
    from ..utils import native as NAT
    if NAT.available() and period >= 64:
        pts = F.mul_const(F.np_powers(wm, period), F.np_const(o_m), np)
        cc = np.broadcast_to(F.np_const(c).reshape(4, 1), (4, period))
        arr = F.unpack_u64(NAT.batch_inv(F.pack_u64(F.sub(pts, cc, np))))
    else:
        vals = []
        cur = o_m
        for _ in range(period):
            vals.append(pow((cur - c) % F.P, F.P - 2, F.P))
            cur = cur * wm % F.P
        arr = F.from_int(np.array(vals, dtype=object))
    return np.tile(arr, bn // period) if tile else arr


def _single_inv(bn, g_trace, step, xs):
    pt = np.broadcast_to(F.np_const(pow(g_trace, step, F.P)).reshape(4, 1), (4, bn))
    diff = F.sub(xs, pt, np)
    from ..utils import native as NAT
    if NAT.available():                      # batch inversion: 3 muls/elt
        return F.unpack_u64(NAT.batch_inv(F.pack_u64(diff)))
    return F.inv(diff, xp=np)


def _sequence_evals(n, bn, offset, g_trace, first, T, values):
    """B(x) evaluations on the LDE domain (host ints -> limb array [4, bn])."""
    m = n // T
    q = PH.intt([int(v) % F.P for v in values])
    assert len(q) == m
    # B(x) = q(x * g^-first): evaluate q on the coset (offset * g^-first)*<w_bn>
    shift = offset * pow(pow(g_trace, first, F.P), F.P - 2, F.P) % F.P
    # evals at shift*w^j: since q has m coeffs, values have period bn... full
    # NTT. The shift is folded into the coefficients (scaled by shift^i), so a
    # plain size-bn NTT of the padded coefficients yields q(shift * w_bn^j).
    from ..utils import native as NAT
    if NAT.available():
        cf = F.pack_u64(F.from_int(np.array(q, dtype=object)).reshape(4, 1, m))
        return F.unpack_u64(NAT.coeffs_lde_batch(cf, bn // m, shift)[0])
    scaled = [c * pow(shift, i, F.P) % F.P for i, c in enumerate(q)]
    ext = PH.ntt(scaled + [0] * (bn - m))
    return F.from_int(np.array(ext, dtype=object))


def group_assertions(assertions, n):
    groups = {}
    for a in assertions:
        if isinstance(a, Assertion):
            key = ("s", a.step)
        else:
            key = ("p", a.first_step, a.period)
        groups.setdefault(key, []).append(a)
    return groups


def quotient_degree(key, n):
    if key[0] == "s":
        return n - 2
    m = n // key[2]
    return n - 1 - m


# divisor-inverse tables depend only on the assertion *structure* (divisor),
# never on public-input values, so they are shared across prover instances
_INVZ_CACHE = {}


def _invz_for(key, n, bn, offset, g_trace, xs, compact=False):
    ck = (key, n, bn, offset, compact)
    r = _INVZ_CACHE.get(ck)
    if r is None:
        if key[0] == "s":
            # compact mode: single-step divisors invert in-graph per chunk
            # (prover packed path) — the full-domain host inversion at
            # bn = 2^23 is minutes of numpy Fermat chains without the
            # native batch_inv (part of the round-4 untracked host gap)
            r = None if compact else _single_inv(bn, g_trace, key[1], xs)
        else:
            m = n // key[2]
            r = _divisor_inv(n, bn, offset, g_trace, m, key[1], xs,
                             tile=not compact)
        _INVZ_CACHE[ck] = r
    return r


def build_boundary_tables(assertions, n, bn, blowup, offset, g_trace,
                          comp_deg, xs, compact=False):
    """Precompute per-group tables (host numpy).

    compact=True (the prover's packed-LDE mode) avoids every full-domain
    array: constant value evals stay [4, g, 1], single-step divisor
    inverses are deferred to the in-graph per-chunk computation (inv_z
    None), periodic divisor inverses keep only their base period block."""
    out = []
    for key, group in group_assertions(assertions, n).items():
        cols = np.array([a.column for a in group], dtype=np.int32)
        seq = any(isinstance(a, SequenceAssertion) for a in group)
        evs = []
        for a in group:
            if isinstance(a, SequenceAssertion):
                evs.append(_sequence_evals(n, bn, offset, g_trace,
                                           a.first_step, a.period, a.values))
            else:
                width = 1 if (compact and not seq) else bn
                evs.append(np.broadcast_to(
                    F.np_const(a.value % F.P).reshape(4, 1), (4, width)))
        b_evals = np.stack(evs, axis=1)  # [4, g, bn] (or [4, g, 1] compact)
        inv_z = _invz_for(key, n, bn, offset, g_trace, xs, compact=compact)
        out.append(BoundaryGroup(key=key, columns=cols, b_evals=b_evals,
                                 inv_z=inv_z,
                                 adj=comp_deg - quotient_degree(key, n),
                                 assertions=group))
    return out


# ---------------------------------------------------------------------------
# host-side (verifier) evaluation at the OOD point z
# ---------------------------------------------------------------------------
def verify_boundary_at(assertions, n, g_trace, z, comp_deg, ood_row, coeffs):
    """Sum of boundary composition terms at z. coeffs: [(alpha, beta)] aligned
    with `assertions` order."""
    total = 0
    groups = group_assertions(assertions, n)
    flat = [a for g in groups.values() for a in g]
    # coefficient lookup by identity/order: caller aligns coeffs with the
    # original assertion order
    cmap = {id(a): c for a, c in zip(assertions, coeffs)}
    for key, group in groups.items():
        if key[0] == "s":
            zden = (z - pow(g_trace, key[1], F.P)) % F.P
        else:
            m = n // key[2]
            zden = (pow(z, m, F.P) - pow(g_trace, key[1] * m, F.P)) % F.P
        inv = pow(zden, F.P - 2, F.P)
        adj = comp_deg - quotient_degree(key, n)
        zadj = pow(z, adj, F.P)
        for a in group:
            alpha, beta = cmap[id(a)]
            if isinstance(a, SequenceAssertion):
                m = n // a.period
                q = PH.intt([int(v) % F.P for v in a.values])
                y = z * pow(pow(g_trace, a.first_step, F.P), F.P - 2, F.P) % F.P
                bval = PH.eval_poly(q, y)
            else:
                bval = a.value % F.P
            qv = (ood_row[a.column] - bval) * inv % F.P
            total = (total + qv * (alpha + beta * zadj)) % F.P
    return total
