"""Quadratic/cubic extension-field arithmetic over f63 (towers in
params/extensions.py). Elements are limb arrays [4, d, *S] with the extension
coordinate axis after the limb axis.

These back the Quadratic/Cubic proof options: composition randomness, the OOD
point z, DEEP, and FRI move to the extension while the trace and constraint
evaluations stay base-field (see DESIGN.md). Multiplies batch their base
products into one stacked field multiply, like ops/ecc.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import field as F
from ..params import extensions as X


def _cat(parts):
    return jnp.concatenate(parts, axis=1)


def e2_mul(a, b):
    """(a0 + a1 x)(b0 + b1 x), x^2 = NR: [4, 2, *S] -> [4, 2, *S]."""
    a0, a1 = a[:, 0:1], a[:, 1:2]
    b0, b1 = b[:, 0:1], b[:, 1:2]
    prod = F.mul(_cat([a0, a1, F.add(a0, a1)]),
                 _cat([b0, b1, F.add(b0, b1)]))
    u, v, w = prod[:, 0:1], prod[:, 1:2], prod[:, 2:3]
    nr = F.broadcast_const(X.QUAD_NONRESIDUE, u.ndim - 1)
    c0 = F.add(u, F.mul(v, jnp.broadcast_to(nr, v.shape)))
    c1 = F.sub(F.sub(w, u), v)                 # a0b1 + a1b0
    return _cat([c0, c1])


def e3_mul(a, b):
    """(a0+a1x+a2x^2)(b0+b1x+b2x^2), x^3 = A1*x + A0: [4, 3, *S]."""
    a0, a1, a2 = a[:, 0:1], a[:, 1:2], a[:, 2:3]
    b0, b1, b2 = b[:, 0:1], b[:, 1:2], b[:, 2:3]
    # toom-like: 6 products
    prod = F.mul(
        _cat([a0, a1, a2, F.add(a0, a1), F.add(a1, a2), F.add(a0, a2)]),
        _cat([b0, b1, b2, F.add(b0, b1), F.add(b1, b2), F.add(b0, b2)]))
    v0, v1, v2 = prod[:, 0:1], prod[:, 1:2], prod[:, 2:3]
    v01, v12, v02 = prod[:, 3:4], prod[:, 4:5], prod[:, 5:6]
    c1p = F.sub(F.sub(v01, v0), v1)            # a0b1+a1b0
    c3 = F.sub(F.sub(v12, v1), v2)             # a1b2+a2b1
    c2p = F.add(F.sub(F.sub(v02, v0), v2), v1)  # a0b2+a2b0+a1b1
    c4 = v2
    # reduce: x^3 = A1 x + A0 ; x^4 = A1 x^2 + A0 x
    a1c = F.broadcast_const(X.CUBIC_A1, v0.ndim - 1)
    a0c = F.broadcast_const(X.CUBIC_A0, v0.ndim - 1)

    def smul(t, cst):
        return F.mul(t, jnp.broadcast_to(cst, t.shape))

    c0 = F.add(v0, smul(c3, a0c))
    c1 = F.add(F.add(c1p, smul(c3, a1c)), smul(c4, a0c))
    c2 = F.add(c2p, smul(c4, a1c))
    return _cat([c0, c1, c2])


def ext_mul(a, b, degree: int):
    if degree == 1:
        return F.mul(a, b)
    return e2_mul(a, b) if degree == 2 else e3_mul(a, b)


def ext_mul_sum(a, b, degree: int, axis: int, chunk: int = 1024):
    """Fused extension dot product: sum over `axis` of ext_mul(a, b) with one
    deferred Montgomery reduction per Karatsuba component (F.mul_sum) instead
    of one per term. a, b: [4, d, *S] broadcast-compatible; the extension axis
    is 1 and must not be the reduction axis."""
    assert axis not in (0, 1) and axis != -a.ndim and axis != 1 - a.ndim

    def dot(x, y):
        return F.dot_chunked(x, y, axis, chunk)

    if degree == 1:
        return dot(a, b)
    if degree == 2:
        a0, a1 = a[:, 0:1], a[:, 1:2]
        b0, b1 = b[:, 0:1], b[:, 1:2]
        u = dot(a0, b0)
        v = dot(a1, b1)
        w = dot(F.add(a0, a1), F.add(b0, b1))
        nr = F.broadcast_const(X.QUAD_NONRESIDUE, u.ndim - 1)
        c0 = F.add(u, F.mul(v, jnp.broadcast_to(nr, v.shape)))
        c1 = F.sub(F.sub(w, u), v)
        return _cat([c0, c1])
    a0, a1, a2 = a[:, 0:1], a[:, 1:2], a[:, 2:3]
    b0, b1, b2 = b[:, 0:1], b[:, 1:2], b[:, 2:3]
    v0, v1, v2 = dot(a0, b0), dot(a1, b1), dot(a2, b2)
    v01 = dot(F.add(a0, a1), F.add(b0, b1))
    v12 = dot(F.add(a1, a2), F.add(b1, b2))
    v02 = dot(F.add(a0, a2), F.add(b0, b2))
    c1p = F.sub(F.sub(v01, v0), v1)
    c3 = F.sub(F.sub(v12, v1), v2)
    c2p = F.add(F.sub(F.sub(v02, v0), v2), v1)
    c4 = v2
    a1c = F.broadcast_const(X.CUBIC_A1, v0.ndim - 1)
    a0c = F.broadcast_const(X.CUBIC_A0, v0.ndim - 1)

    def smul(t, cst):
        return F.mul(t, jnp.broadcast_to(cst, t.shape))

    c0 = F.add(v0, smul(c3, a0c))
    c1 = F.add(F.add(c1p, smul(c3, a1c)), smul(c4, a0c))
    c2 = F.add(c2p, smul(c4, a1c))
    return _cat([c0, c1, c2])


def base_to_ext(a, degree: int):
    """Embed base elements [4, *S] -> [4, d, *S] (zero high coords)."""
    if degree == 1:
        return a
    zeros = jnp.zeros_like(a[:, None])
    parts = [a[:, None]] + [zeros] * (degree - 1)
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# host (python-int) mirrors for the verifier / tests
# ---------------------------------------------------------------------------
def host_e2_mul(a, b):
    P = F.P
    return [(a[0] * b[0] + X.QUAD_NONRESIDUE * a[1] * b[1]) % P,
            (a[0] * b[1] + a[1] * b[0]) % P]


def host_e3_mul(a, b):
    P = F.P
    c = [0] * 5
    for i in range(3):
        for j in range(3):
            c[i + j] = (c[i + j] + a[i] * b[j]) % P
    # x^3 = A1 x + A0 ; x^4 = A1 x^2 + A0 x
    return [(c[0] + X.CUBIC_A0 * c[3]) % P,
            (c[1] + X.CUBIC_A1 * c[3] + X.CUBIC_A0 * c[4]) % P,
            (c[2] + X.CUBIC_A1 * c[4]) % P]


def host_ext_mul(a, b, degree):
    if degree == 1:
        return [(a[0] * b[0]) % F.P]
    return host_e2_mul(a, b) if degree == 2 else host_e3_mul(a, b)


def host_ext_inv(a, degree):
    """Inverse via a^(q^d - 2) is wasteful; use linear algebra over f63."""
    P = F.P
    if degree == 1:
        return [pow(a[0], P - 2, P)]
    # build multiplication matrix M where M @ x = a*x, solve M x = e0
    cols = []
    for i in range(degree):
        e = [0] * degree
        e[i] = 1
        cols.append(host_ext_mul(a, e, degree))
    # gaussian elimination mod P on [M | e0]
    m = [[cols[j][i] for j in range(degree)] for i in range(degree)]
    rhs = [1] + [0] * (degree - 1)
    for col in range(degree):
        piv = next(r for r in range(col, degree) if m[r][col] % P)
        m[col], m[piv] = m[piv], m[col]
        rhs[col], rhs[piv] = rhs[piv], rhs[col]
        inv = pow(m[col][col], P - 2, P)
        m[col] = [v * inv % P for v in m[col]]
        rhs[col] = rhs[col] * inv % P
        for r in range(degree):
            if r != col and m[r][col]:
                f = m[r][col]
                m[r] = [(m[r][j] - f * m[col][j]) % P for j in range(degree)]
                rhs[r] = (rhs[r] - f * rhs[col]) % P
    return rhs


# ---------------------------------------------------------------------------
# vectorized device helpers for the ext prover path (elements [4, d, *S])
# ---------------------------------------------------------------------------
def ext_inv_vec(a, degree: int, xp=jnp):
    """Vectorized extension inverse via Cramer's rule on the multiplication
    matrix (one base-field inversion chain + O(d^2) muls per element)."""
    if degree == 1:
        return F.inv(a, xp=xp)
    if degree == 2:
        a0, a1 = a[:, 0], a[:, 1]
        nr = F.broadcast_const(X.QUAD_NONRESIDUE, a0.ndim - 1)
        norm = F.sub(F.mul(a0, a0, xp),
                     F.mul(xp.broadcast_to(nr, a1.shape), F.mul(a1, a1, xp), xp), xp)
        t = F.inv(norm, xp=xp)
        return xp.stack([F.mul(a0, t, xp),
                         F.mul(F.neg(a1, xp), t, xp)], axis=1)
    # cubic x^3 = A1 x + A0: solve M(a) v = e0
    a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
    c1 = F.broadcast_const(X.CUBIC_A1, a0.ndim - 1)
    c0 = F.broadcast_const(X.CUBIC_A0, a0.ndim - 1)

    def cm(x, y):
        return F.mul(x, y, xp)

    def sc(cst, x):
        return F.mul(xp.broadcast_to(cst, x.shape), x, xp)

    m11 = F.add(a0, sc(c1, a2), xp)            # a0 + A1*a2
    m12 = sc(c0, a2)                            # A0*a2
    m13 = sc(c0, a1)                            # A0*a1
    m21 = a1
    m22 = m11
    m23 = F.add(m12, sc(c1, a1), xp)            # A0*a2 + A1*a1
    # M = [[a0, m12, m13], [a1, m22, m23], [a2, a1, m11]]
    # cofactors of column 0 (for solving M v = e0 -> v_i = C_{0i}/det)
    c00 = F.sub(cm(m22, m11), cm(m23, a1), xp)
    c01 = F.neg(F.sub(cm(a1, m11), cm(m23, a2), xp), xp)
    c02 = F.sub(cm(a1, a1), cm(m22, a2), xp)
    det = F.add(cm(a0, c00), F.add(cm(m12, c01), cm(m13, c02), xp), xp)
    dinv = F.inv(det, xp=xp)
    return xp.stack([cm(c00, dinv), cm(c01, dinv), cm(c02, dinv)], axis=1)


def ext_powers_dyn(z, count: int, degree: int, xp=jnp):
    """[z^0 .. z^(count-1)] for an ext scalar z [4, d] -> [4, d, count]."""
    one = np.zeros((4, degree, 1), dtype=np.uint32)
    one[:, 0, 0] = F.ONE_MONT
    tbl = xp.asarray(one)
    zz = z[:, :, None]
    cur = 1
    while cur < count:
        m = min(cur, count - cur)
        step = xp.broadcast_to(zz, (4, degree, m))
        nxt = ext_mul(tbl[:, :, :m], step, degree) if degree > 1 \
            else F.mul(tbl[:, :, :m], step, xp)
        tbl = xp.concatenate([tbl, nxt], axis=2)
        zz = ext_mul(zz, zz, degree) if degree > 1 else F.square(zz, xp)
        cur *= 2
    return tbl[:, :, :count]
