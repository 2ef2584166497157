"""Vectorized fp6 / Cheetah-curve ops for constraint evaluation (generic over
the fx field facade; data layout [..., coord, B] with the fp6-coordinate axis
second-to-last).

The fp6 multiply batches all 18 base-field products of its six Karatsuba fp2
multiplies into ONE stacked field multiply, keeping kernel graphs small: an
fp6 mul is 1 mul instance + ~25 add/sub instances.

Formulas mirror reference src/utils/ecc.rs (fp2 = fp[u]/(u^2-2u-2),
fp6 = fp2[v]/(v^3+v+1); RCB-style complete addition for y^2 = x^3 + x + b).
"""
from __future__ import annotations

import jax.numpy as jnp


def _cat(parts, fx=None):
    xp = fx.xp if fx is not None else jnp
    return xp.concatenate(parts, axis=-2)


def f6_add(fx, a, b):
    return fx.add(a, b)


def f6_sub(fx, a, b):
    return fx.sub(a, b)


def f6_double(fx, a):
    return fx.add(a, a)


# --- fast fp6 multiply (limb facades) ---------------------------------------
# Operand assembly and result reconstruction are LINEAR in the inputs /
# partial products, so instead of ~45 single-row slice/concat/add ops (which
# dominate runtime: per-op overhead + copies) the fast path uses two gathers +
# one select per side, one big 18-row multiply, and ONE deferred-REDC dot
# against a constant 6x18 integer matrix. Bit-identical to the generic path.
# reconstruction: out rows (c0_0,c0_1,c1_0,c1_1,c2_0,c2_1); prod rows in
# BLOCK order (u_0..u_5, v_0..v_5, w_0..w_5); e0(k)=u+2v, e1(k)=u+3v+w;
# c0 = e(0)+e(1)+e(2)-e(5); c1 = e(3)-e(5)-e(0); c2 = e(4)-e(0)+e(1)-2e(2)
_PAIR_SIGNS = [  # per out-coefficient: {pair index: sign multiplier}
    {0: 1, 1: 1, 2: 1, 5: -1},       # c0
    {3: 1, 5: -1, 0: -1},            # c1
    {4: 1, 0: -1, 1: 1, 2: -2},      # c2
]
_E_COEF = [(1, 2, 0), (1, 3, 1)]     # e_j over (u, v, w)
_RECON_CACHE = {}


def _recon_matrix():
    """Constant 6x18 Montgomery matrix M with out = REDC-dot(M, prod)."""
    if "m" not in _RECON_CACHE:
        import numpy as _np
        from . import field as F
        m = _np.zeros((6, 18), dtype=object)
        for ci, signs in enumerate(_PAIR_SIGNS):
            for j in (0, 1):
                r = 2 * ci + j
                for k, s in signs.items():
                    for t in range(3):
                        m[r, 6 * t + k] += s * _E_COEF[j][t]
        m %= F.P
        _RECON_CACHE["m"] = F.from_int(m)            # [4, 6, 18]
    return _RECON_CACHE["m"]


def _f6_mul_fast(fx, a, b):
    # all row selections are contiguous or stride-2 slices (XLA-cheap; no
    # gathers — gather ops defeat fusion and are ~15x slower on CPU)
    from . import field as F
    xp = fx.xp

    def blocks(x):
        # [.., 6, B] -> (u0s, u1s): per-pair first/second fp2 coords,
        # pairs = (a0, a1, a2, a0+a1, a0+a2, a1+a2)
        s01 = F.add(x[..., 0:2, :], x[..., 2:4, :], xp)          # a0+a1
        c2 = x[..., 4:6, :]
        s02_12 = F.add(x[..., 0:4, :],
                       xp.concatenate([c2, c2], axis=-2), xp)    # a0+a2, a1+a2
        six = xp.concatenate([x[..., 0:6, :], s01, s02_12], axis=-2)  # 12 rows
        return six[..., 0::2, :], six[..., 1::2, :]  # u0s, u1s [.., 6, B]

    a0s, a1s = blocks(a)
    b0s, b1s = blocks(b)
    ls = xp.concatenate([a0s, a1s, F.sub(a0s, a1s, xp)], axis=-2)
    rs = xp.concatenate([b0s, b1s, F.sub(b1s, b0s, xp)], axis=-2)
    prod = F.mul(ls, rs, xp)                         # [4, .., 18, B]
    m = xp.asarray(_recon_matrix())
    m = m.reshape((4,) + (1,) * (prod.ndim - 3) + (6, 18, 1))
    return F.mul_sum(m, prod[..., None, :, :], axis=-2, xp=xp)


def f6_mul(fx, a, b):
    """fp6 multiply: a, b [..., 6, B] -> [..., 6, B]."""
    if getattr(fx, "fast_f6", False):
        return _f6_mul_fast(fx, a, b)
    a0, a1, a2 = a[..., 0:2, :], a[..., 2:4, :], a[..., 4:6, :]
    b0, b1, b2 = b[..., 0:2, :], b[..., 2:4, :], b[..., 4:6, :]
    pairs = [(a0, b0), (a1, b1), (a2, b2),
             (fx.add(a0, a1), fx.add(b0, b1)),
             (fx.add(a0, a2), fx.add(b0, b2)),
             (fx.add(a1, a2), fx.add(b1, b2))]
    ls, rs = [], []
    for x, y in pairs:
        x0, x1 = x[..., 0:1, :], x[..., 1:2, :]
        y0, y1 = y[..., 0:1, :], y[..., 1:2, :]
        ls += [x0, x1, fx.sub(x0, x1)]
        rs += [y0, y1, fx.sub(y1, y0)]
    prod = fx.mul(_cat(ls, fx), _cat(rs, fx))  # [..., 18, B]

    def fp2(k):
        u = prod[..., 3 * k:3 * k + 1, :]
        v = prod[..., 3 * k + 1:3 * k + 2, :]
        w = prod[..., 3 * k + 2:3 * k + 3, :]
        c0 = fx.add(u, fx.add(v, v))
        c1 = fx.add(fx.add(v, c0), w)
        return _cat([c0, c1], fx)

    aa, bb, cc, ab, ac, bc = (fp2(k) for k in range(6))
    tmp = fx.add(fx.add(aa, bb), cc)
    c0 = fx.sub(tmp, bc)
    c1 = fx.sub(fx.sub(ab, bc), aa)
    c2 = fx.add(fx.sub(fx.sub(ac, tmp), cc), fx.add(bb, bb))
    return _cat([c0, c1, c2], fx)


def f6_square(fx, a):
    return f6_mul(fx, a, a)


def f2_mul(fx, a, b):
    """fp2 multiply on [..., 2, B] (u^2 = 2u + 2)."""
    a0, a1 = a[..., 0:1, :], a[..., 1:2, :]
    b0, b1 = b[..., 0:1, :], b[..., 1:2, :]
    prod = fx.mul(_cat([a0, a1, fx.sub(a0, a1)], fx),
                  _cat([b0, b1, fx.sub(b1, b0)], fx))
    u, v, w = prod[..., 0:1, :], prod[..., 1:2, :], prod[..., 2:3, :]
    c0 = fx.add(u, fx.add(v, v))
    return _cat([c0, fx.add(fx.add(v, c0), w)], fx)


def f2_inv(fx, a):
    """fp2 inverse via the conjugate norm (ecc.rs:442-446)."""
    a0, a1 = a[..., 0:1, :], a[..., 1:2, :]
    norm = fx.sub(fx.add(fx.mul(a0, a0), fx.add(fx.mul(a0, a1), fx.mul(a0, a1))),
                  fx.double(fx.mul(a1, a1)))
    t = fx.inv(norm)
    c0 = fx.mul(fx.add(a0, fx.double(a1)), t)
    c1 = fx.neg(fx.mul(a1, t))
    return _cat([c0, c1], fx)


def f6_inv(fx, a):
    """fp6 inverse (reference invert_fp6 sequence, ecc.rs:551-591)."""
    c0_, c1_, c2_ = a[..., 0:2, :], a[..., 2:4, :], a[..., 4:6, :]
    m = lambda u, v: f2_mul(fx, u, v)
    ad = lambda u, v: fx.add(u, v)
    sb = lambda u, v: fx.sub(u, v)
    dbl = fx.double

    c0_sq = m(c0_, c0_)
    c1_sq = m(c1_, c1_)
    c2_sq = m(c2_, c2_)
    t = m(c0_, ad(c0_sq, c1_sq))
    t = sb(t, m(c1_, c1_sq))
    tmp = ad(c0_, sb(c2_, c1_))
    t = ad(t, m(tmp, c2_sq))
    tmp = ad(dbl(c0_), c0_)
    tmp = m(tmp, c1_)
    tmp = sb(dbl(c0_sq), tmp)
    tmp = m(tmp, c2_)
    t = sb(t, tmp)
    t = f2_inv(fx, t)

    r0 = ad(ad(c0_sq, c1_sq), c2_sq)
    tmp = sb(dbl(c0_), c1_)
    tmp = m(tmp, c2_)
    r0 = m(sb(r0, tmp), t)
    r1 = fx.neg(m(ad(m(c0_, c1_), c2_sq), t))
    r2 = m(ad(sb(c1_sq, m(c0_, c2_)), c2_sq), t)
    return _cat([r0, r1, r2], fx)


def _is_scalar_const(b3) -> bool:
    """Static host check: b3 is a concrete constant whose fp6 coords 1..5 are
    all zero (true for the default subfield-curve instance, b = B0 in F_p —
    see utils/curve.py B3_LIMBS). Constants are concrete arrays even inside
    jit traces, so this never inspects traced values."""
    import numpy as _np
    try:
        arr = _np.asarray(b3)
    except Exception:  # noqa: BLE001  (traced value: be conservative)
        return False
    if arr.dtype == object:                      # HostExtOps tuple elements
        flat = arr.reshape(-1)
        return all(all(int(c) == 0 for c in t) for t in flat[len(flat) // 6:])
    if hasattr(b3, "aval") and not hasattr(b3, "__array__"):
        return False
    return not _coords(arr, 1, 6).any()          # limb array [4, ..., 6, B]


def _coords(arr, lo, hi):
    """Slice the fp6-coordinate axis (second-to-last) of a limb array."""
    sl = [slice(None)] * arr.ndim
    sl[-2] = slice(lo, hi)
    return arr[tuple(sl)]


def _is_fp2_const(b3) -> bool:
    """Static host check: b3 is a concrete numeric limb array [4, 6, ...]
    whose fp6 coords 2..5 are zero (true for the default fp2-curve instance,
    b = 5 + 29u — utils/curve.py). Like _is_scalar_const, never inspects
    traced values."""
    import numpy as _np
    try:
        arr = _np.asarray(b3)
    except Exception:  # noqa: BLE001
        return False
    if arr.dtype == object or (hasattr(b3, "aval")
                               and not hasattr(b3, "__array__")):
        return False
    return not _coords(arr, 2, 6).any()


def _mul_b3(fx, b3, t):
    """b3 * t in fp6. When b3 is a base-subfield scalar (coords 1..5 zero)
    this is 6 base multiplies; when it is an fp2 scalar (coords 2..5 zero,
    the reference-strength b=5+29u instance) it is 9 base multiplies (three
    fp2 muls, one per fp6 coordinate); else the 18-multiply karatsuba."""
    if _is_scalar_const(b3):
        c = b3[..., 0:1, :]
        extra = t.ndim - c.ndim          # align ranks (t may carry extra
        if extra > 0:                    # stacked batch axes)
            c = c.reshape(c.shape[:1] + (1,) * extra + c.shape[1:])
        return fx.mul(t, c)
    if _is_fp2_const(b3):
        import numpy as _np
        from . import field as F
        xp = fx.xp
        # constant rows [s0 x3, s1 x3, (s1-s0) x3]; reference fp2 mul
        # (ecc.rs:424-439): c0 = u + 2v, c1 = v + c0 + w with u = x0*s0,
        # v = x1*s1, w = (x0-x1)(s1-s0)
        arr = _np.asarray(b3)            # [4, ..., 6, B] broadcast constant
        s0 = int(F.to_int(
            _coords(arr, 0, 1).reshape(4, -1)[:, :1]).reshape(-1)[0])
        s1 = int(F.to_int(
            _coords(arr, 1, 2).reshape(4, -1)[:, :1]).reshape(-1)[0])
        d = (s1 - s0) % F.P
        rhs = F.from_int(_np.array(
            [s0] * 3 + [s1] * 3 + [d] * 3, dtype=object))[..., None]  # [4,9,1]
        extra = t.ndim - rhs.ndim
        if extra > 0:
            rhs = rhs.reshape(rhs.shape[:1] + (1,) * extra + rhs.shape[1:])
        x0 = t[..., 0::2, :]
        x1 = t[..., 1::2, :]
        lhs = xp.concatenate([x0, x1, fx.sub(x0, x1)], axis=-2)
        prod = fx.mul(lhs, xp.asarray(rhs))
        u = prod[..., 0:3, :]
        v = prod[..., 3:6, :]
        w = prod[..., 6:9, :]
        c0 = fx.add(u, fx.add(v, v))
        c1 = fx.add(fx.add(v, c0), w)
        out = xp.stack([c0, c1], axis=-2)    # [..., 3, 2, B] pair-major
        return out.reshape(out.shape[:-3] + (6,) + out.shape[-1:])
    return f6_mul(fx, b3, t)


# ---------------------------------------------------------------------------
# point ops on stacked projective points [..., 18, B] (X||Y||Z), mirroring the
# exact mul/add sequences of ecc.rs (formula-identical intermediates).
# ---------------------------------------------------------------------------
def compute_double(fx, pt, b3):
    x, y, z = pt[..., 0:6, :], pt[..., 6:12, :], pt[..., 12:18, :]
    m = lambda u, v: f6_mul(fx, u, v)
    a = lambda u, v: fx.add(u, v)
    s = lambda u, v: fx.sub(u, v)
    d = lambda u: fx.add(u, u)

    t0 = m(x, x)
    t1 = m(y, y)
    t2 = m(z, z)
    t3 = d(m(x, y))
    z3 = d(m(x, z))
    y3 = _mul_b3(fx, b3, t2)
    y3 = a(z3, y3)
    x3 = s(t1, y3)
    y3 = a(t1, y3)
    y3 = m(x3, y3)
    x3 = m(t3, x3)
    z3 = _mul_b3(fx, b3, z3)
    t3 = s(t0, t2)
    t3 = a(t3, z3)
    z3 = d(t0)
    t0 = a(z3, t0)
    t0 = a(t0, t2)
    t0 = m(t0, t3)
    y3 = a(y3, t0)
    t2 = d(m(y, z))
    t0 = m(t2, t3)
    x3 = s(x3, t0)
    z3 = d(m(t2, t1))
    z3 = d(z3)
    return _cat([x3, y3, z3], fx)


def compute_add(fx, pt1, pt2, b3):
    x1, y1, z1 = pt1[..., 0:6, :], pt1[..., 6:12, :], pt1[..., 12:18, :]
    x2, y2, z2 = pt2[..., 0:6, :], pt2[..., 6:12, :], pt2[..., 12:18, :]
    m = lambda u, v: f6_mul(fx, u, v)
    a = lambda u, v: fx.add(u, v)
    s = lambda u, v: fx.sub(u, v)
    d = lambda u: fx.add(u, u)

    t0 = m(x1, x2)
    t1 = m(y1, y2)
    t2 = m(z1, z2)
    t3 = s(m(a(x1, y1), a(x2, y2)), a(t0, t1))
    t4 = s(m(a(x1, z1), a(x2, z2)), a(t0, t2))
    t5 = s(m(a(y1, z1), a(y2, z2)), a(t1, t2))
    x3 = _mul_b3(fx, b3, t2)
    z3 = a(x3, t4)
    x3 = s(t1, z3)
    z3 = a(t1, z3)
    y3 = m(x3, z3)
    t1 = a(d(t0), t0)
    t4 = _mul_b3(fx, b3, t4)
    t1 = a(t1, t2)
    t2 = s(t0, t2)
    t4 = a(t4, t2)
    t0 = m(t1, t4)
    y3 = a(y3, t0)
    t0 = m(t5, t4)
    x3 = s(m(t3, x3), t0)
    t0 = m(t3, t1)
    z3 = a(m(t5, z3), t0)
    return _cat([x3, y3, z3], fx)


def compute_add_mixed(fx, pt1, pt2_affine, b3):
    x1, y1, z1 = pt1[..., 0:6, :], pt1[..., 6:12, :], pt1[..., 12:18, :]
    x2, y2 = pt2_affine[..., 0:6, :], pt2_affine[..., 6:12, :]
    m = lambda u, v: f6_mul(fx, u, v)
    a = lambda u, v: fx.add(u, v)
    s = lambda u, v: fx.sub(u, v)
    d = lambda u: fx.add(u, u)

    t0 = m(x1, x2)
    t1 = m(y1, y2)
    t3 = s(m(a(x2, y2), a(x1, y1)), a(t0, t1))
    t4 = a(m(x2, z1), x1)
    t5 = a(m(y2, z1), y1)
    x3 = _mul_b3(fx, b3, z1)
    z3 = a(x3, t4)
    x3 = s(t1, z3)
    z3 = a(t1, z3)
    y3 = m(x3, z3)
    t1 = a(d(t0), t0)
    t4 = _mul_b3(fx, b3, t4)
    t1 = a(t1, z1)
    t2 = s(t0, z1)
    t4 = a(t4, t2)
    t0 = m(t1, t4)
    y3 = a(y3, t0)
    t0 = m(t5, t4)
    x3 = s(m(t3, x3), t0)
    t0 = m(t3, t1)
    z3 = a(m(t5, z3), t0)
    return _cat([x3, y3, z3], fx)


# ---------------------------------------------------------------------------
# constraint evaluators (ecc.rs:73-172); results returned stacked [..., 19, B]
# or [..., 18, B] -- caller aggregates into its result slots.
# ---------------------------------------------------------------------------
def enforce_point_doubling(fx, cur19, nxt19, flag, b3):
    """19 constraint rows: 18 doubling equalities + 1 binary bit check."""
    dbl = compute_double(fx, cur19[..., 0:18, :], b3)
    eqs = fx.mul(fx.sub(nxt19[..., 0:18, :], dbl), flag)
    bit = cur19[..., 18:19, :]
    binc = fx.mul(fx.sub(fx.mul(bit, bit), bit), flag)
    return _cat([eqs, binc], fx)


def enforce_point_addition_mixed(fx, cur19, nxt19, point12, flag, b3):
    """19 rows: conditional-add equalities + bit-copy check."""
    added = compute_add_mixed(fx, cur19[..., 0:18, :], point12, b3)
    bit = cur19[..., 18:19, :]
    one = fx.const(1, bit.ndim - 1)
    not_bit = fx.sub(one, bit)
    expect = fx.add(fx.mul(added, bit), fx.mul(cur19[..., 0:18, :], not_bit))
    eqs = fx.mul(fx.sub(nxt19[..., 0:18, :], expect), flag)
    bitcopy = fx.mul(fx.sub(cur19[..., 18:19, :], nxt19[..., 18:19, :]), flag)
    return _cat([eqs, bitcopy], fx)


def enforce_point_addition_reduce_x(fx, cur18, nxt18, point18, flag, b3):
    """18 rows: full addition with affine-x reduction on the first 6
    (x * Z == X check), plus Y/Z equalities."""
    added = compute_add(fx, cur18, point18, b3)
    x_z = f6_mul(fx, nxt18[..., 0:6, :], added[..., 12:18, :])
    first = fx.sub(x_z, added[..., 0:6, :])
    rest = fx.sub(nxt18[..., 6:18, :], added[..., 6:18, :])
    return fx.mul(_cat([first, rest], fx), flag)
