"""f63 prime-field arithmetic as vectorized JAX uint32 limb kernels.

The field is F_p with p = 4719772409484279809 = 2^62 + 2^56 + 2^55 + 1 (131*2^55+1),
the base field of the reference framework (winterfell fork `fields::f63`, used
throughout /root/reference/src). 2-adicity is 55, so radix-2 NTTs up to 2^55.

TPU-native design decisions:
  * An element is 4 little-endian 16-bit limbs stored in uint32, on a LEADING axis:
    an array of field elements with logical shape S has physical shape (4,) + S.
    The trailing (lane) axes stay the large data axes, so the VPU vectorizes over
    domain points / trace cells; limb arithmetic unrolls into straight-line uint32
    ops that XLA fuses.
  * Device arrays live in the Montgomery domain (R = 2^64), like the reference
    engine: add/sub are domain-agnostic, `mul` is a fused Montgomery multiply
    (16 partial 16x16 products + REDC). Standard-form conversion happens only at
    host boundaries (serialization, Fiat-Shamir).
  * Only uint32 ops are used (no uint64): everything lowers to native TPU VPU
    int ops and is Pallas-compatible.

Host-side helpers convert between Python ints / numpy uint64 and limb arrays.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Field constants
# ---------------------------------------------------------------------------
P = 4719772409484279809  # 2^62 + 2^56 + 2^55 + 1
TWO_ADICITY = 55
R = 1 << 64
R_MOD_P = R % P                      # Montgomery ONE
R2_MOD_P = (R * R) % P               # for to_mont
NPRIME = (-pow(P, -1, R)) % R        # -p^{-1} mod 2^64
# multiplicative generator of F_p^* (smallest; p-1 = 2^55 * 131)
_g = None
for _cand in range(2, 100):
    if pow(_cand, (P - 1) // 2, P) != 1 and pow(_cand, (P - 1) // 131, P) != 1:
        _g = _cand
        break
GENERATOR = _g  # multiplicative generator of the field
del _g, _cand

MASK16 = np.uint32(0xFFFF)
NLIMB = 4


def _int_to_limbs(x: int) -> np.ndarray:
    return np.array([(x >> (16 * i)) & 0xFFFF for i in range(NLIMB)], dtype=np.uint32)


P_LIMBS = _int_to_limbs(P)
NPRIME_LIMBS = _int_to_limbs(NPRIME)
ONE_MONT = _int_to_limbs(R_MOD_P)     # Montgomery form of 1
R2_LIMBS = _int_to_limbs(R2_MOD_P)
ZERO = _int_to_limbs(0)


# ---------------------------------------------------------------------------
# Host conversions (numpy; object arrays of Python ints or uint64)
# ---------------------------------------------------------------------------
def from_int(values, mont: bool = True) -> np.ndarray:
    """Convert an int array-like (standard form) to a limb array (4, *shape).

    If mont=True (default) the result is in the Montgomery domain, matching the
    convention for device arrays.
    """
    a = np.asarray(values, dtype=object)
    a = np.vectorize(lambda v: (int(v) * (R if mont else 1)) % P, otypes=[object])(a)
    out = np.empty((NLIMB,) + a.shape, dtype=np.uint32)
    for i in range(NLIMB):
        out[i] = np.vectorize(lambda v: (v >> (16 * i)) & 0xFFFF, otypes=[object])(a).astype(np.uint32)
    return out


def to_int(limbs, mont: bool = True) -> np.ndarray:
    """Convert a limb array (4, *shape) back to an object array of Python ints."""
    a = np.asarray(limbs)
    assert a.shape[0] == NLIMB
    acc = np.zeros(a.shape[1:], dtype=object)
    for i in range(NLIMB):
        acc += a[i].astype(object) << (16 * i)
    if mont:
        rinv = pow(R % P, P - 2, P)
        acc = np.vectorize(lambda v: (v * rinv) % P, otypes=[object])(acc)
    return acc


def const(x: int, mont: bool = True) -> jnp.ndarray:
    """Limb array for a single standard-form integer constant, shape (4,)."""
    return jnp.asarray(_int_to_limbs((x * (R if mont else 1)) % P))


def broadcast_const(x: int, ndim: int, mont: bool = True) -> jnp.ndarray:
    """Constant reshaped to (4,) + (1,)*ndim for broadcasting against data."""
    return const(x, mont).reshape((NLIMB,) + (1,) * ndim)


# ---------------------------------------------------------------------------
# Core limb arithmetic (uint32 only; parameterized over the array namespace).
#
# The same code runs under jax.numpy (device kernels, inside jit) and plain
# numpy (host-side precomputation of protocol tables: twiddles, zerofiers,
# periodic columns — concrete arrays that embed as constants in jit graphs).
# ---------------------------------------------------------------------------
def _geq(a, b):
    """a >= b, comparing 4-limb numbers. Returns bool array of data shape."""
    gt = a[3] > b[3]
    eq = a[3] == b[3]
    for i in (2, 1, 0):
        gt = gt | (eq & (a[i] > b[i]))
        eq = eq & (a[i] == b[i])
    return gt | eq


def _sub_limbs(a, b):
    """a - b assuming a >= b; both 4x16-bit limbs in uint32."""
    out = []
    borrow = np.uint32(0)
    for i in range(NLIMB):
        d = a[i] - b[i] - borrow
        borrow = (d >> 31) & np.uint32(1)  # went negative -> top bit set after wrap
        out.append(d & MASK16)
    return out


def _add_limbs(a, b):
    out = []
    carry = np.uint32(0)
    for i in range(NLIMB):
        s = a[i] + b[i] + carry
        carry = s >> 16
        out.append(s & MASK16)
    return out, carry


def _cond_sub_p(limbs, xp=jnp):
    """Reduce a 4-limb value < 2p into [0, p)."""
    p = [np.uint32(int(x)) for x in P_LIMBS]
    ge = _geq(limbs, p)
    sub = _sub_limbs(limbs, p)
    return [xp.where(ge, s, l) for s, l in zip(sub, limbs)]


def add(a, b, xp=jnp):
    """Field addition; limb arrays (4, *S)."""
    s, _ = _add_limbs(list(a), list(b))
    return xp.stack(_cond_sub_p(s, xp), axis=0)


def sub(a, b, xp=jnp):
    """Field subtraction."""
    p = [np.uint32(int(x)) for x in P_LIMBS]
    lt = ~_geq(list(a), list(b))
    # a + p - b where needed; compute both branches (vector select)
    ap, _ = _add_limbs(list(a), p)
    d_small = _sub_limbs(ap, list(b))     # valid when a < b
    d_big = _sub_limbs(list(a), list(b))  # valid when a >= b
    return xp.stack([xp.where(lt, s, t) for s, t in zip(d_small, d_big)], axis=0)


def neg(a, xp=jnp):
    zero = xp.zeros_like(a)
    return sub(zero, a, xp)


def double(a, xp=jnp):
    return add(a, a, xp)


def _mul_wide(a, b, ncols):
    """Column sums of the schoolbook product of two 4-limb numbers.

    Returns `ncols` carry-propagated 16-bit limbs (uint32). ncols=8 for a full
    product, ncols=4 for a product truncated mod 2^64.
    """
    prods = [[a[i] * b[j] for j in range(NLIMB)] for i in range(NLIMB)]
    cols = [None] * (ncols + 1)
    for i in range(NLIMB):
        for j in range(NLIMB):
            k = i + j
            if k < ncols:
                lo = prods[i][j] & MASK16
                cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < ncols:
                hi = prods[i][j] >> 16
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    out = []
    carry = np.uint32(0)
    for k in range(ncols):
        s = cols[k] + carry
        carry = s >> 16
        out.append(s & MASK16)
    return out, carry


def _mul_wide_t(a, b, xp):
    """Tensorized schoolbook product of limb arrays [4, *S] -> carry-normalized
    8-limb array [8, *S].

    One hardware multiply computes all 16 partial products (outer product over
    a new limb axis); anti-diagonal column sums are padded shifts + one stacked
    reduction. Keeps kernel graphs ~5x smaller than the scalar-unrolled form.
    """
    prods = a[:, None] * b[None, :]               # [4, 4, *S]
    lo = prods & MASK16
    hi = prods >> 16
    tail = prods.shape[2:]
    parts = []
    for i in range(NLIMB):
        # lo[i] occupies columns i..i+3; hi[i] columns i+1..i+4
        parts.append(xp.pad(lo[i], ((i, 4 - i),) + ((0, 0),) * len(tail)))
        parts.append(xp.pad(hi[i], ((i + 1, 3 - i),) + ((0, 0),) * len(tail)))
    cols = xp.sum(xp.stack(parts), axis=0)        # [8, *S], each < 2^20
    out = []
    carry = np.uint32(0)
    for k in range(8):
        s = cols[k] + carry
        carry = s >> 16
        out.append(s & MASK16)
    return xp.stack(out, axis=0)


# The modulus and -p^{-1} mod 2^64 are heavily structured:
#   p  = 0x4180000000000001  -> limbs [1, 0, 0, 0x4180]
#   N' = 0x417fffffffffffff  -> (0x4180 << 48) - 1
# so the REDC products cost 1 multiply (m = t*N' mod R = ((t0*0x4180)<<48) - t)
# and 4 multiplies (m*p = m + ((m*0x4180)<<48)) instead of 16 each.
_P_TOP = np.uint32(0x4180)
_B16 = np.uint32(0x10000)
_ONE = np.uint32(1)


def _redc(t, xp):
    """REDC of a carry-normalized 16-bit-limb list t (8 or 9 limbs):
    returns u = (t + m*p) / 2^64 as a 5-limb list (NOT reduced below p)."""
    # m = ((t0 * 0x4180) & 0xFFFF) << 48  minus  t[0..3],  mod 2^64
    a3 = (t[0] * _P_TOP) & MASK16
    d0 = _B16 - t[0]
    m0 = d0 & MASK16
    bor = _ONE - (d0 >> 16)          # borrow unless t0 == 0
    d1 = _B16 - t[1] - bor
    m1 = d1 & MASK16
    bor = _ONE - (d1 >> 16)
    d2 = _B16 - t[2] - bor
    m2 = d2 & MASK16
    bor = _ONE - (d2 >> 16)
    m3 = (a3 - t[3] - bor) & MASK16
    # m*p contributions: m at columns 0..3; m*0x4180 at columns 3..7
    mp_lo = [(m * _P_TOP) & MASK16 for m in (m0, m1, m2, m3)]
    mp_hi = [(m * _P_TOP) >> 16 for m in (m0, m1, m2, m3)]
    cols = [t[0] + m0, t[1] + m1, t[2] + m2,
            t[3] + m3 + mp_lo[0],
            t[4] + mp_hi[0] + mp_lo[1],
            t[5] + mp_hi[1] + mp_lo[2],
            t[6] + mp_hi[2] + mp_lo[3],
            t[7] + mp_hi[3]]
    if len(t) > 8:
        cols.append(t[8])
    u = []
    carry = np.uint32(0)
    for k, c in enumerate(cols):
        s = c + carry
        carry = s >> 16
        if k >= 4:
            u.append(s & MASK16)
    while len(u) < 5:
        u.append(carry)
        carry = np.uint32(0)
    return u


def mul(a, b, xp=jnp):
    """Montgomery multiply: returns REDC(a*b); inputs/outputs in Montgomery form."""
    a = xp.asarray(a)
    b = xp.asarray(b)
    t = _mul_wide_t(a, b, xp)                     # t = a*b, 8 limbs
    u = _redc([t[k] for k in range(8)], xp)
    # u < 2p < 2^64: top limb is zero
    return xp.stack(_cond_sub_p(u[:4], xp), axis=0)


def square(a, xp=jnp):
    return mul(a, a, xp)


# Multiples 2^s * p as 5-limb arrays, for the binary tail reduction of mul_sum.
_P_MULTIPLES = {}


def _p_multiple_limbs(s: int):
    if s not in _P_MULTIPLES:
        v = P << s
        _P_MULTIPLES[s] = [np.uint32((v >> (16 * i)) & 0xFFFF) for i in range(5)]
    return _P_MULTIPLES[s]


def _geq_n(a, b):
    """a >= b for equal-length limb lists."""
    n = len(a)
    gt = a[n - 1] > b[n - 1]
    eq = a[n - 1] == b[n - 1]
    for i in range(n - 2, -1, -1):
        gt = gt | (eq & (a[i] > b[i]))
        eq = eq & (a[i] == b[i])
    return gt | eq


def _sub_limbs_n(a, b):
    """a - b assuming a >= b; equal-length 16-bit limb lists in uint32."""
    out = []
    borrow = np.uint32(0)
    for i in range(len(a)):
        d = a[i] - b[i] - borrow
        borrow = (d >> 31) & np.uint32(1)
        out.append(d & MASK16)
    return out


def mul_sum(a, b, axis: int, xp=jnp, j_bound: int | None = None):
    """REDC(sum over `axis` of a*b): a fused dot product with ONE Montgomery
    reduction for the whole sum instead of one per term.

    a, b: broadcast-compatible limb arrays [4, *S] in Montgomery form.
    axis: reduction axis of the FULL array (limb axis is 0, so data axes are
    1..). The reduced result is again Montgomery form, shape = broadcast(S)
    minus the reduced axis.

    This is the workhorse behind the MDS layer, constraint-composition dots,
    DEEP dots and polynomial evaluation — the reference pays a full reduction
    per product (winterfell f63 `mul`); deferring it across the sum removes
    ~J-1 of J REDC passes. Safe for reduction lengths J <= 4096 (uint32 column
    accumulators); chunk longer sums (see dot_chunked)."""
    assert axis != 0 and axis != -a.ndim if axis < 0 else True
    ndata = max(a.ndim, b.ndim) - 1
    ax = (axis - 1) if axis > 0 else (axis + ndata)  # data-axis index
    J = max(np.broadcast_shapes(a.shape[1:], b.shape[1:])[ax], 1)
    if j_bound is not None:
        J = max(J, j_bound)
    assert J <= 4096, "mul_sum reduction too long; chunk it"

    # schoolbook partial products: one tensor multiply for all 16 limb pairs,
    # column alignment via pads on the b-limb axis, then ONE fused reduction
    # over (partial, J). This formulation compiles to a single fused loop
    # (separate per-column reduces are ~10x slower under XLA).
    prods = a[:, None] * b[None, :]               # [4, 4, *S]
    lo = prods & MASK16
    hi = prods >> 16
    tail = ((0, 0),) * ndata
    parts = []
    for i in range(NLIMB):
        # lo[i][j] has column weight i+j; hi[i][j] weight i+j+1
        parts.append(xp.pad(lo[i], ((i, 5 - i),) + tail))
        parts.append(xp.pad(hi[i], ((i + 1, 4 - i),) + tail))
    stacked = xp.stack(parts)                     # [8, 9, *S]
    cols = xp.sum(stacked, axis=(0, ax + 2), dtype=xp.uint32)  # [9, *S-J]
    # carry-normalize to 9 16-bit limbs: t = sum(a*b) < J * p^2 < 2^138
    t = []
    carry = np.uint32(0)
    for k in range(9):
        s = cols[k] + carry
        carry = s >> 16
        t.append(s & MASK16)

    # REDC via the structured-constant path (see _redc): u < p*(1 + J*p/R)
    u = _redc(t, xp)

    # binary tail reduction: cond-subtract 2^s*p from s_max down to 0
    u_max = P + (J * (P - 1) * (P - 1)) // R
    s_max = max((u_max // P).bit_length() - 1, 0)
    for s in range(s_max, -1, -1):
        ps = _p_multiple_limbs(s)
        ge = _geq_n(u, ps)
        sub5 = _sub_limbs_n(u, ps)
        u = [xp.where(ge, x, y) for x, y in zip(sub5, u)]
    return xp.stack(u[:4], axis=0)


def dot_chunked(a, b, axis: int, chunk: int = 1024, xp=jnp):
    """mul_sum for arbitrarily long reductions: split `axis` into chunks of
    `chunk`, fuse-reduce each, then field-add the partial sums."""
    J = np.broadcast_shapes(a.shape, b.shape)[axis]
    if J <= chunk:
        return mul_sum(a, b, axis, xp)
    ax = axis if axis >= 0 else a.ndim + axis
    assert J % chunk == 0

    def split(x):
        if x.shape[ax] == 1:  # broadcast operand: keep it broadcast
            return xp.expand_dims(x, ax)
        return x.reshape(x.shape[:ax] + (J // chunk, chunk) + x.shape[ax + 1:])

    partial = mul_sum(split(a), split(b), ax + 1, xp)  # reduced over chunk
    from . import ntt as _NTT
    return _NTT.sum_reduce(partial, axis=ax, xp=xp)


def mul_const(a, c_mont, xp=jnp):
    """Multiply by a precomputed Montgomery-form constant of shape (4,)."""
    cc = c_mont.reshape((NLIMB,) + (1,) * (a.ndim - 1))
    return mul(a, xp.broadcast_to(cc, a.shape), xp)


def pow_const(a, e: int, unroll_threshold: int = 64, xp=jnp):
    """a ** e for a fixed Python-int exponent.

    Small exponents unroll into straight-line square/multiply; large ones (e.g.
    p-2 for inversion, INV_ALPHA for the Rescue inverse s-box) compile a single
    fori_loop over the bits to keep compile time flat. The numpy path always
    uses the plain (host, vectorized) square-and-multiply loop.
    """
    assert e >= 0
    ones = xp.broadcast_to(
        xp.asarray(ONE_MONT).reshape((NLIMB,) + (1,) * (a.ndim - 1)), a.shape)
    if e == 0:
        return ones
    if e < unroll_threshold or xp is np:
        bits = bin(e)[2:]
        r = a
        for bit in bits[1:]:
            r = square(r, xp)
            if bit == "1":
                r = mul(r, a, xp)
        return r

    import jax

    nbits = e.bit_length()
    # LSB-first square-and-multiply: loop body is compiled once
    ebits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32))

    def body(i, carry):
        r, base = carry
        bit = ebits[i] == 1
        r = select(jnp.broadcast_to(bit, r.shape[1:]), mul(r, base), r)
        base = square(base)
        return (r, base)

    r, _ = jax.lax.fori_loop(0, nbits, body, (ones, a))
    return r


def inv(a, xp=jnp):
    """Field inverse via a^(p-2). a must be nonzero (0 maps to 0)."""
    return pow_const(a, P - 2, xp=xp)


def from_mont(a, xp=jnp):
    """Montgomery -> standard form (REDC with 1)."""
    one_std = xp.asarray(_int_to_limbs(1)).reshape((NLIMB,) + (1,) * (a.ndim - 1))
    return mul(a, xp.broadcast_to(one_std, a.shape), xp)


def to_mont(a_std, xp=jnp):
    """Standard -> Montgomery form (multiply by R^2)."""
    return mul_const(a_std, xp.asarray(R2_LIMBS), xp)


# ---------------------------------------------------------------------------
# Host-side (numpy) protocol-table helpers: concrete arrays, no device work.
# ---------------------------------------------------------------------------
def np_const(x: int, mont: bool = True) -> np.ndarray:
    return _int_to_limbs((int(x) * (R if mont else 1)) % P)


def np_powers(base: int, count: int) -> np.ndarray:
    """[base^0 .. base^(count-1)] as Montgomery limbs [4, count] (numpy)."""
    if count >= 4096:
        # the numpy log-doubling below costs minutes at 2^22+ counts (limb
        # mul = ~40 stacked array ops); the C chain is one modmul/element
        from ..utils import native as NAT
        if NAT.available():
            return unpack_u64(NAT.powers_mont(base, count))
    if count == 1:
        return ONE_MONT.reshape(4, 1).copy()
    tbl = np.stack([ONE_MONT, np_const(base)], axis=1)
    cur = 2
    while cur < count:
        m = min(cur, count - cur)
        step = np.broadcast_to(np_const(pow(base, cur, P)).reshape(4, 1),
                               (4, m))
        nxt = mul(tbl[:, :m], step, np)
        tbl = np.concatenate([tbl, nxt], axis=1)
        cur *= 2
    return tbl[:, :count]


def is_zero_mask(a):
    """Boolean mask of data shape: element == 0 (works in either domain)."""
    m = a[0] == 0
    for i in range(1, NLIMB):
        m = m & (a[i] == 0)
    return m


def select(mask, a, b):
    """Elementwise select between two limb arrays by a data-shaped bool mask."""
    return jnp.where(mask[None], a, b)


def eq_mask(a, b):
    m = a[0] == b[0]
    for i in range(1, NLIMB):
        m = m & (a[i] == b[i])
    return m


# uint64 <-> limb packing (host-side). Limbs are 16-bit values in uint32 with
# the limb axis leading, so pack/unpack are pure byte-layout reinterpretations
# (uint16 view + axis move) — ~10x faster than shift/or chains at LDE sizes.
def pack_u64(limbs: np.ndarray) -> np.ndarray:
    """(4, *S) uint32 limbs -> uint64 array of raw (Montgomery-domain) values."""
    a = np.asarray(limbs)
    b = np.ascontiguousarray(np.moveaxis(a.astype(np.uint16), 0, -1))
    return b.view(np.uint64)[..., 0]


def unpack_u64(vals: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(np.asarray(vals, dtype=np.uint64))
    half = v.reshape(v.shape + (1,)).view(np.uint16)      # (*S, 4) LE limbs
    return np.moveaxis(half, -1, 0).astype(np.uint32)


def redc_cols16(t_cols, J, xp=jnp):
    """Montgomery-reduce per-16-bit-weight column sums.

    t_cols: list of 8 u32 arrays (weight 2^(16*k), values < 2^32) whose
    weighted sum is a deferred product accumulation of J Montgomery products
    (as produced by the MXU MDS path, ops/rescue.py). Returns reduced
    Montgomery limbs [4, *S]. Same tail as mul_sum."""
    t = []
    carry = np.uint32(0)
    zero = xp.zeros_like(t_cols[0])
    for k in range(9):
        s = (t_cols[k] if k < 8 else zero) + carry
        carry = s >> 16
        t.append(s & MASK16)
    u = _redc(t, xp)
    u_max = P + (J * (P - 1) * (P - 1)) // R
    s_max = max((u_max // P).bit_length() - 1, 0)
    for s in range(s_max, -1, -1):
        ps = _p_multiple_limbs(s)
        ge = _geq_n(u, ps)
        sub5 = _sub_limbs_n(u, ps)
        u = [xp.where(ge, x, y) for x, y in zip(sub5, u)]
    return xp.stack(u[:4], axis=0)


def pack2(limbs, xp=jnp):
    """[4, ...] 16-bit limbs (u32 containers) -> packed 32-bit words [2, ...].

    Storage-halving representation for large resident arrays (the 2^23-point
    trace LDE is 12.6 GB as limbs, 6.3 GB packed); values stay in Montgomery
    form. Cheap VPU shifts/ors both ways (see unpack2)."""
    s = np.uint32(16)
    return xp.stack([limbs[0] | (limbs[1] << s), limbs[2] | (limbs[3] << s)])


def unpack2(packed, xp=jnp):
    """Inverse of pack2: [2, ...] u32 words -> [4, ...] 16-bit limbs."""
    m, s = MASK16, np.uint32(16)
    return xp.stack([packed[0] & m, packed[0] >> s,
                     packed[1] & m, packed[1] >> s])
