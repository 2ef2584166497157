"""Number-theoretic transform and low-degree extension over f63 (JAX).

Replaces the reference engine's per-column CPU interpolation/extension
(winterfell LDE, used by every prover in /root/reference/src/*/prover.rs) with a
batched radix-2 NTT over the last axis of a limb array.

Design notes (TPU):
  * transforms are batched over leading data axes (all trace columns at once);
  * decimation-in-time with a precomputed bit-reversal index vector (one gather)
    and per-stage twiddles sliced statically from a master table — every stage is
    a reshape + vectorized field mul/add, which XLA tiles onto the VPU;
  * twiddle tables are built on device in O(log N) tensor ops and cached;
  * all data stays in the Montgomery domain.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F

# cache: (n, inverse) -> master twiddle table [4, n/2] (jnp, Montgomery)
_twiddle_cache: dict = {}
_bitrev_cache: dict = {}


def root_of_unity(n: int) -> int:
    """Standard-form primitive n-th root of unity (n a power of two <= 2^55)."""
    assert n & (n - 1) == 0 and n.bit_length() - 1 <= F.TWO_ADICITY
    return pow(F.GENERATOR, (F.P - 1) // n, F.P)


def _powers_table(base: int, count: int) -> np.ndarray:
    """[base^0 .. base^(count-1)] as Montgomery limbs [4, count].

    Computed host-side with the numpy field core: concrete arrays are safe to
    slice/cache across jit traces and embed as compile-time constants."""
    return F.np_powers(base, count)


def twiddles(n: int, inverse: bool = False) -> jnp.ndarray:
    key = (n, inverse)
    if key not in _twiddle_cache:
        w = root_of_unity(n)
        if inverse:
            w = pow(w, F.P - 2, F.P)
        _twiddle_cache[key] = _powers_table(w, max(n // 2, 1))
    return _twiddle_cache[key]


def bitrev_indices(n: int) -> jnp.ndarray:
    if n not in _bitrev_cache:
        bits = n.bit_length() - 1
        idx = np.arange(n, dtype=np.int32)
        rev = np.zeros(n, dtype=np.int32)
        for b in range(bits):
            rev |= ((idx >> b) & 1) << (bits - 1 - b)
        _bitrev_cache[n] = rev  # keep as numpy: safe to reuse across jit traces
    return _bitrev_cache[n]


# Above this transform size, twiddle/bit-reversal/coset tables are generated
# ON DEVICE inside the jitted graph instead of being embedded as host-array
# constants: a 2^23-point transform otherwise embeds ~230 MB of literals in
# the HLO, which blows the remote-compile request limit (HTTP 413 on the
# axon relay) and bloats every executable. Generation is O(log n) tensor ops.
_DEVICE_TABLE_MIN = 1 << 21


def powers_device(base: int, count: int) -> jnp.ndarray:
    """[base^0 .. base^(count-1)] as Montgomery limbs [4, count], built on
    device by log-doubling (no large embedded constant)."""
    assert count & (count - 1) == 0
    tbl = jnp.asarray(F.ONE_MONT).reshape(4, 1)
    cur = base
    k = 1
    while k < count:
        scale = jnp.asarray(F.np_const(cur)).reshape(4, 1)
        tbl = jnp.concatenate(
            [tbl, F.mul(tbl, jnp.broadcast_to(scale, tbl.shape))], axis=-1)
        cur = cur * cur % F.P
        k *= 2
    return tbl


def bitrev_device(n: int) -> jnp.ndarray:
    """Bit-reversal permutation indices [n] int32, built on device."""
    bits = n.bit_length() - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    rev = jnp.zeros(n, dtype=jnp.int32)
    for b in range(bits):
        rev = rev | (((idx >> b) & 1) << (bits - 1 - b))
    return rev


def ntt(a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """NTT along the last axis. a: limb array [4, ..., n] (Montgomery).

    Forward maps coefficients -> evaluations at [w^0..w^(n-1)] (natural order).
    Inverse maps evaluations -> coefficients (includes the 1/n scale).

    Dispatch (bit-identical variants):
      * batched transforms whose total working set exceeds VMEM scale are
        lax.map'ed over lead-axis groups of ~2^20 elements each
        (_GROUP_ELEMS): measured on v5e (scripts/perf_probe_r5 --ntt) the
        ungrouped [94, 2^17] batch runs 0.73 G butterflies/s while 8-column
        groups run 3.96 G — per-stage working sets stream HBM once they
        outgrow VMEM. Applies recursively to the four-step's inner legs, so
        big single-column transforms (2^22+) gain too.
      * accelerator + n >= _FOUR_STEP_MIN -> Bailey four-step (measured ~8x
        the radix-2 butterfly on v5e at 2^20: 2.6 ms vs 21.4 ms — each
        sqrt(n)-sized sub-transform keeps its twiddle slice and rows
        VMEM-resident, while the radix-2 form streams the whole array from
        HBM log2(n) times). CSTARK_NTT_FOUR_STEP=0/1 overrides.
      * The MXU matmul form (ntt_mxu) is bit-identical and available behind
        CSTARK_NTT_MXU=1, but MEASURED SLOWER on v5e (2.6 s vs 0.44 s at
        [4,16,2^20] with forced device sync): the deferred-REDC byte-plane
        expansion writes 15 f32 columns per 4-limb output plus an 18-step
        carry fold — ~7x the butterfly's HBM traffic. See DESIGN.md
        "MXU-shaped hot path".
      * otherwise the radix-2 butterfly (XLA:CPU, small sizes).
    """
    if a.shape[-1] >= _DFT_MIN and _use_mxu_ntt():
        return ntt_mxu(a, inverse)
    n = a.shape[-1]
    lead = a.shape[1:-1]
    C = 1
    for d in lead:
        C *= d
    if C > 1 and C * n > 2 * _GROUP_ELEMS and _use_group():
        wc = max(1, _GROUP_ELEMS // n)
        if C > wc:
            flat = a.reshape(4, C, n)
            pad = (-C) % wc
            if pad:
                flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
            g = flat.reshape(4, -1, wc, n).transpose(1, 0, 2, 3)
            o = jax.lax.map(lambda x: _ntt_single(x, inverse), g)
            o = o.transpose(1, 0, 2, 3).reshape(4, -1, n)[:, :C]
            return o.reshape(a.shape)
    return _ntt_single(a, inverse)


# per-group transform working set target for the grouped batch dispatch:
# r5 probe showed a flat optimum at wc*n ~ 2^18..2^20 (16 MB of limb data)
# with sharp falloff above (grp16 at 2^17 already 3x slower than grp8)
_GROUP_ELEMS = 1 << 20
_USE_GROUP = None


def _use_group() -> bool:
    global _USE_GROUP
    if _USE_GROUP is None:
        import os
        v = os.environ.get("CSTARK_NTT_GROUP")
        if v is not None:
            _USE_GROUP = v != "0"
        else:
            try:
                import jax as _jax
                _USE_GROUP = _jax.default_backend() != "cpu"
            except Exception:  # noqa: BLE001
                _USE_GROUP = False
    return _USE_GROUP


def _ntt_single(a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Ungrouped dispatch (four-step or radix-2) for one lead group."""
    if _use_four_step(a.shape[-1]):
        return ntt_four_step(a, inverse)
    return _ntt_butterfly(a, inverse)


def _use_four_step(n: int) -> bool:
    import os
    v = os.environ.get("CSTARK_NTT_FOUR_STEP")
    if v is not None:
        try:
            return bool(int(v)) and n >= 4
        except ValueError:
            raise ValueError(
                f"CSTARK_NTT_FOUR_STEP must be an integer, got {v!r}") from None
    if n < _FOUR_STEP_MIN:
        return False
    try:
        import jax
        return jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001
        return False


# Four-step pays a full-size twiddle multiply + two transposes; it wins once
# the radix-2 form's log2(n) HBM sweeps dominate (v5e measurement: faster
# from 2^15 up). Sub-transforms are ~sqrt(n) < this bound, so the recursive
# ntt() calls inside ntt_four_step take the butterfly path.
_FOUR_STEP_MIN = 1 << 15


def _ntt_butterfly(a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Radix-2 butterfly NTT (VPU / XLA:CPU path)."""
    n = a.shape[-1]
    assert n & (n - 1) == 0
    if n == 1:
        return a
    logn = n.bit_length() - 1
    if n >= _DEVICE_TABLE_MIN:
        w = root_of_unity(n)
        if inverse:
            w = pow(w, F.P - 2, F.P)
        master = powers_device(w, n // 2)
        x = jnp.take(a, bitrev_device(n), axis=-1)
    else:
        master = twiddles(n, inverse)  # [4, n/2]
        x = jnp.take(a, bitrev_indices(n), axis=-1)
    lead = x.shape[1:-1]  # data axes between limb axis and transform axis
    for s in range(1, logn + 1):
        m = 1 << s
        half = m >> 1
        xr = x.reshape((4,) + lead + (n // m, m))
        even = xr[..., :half]
        odd = xr[..., half:]
        tw = master[:, :: n // m]  # [4, half]
        tw = tw.reshape((4,) + (1,) * len(lead) + (1, half))
        t = F.mul(odd, jnp.broadcast_to(tw, odd.shape))
        x = jnp.concatenate([F.add(even, t), F.sub(even, t)], axis=-1)
        x = x.reshape((4,) + lead + (n,))
    if inverse:
        n_inv = pow(n, F.P - 2, F.P)
        x = F.mul_const(x, F.const(n_inv))
    return x


def ntt_four_step(a: jnp.ndarray, inverse: bool = False,
                  n1: int | None = None) -> jnp.ndarray:
    """Bailey four-step NTT along the last axis: view length n as an n2 x n1
    matrix, transform columns (length n2), twiddle, transform rows (length n1).

    Exactly equal to ntt(); wins on locality: each sub-transform streams
    contiguous cache/VMEM-resident rows with a large batch axis, which is also
    the single-chip shape of the multi-chip six-step NTT (parallel/ntt.py) and
    of the Pallas fused local-NTT kernel (ops/pallas_kernels.py).
    """
    n = a.shape[-1]
    assert n & (n - 1) == 0
    logn = n.bit_length() - 1
    if n1 is None:
        n1 = 1 << (logn // 2)
    n2 = n // n1
    lead = a.shape[1:-1]

    # i = i1 + n1*i2  ->  m[.., i1, i2 dims] ; transform over i2 first
    m = a.reshape((4,) + lead + (n2, n1))
    m = jnp.swapaxes(m, -1, -2)                  # [4, .., n1, n2]
    s = ntt(m, inverse)                          # columns: over i2
    if n >= _DEVICE_TABLE_MIN:
        # build T[i1,k2] = (w^i1)^k2 on device by log-doubling along the
        # k2 axis with per-row bases: T[:, :2m] = [T_m | T_m * base^m].
        # ~n field muls total, no big embedded constant (HTTP-413: a 2^23
        # table is ~230 MB of HLO literal) and no n-sized gather — the
        # earlier iota-product + 8M-index take lowered to a gather that
        # the remote-compile path never finished at 2^23
        w = root_of_unity(n)
        if inverse:
            w = pow(w, F.P - 2, F.P)
        base = powers_device(w, n1)              # [4, n1] = w^i1
        tw = jnp.broadcast_to(
            jnp.asarray(F.ONE_MONT).reshape(4, 1, 1), (4, n1, 1))
        cur = base                               # base^(2^j) elementwise
        k = 1
        while k < n2:
            tw = jnp.concatenate(
                [tw, F.mul(tw, jnp.broadcast_to(cur[:, :, None], tw.shape))],
                axis=-1)
            if 2 * k < n2:
                cur = F.mul(cur, cur)
            k *= 2
    else:
        tw = _four_step_twiddles(n, n1, n2, inverse)  # [4, n1, n2]
    tw = tw.reshape((4,) + (1,) * len(lead) + (n1, n2))
    s = F.mul(s, jnp.broadcast_to(tw, s.shape))
    s = jnp.swapaxes(s, -1, -2)                  # [4, .., n2, n1]
    s = ntt(s, inverse)                          # rows: over i1
    # s[k2, k1] is the evaluation at bucket k = k2 + n2*k1
    s = jnp.swapaxes(s, -1, -2)
    return s.reshape((4,) + lead + (n,))


_four_step_cache: dict = {}


def _four_step_twiddles(n: int, n1: int, n2: int, inverse: bool) -> np.ndarray:
    """Twiddle matrix T[i1, k2] = w_n^{i1*k2} as Montgomery limbs [4, n1, n2]."""
    key = (n, n1, inverse)
    if key not in _four_step_cache:
        w = root_of_unity(n)
        if inverse:
            w = pow(w, F.P - 2, F.P)
        row = _powers_table(w, n2)                     # w^k2
        out = np.empty((4, n1, n2), dtype=np.uint32)
        out[:, 0] = np.broadcast_to(F.ONE_MONT.reshape(4, 1), (4, n2))
        cur = row
        for i1 in range(1, n1):
            out[:, i1] = cur
            if i1 + 1 < n1:
                cur = F.mul(cur, row, np)
        _four_step_cache[key] = out
    return _four_step_cache[key]


def intt(a: jnp.ndarray) -> jnp.ndarray:
    return ntt(a, inverse=True)


def coset_scale(coeffs: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Multiply coefficient i by offset^i (evaluate-on-coset preprocessing)."""
    n = coeffs.shape[-1]
    if n >= _DEVICE_TABLE_MIN:
        tbl = powers_device(offset, n)
    else:
        tbl = _powers_table(offset, n)  # [4, n]
    tbl = tbl.reshape((4,) + (1,) * (coeffs.ndim - 2) + (n,))
    return F.mul(coeffs, jnp.broadcast_to(tbl, coeffs.shape))


def lde(evals: jnp.ndarray, blowup: int, offset: int) -> jnp.ndarray:
    """Low-degree extension of trace columns.

    evals: [4, ..., n] evaluations over the size-n subgroup (trace rows).
    Returns [4, ..., blowup*n] evaluations over the coset offset*<w_{blowup*n}>.
    """
    n = evals.shape[-1]
    coeffs = intt(evals)
    pad = [(0, 0)] * (evals.ndim - 1) + [(0, (blowup - 1) * n)]
    coeffs = jnp.pad(coeffs, pad)
    return ntt(coset_scale(coeffs, offset))


def eval_poly_at(coeffs: jnp.ndarray, z: int) -> np.ndarray:
    """Evaluate polynomial(s) at a base-field point z (host int). Returns limbs.

    coeffs: [4, ..., n]. Uses a powers table + tree reduction (log n field adds).
    """
    n = coeffs.shape[-1]
    tbl = _powers_table(z, n).reshape((4,) + (1,) * (coeffs.ndim - 2) + (n,))
    terms = F.mul(coeffs, jnp.broadcast_to(tbl, coeffs.shape))
    return sum_reduce(terms)


def sum_reduce(a, axis: int = -1, xp=jnp):
    """Field-sum along an axis via tree halving (keeps limbs canonical)."""
    a = xp.moveaxis(a, axis if axis >= 0 else a.ndim + axis, -1)
    n = a.shape[-1]
    while n > 1:
        if n % 2 == 1:
            a = xp.concatenate(
                [a, xp.zeros(a.shape[:-1] + (1,), dtype=a.dtype)], axis=-1)
            n += 1
        a = F.add(a[..., 0::2], a[..., 1::2], xp)
        n = a.shape[-1]
    return a[..., 0]


# ---------------------------------------------------------------------------
# MXU matmul NTT: the size-128 DFT of a four-step decomposition as ONE
# byte-plane bf16 matmul (exact f32 accumulation + deferred Montgomery
# reduction, like the Rescue MDS path in ops/rescue.py). Butterfly NTTs are
# latency-bound VPU chains on TPU; the MXU form turns ~all NTT work into
# systolic-array matmuls. Bit-exact vs ntt() (tested in tests/test_ntt.py).

_NTT_MXU = None
_DFT_BASE = 128     # four-step row size handled by one matmul
_DFT_MIN = 64       # below this, the skinny matmul loses to radix-2 on VPU
_DFT_JCHUNK = 32    # j-chunk: 32*8 byte-pair products * 255^2 < 2^24 (exact)
_dft_tbl_cache: dict = {}


def _use_mxu_ntt() -> bool:
    """MXU NTT gate: OFF by default everywhere — measured slower than the
    butterfly on v5e (see ntt() docstring). CSTARK_NTT_MXU=1 opts in."""
    global _NTT_MXU
    if _NTT_MXU is None:
        import os
        _NTT_MXU = os.environ.get("CSTARK_NTT_MXU") == "1"
    return _NTT_MXU


def _dft_tables(nb: int, inverse: bool):
    """Block byte-plane DFT-nb matrices for the MXU, j-chunked for exact f32
    accumulation: list of [15*nb, 8*_DFT_JCHUNK] bf16 host arrays.

    Row block (k, r) = byte-weight k of output row r; column block (q, jj) =
    byte-plane q of input column j0+jj. Entries carry the Montgomery-form
    DFT matrix D[r, j] = w_nb^(r*j) (with the 1/nb scale folded in for the
    inverse), so REDC of the accumulated products matches F.mul exactly."""
    import jax.numpy as jnp_

    key = (nb, inverse)
    tbl = _dft_tbl_cache.get(key)
    if tbl is None:
        w = root_of_unity(nb)
        scale = 1
        if inverse:
            w = pow(w, F.P - 2, F.P)
            scale = pow(nb, F.P - 2, F.P)
        col = np.empty((nb, nb), dtype=object)
        for r in range(nb):
            wr = pow(w, r, F.P)
            v = scale
            for j in range(nb):
                col[r, j] = v
                v = v * wr % F.P
        m = F.from_int(col)                          # [4, nb, nb] Montgomery
        planes = np.zeros((8, nb, nb), dtype=np.float32)
        for limb in range(4):
            planes[2 * limb] = (m[limb] & 0xFF).astype(np.float32)
            planes[2 * limb + 1] = (m[limb] >> 8).astype(np.float32)
        jc = min(_DFT_JCHUNK, nb)
        blocks = []
        for j0 in range(0, nb, jc):
            big = np.zeros((15 * nb, 8 * jc), dtype=np.float32)
            for k in range(15):
                for q in range(8):
                    p = k - q
                    if 0 <= p < 8:
                        big[k * nb:(k + 1) * nb, q * jc:(q + 1) * jc] = \
                            planes[p][:, j0:j0 + jc]
            blocks.append(big.astype(jnp_.bfloat16))
        tbl = blocks
        _dft_tbl_cache[key] = tbl
    return tbl


def _dft_apply_mxu(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """DFT over the last axis (length nb <= 128) via byte-plane matmuls."""
    nb = x.shape[-1]
    jc = min(_DFT_JCHUNK, nb)
    lead = x.shape[1:-1]
    L = 1
    for d_ in lead:
        L *= d_
    s = x.reshape(4, L, nb)
    planes = []
    for limb in range(4):
        planes.append(s[limb] & np.uint32(0xFF))
        planes.append(s[limb] >> np.uint32(8))
    sp = jnp.stack(planes).astype(jnp.bfloat16)          # [8, L, nb]
    acc = None
    for c, big in enumerate(_dft_tables(nb, inverse)):
        sf = sp[:, :, c * jc:(c + 1) * jc]
        sflat = sf.transpose(0, 2, 1).reshape(8 * jc, L)
        cols = jnp.dot(jnp.asarray(big), sflat,
                       preferred_element_type=jnp.float32)  # [15*nb, L]
        u = cols.astype(jnp.uint32)
        acc = u if acc is None else acc + u
    colsu = acc.reshape(15, nb, L)                       # values < 2^26
    # fold to bytes (carry-normalize), then to 16-bit-weight u32 lanes for
    # the deferred Montgomery reduction
    mask8 = np.uint32(0xFF)
    zero = jnp.zeros_like(colsu[0])
    b = []
    carry = zero
    for k in range(18):
        v = (colsu[k] if k < 15 else zero) + carry
        b.append(v & mask8)
        carry = v >> np.uint32(8)
    t16 = [b[2 * k] + (b[2 * k + 1] << np.uint32(8)) for k in range(7)]
    t16.append(b[14] + (b[15] << np.uint32(8)) + (b[16] << np.uint32(16))
               + (b[17] << np.uint32(24)))
    out = F.redc_cols16(t16, nb)                         # [4, nb, L]
    return out.transpose(0, 2, 1).reshape(x.shape)


def ntt_mxu(a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """NTT along the last axis through MXU matmul DFTs: recursive four-step
    with n1 = 128 rows per level; small bases fall back to radix-2 on VPU.
    Exactly equal to ntt() (same natural-order semantics)."""
    n = a.shape[-1]
    assert n & (n - 1) == 0
    if n < _DFT_MIN:
        return _ntt_butterfly(a, inverse)
    if n <= _DFT_BASE:
        return _dft_apply_mxu(a, inverse)
    n1 = _DFT_BASE
    n2 = n // n1
    lead = a.shape[1:-1]

    m = a.reshape((4,) + lead + (n2, n1))
    m = jnp.swapaxes(m, -1, -2)                  # [4, .., n1, n2]
    s = ntt_mxu(m, inverse)                      # columns: over i2
    tw = _four_step_twiddles(n, n1, n2, inverse)
    tw = tw.reshape((4,) + (1,) * len(lead) + (n1, n2))
    s = F.mul(s, jnp.broadcast_to(tw, s.shape))
    s = jnp.swapaxes(s, -1, -2)                  # [4, .., n2, n1]
    s = _dft_apply_mxu(s, inverse)               # rows: over i1
    s = jnp.swapaxes(s, -1, -2)
    return s.reshape((4,) + lead + (n,))
