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


def ntt(a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Radix-2 NTT along the last axis. a: limb array [4, ..., n] (Montgomery).

    Forward maps coefficients -> evaluations at [w^0..w^(n-1)] (natural order).
    Inverse maps evaluations -> coefficients (includes the 1/n scale).
    """
    n = a.shape[-1]
    assert n & (n - 1) == 0
    if n == 1:
        return a
    logn = n.bit_length() - 1
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
