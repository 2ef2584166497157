"""ctypes bindings for the native host crypto library (native/libf63.so).

The library accelerates the protocol's host-serial paths (Fiat-Shamir digests,
query-side Merkle path checks, batch field ops in the verifier). Falls back to
the Python implementations transparently when the library isn't built —
`rescue_ref` and friends remain the semantic reference.

Build once with scripts/build_native.sh (gcc; no pybind11 needed).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _try_build(root):
    """Build native/libf63.so in-tree if the compiler is present. Compiled
    binaries are untracked, so a fresh checkout has no .so — without this,
    every cold run silently pays the Python fallbacks (a 2^23-domain
    boundary-table inversion is ~3 h of numpy vs ~1 s of C).
    Disable with CSTARK_NO_NATIVE_BUILD=1."""
    if os.environ.get("CSTARK_NO_NATIVE_BUILD"):
        return
    import subprocess
    script = os.path.join(root, "scripts", "build_native.sh")
    if not os.path.exists(script):
        return
    try:
        subprocess.run(["bash", script], cwd=root, check=True,
                       capture_output=True, timeout=300)
    except Exception:  # noqa: BLE001 — fall back to Python paths
        pass


def lib():
    global _LIB
    if _LIB is None:
        root = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                            "..", ".."))
        path = os.path.join(root, "native", "libf63.so")
        if not os.path.exists(path):
            _try_build(root)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        L = ctypes.CDLL(path)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        L.rescue_digest.argtypes = [u64p, ctypes.c_size_t, u64p]
        L.rescue_merge.argtypes = [u64p, u64p, u64p]
        L.rescue_permutation.argtypes = [u64p]
        L.rescue_verify_path.argtypes = [u64p, ctypes.c_uint64, u64p, u64p,
                                         ctypes.c_size_t]
        L.rescue_verify_path.restype = ctypes.c_int
        L.f63_inv_vec.argtypes = [u64p, u64p, ctypes.c_size_t]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        L.blake3_hash.argtypes = [u8p, ctypes.c_size_t, u8p]
        L.rescue_chain_trace.argtypes = [u64p, ctypes.c_uint64, u64p]
        L.rescue_chain_trace_mont.argtypes = [u64p, ctypes.c_uint64, u64p]
        L.blake3_leaves.argtypes = [u64p, ctypes.c_uint64, ctypes.c_uint64,
                                    u8p]
        L.blake3_merge_level.argtypes = [u8p, ctypes.c_uint64, u8p]
        L.eval_schnorr_air.argtypes = [u64p, u64p, u64p, u64p,
                                       ctypes.c_uint64, u64p, u64p]
        L.eval_merkle_air.argtypes = [u64p, u64p, u64p, u64p, ctypes.c_uint64]
        L.eval_rescue_chain_air.argtypes = [u64p, u64p, u64p, u64p,
                                            ctypes.c_uint64]
        _u32p_t = ctypes.POINTER(ctypes.c_uint32)
        L.transaction_trace.argtypes = [u64p] * 10 + [
            u64p, u64p, ctypes.c_uint64, ctypes.c_uint64, _u32p_t]
        L.ec_mul_gen_batch.argtypes = [u64p, u64p, u64p,
                                       ctypes.c_uint64, u64p]
        L.eval_transaction_air.argtypes = [u64p, u64p, u64p, u64p,
                                           ctypes.c_uint64, u64p, u64p]
        L.f63_ntt_batch.argtypes = [u64p] + [ctypes.c_uint64] * 4
        L.f63_coset_scale_batch.argtypes = [u64p] + [ctypes.c_uint64] * 3
        L.f63_lde_batch.argtypes = [u64p] + [ctypes.c_uint64] * 6 + [u64p, u64p]
        L.f63_intt_coset_batch.argtypes = [u64p] + [ctypes.c_uint64] * 4
        u32p = ctypes.POINTER(ctypes.c_uint32)
        L.f63_compose.argtypes = [u64p, ctypes.c_uint64, ctypes.c_uint64,
                                  ctypes.c_uint64, u64p, u64p, u32p, u64p,
                                  u64p, u64p, u32p, u64p, u64p, u64p, u32p,
                                  ctypes.c_uint64, u64p, u64p, u64p]
        L.f63_deep.argtypes = ([u64p] + [ctypes.c_uint64] * 3 + [u64p,
                               ctypes.c_uint64] + [u64p] * 10)
        L.f63_coeffs_lde_batch.argtypes = [u64p] + [ctypes.c_uint64] * 5 + [u64p]
        L.f63_fri_fold2.argtypes = [u64p, ctypes.c_uint64, ctypes.c_uint64,
                                    u64p, u64p, u64p]
        L.f63_batch_inv.argtypes = [u64p, ctypes.c_uint64, u64p]
        L.f63_powers_mont.argtypes = [ctypes.c_uint64, ctypes.c_uint64, u64p]
        L.f63_ext_nr_mont.restype = ctypes.c_uint64
        assert L.f63_ext_nr_mont() == (3 << 64) % _P, \
            "native tower constants out of sync with params/extensions.py"
        _LIB = L
    return _LIB


def available() -> bool:
    try:
        lib()
        return True
    except (FileNotFoundError, OSError):
        return False


def _arr(vals):
    return np.asarray([int(v) for v in vals], dtype=np.uint64)


def _p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def digest(elements) -> tuple:
    data = _arr(elements)
    out = np.empty(7, dtype=np.uint64)
    lib().rescue_digest(_p(data), len(data), _p(out))
    return tuple(int(v) for v in out)


def merge(d0, d1) -> tuple:
    a, b = _arr(d0), _arr(d1)
    out = np.empty(7, dtype=np.uint64)
    lib().rescue_merge(_p(a), _p(b), _p(out))
    return tuple(int(v) for v in out)


def merge4(d0, d1) -> tuple:
    """2-to-1 merge of TRUNCATED 4-element digests (ops/rescue.merge4
    layout: d0 -> state[0:4], d1 -> state[7:11], zeros elsewhere)."""
    st = np.zeros(14, dtype=np.uint64)
    st[0:4] = np.asarray([int(x) % _P for x in d0], dtype=np.uint64)
    st[7:11] = np.asarray([int(x) % _P for x in d1], dtype=np.uint64)
    lib().rescue_permutation(_p(st))
    return tuple(int(v) for v in st[:4])


_P = 4719772409484279809


def _mont(x: int) -> int:
    return (int(x) << 64) % _P


def eval_air(kind: str, cur: np.ndarray, nxt: np.ndarray,
             per: np.ndarray, n_out: int) -> np.ndarray:
    """Native CPU constraint evaluation (native/air_eval.c).

    cur/nxt: [w, B] and per: [n_per, B] Montgomery u64 (C-contiguous);
    returns evals [n_out, B] Montgomery u64. kind: 'schnorr' |
    'merkle_update' | 'transaction'."""
    B = cur.shape[1]
    cur = np.ascontiguousarray(cur, dtype=np.uint64)
    nxt = np.ascontiguousarray(nxt, dtype=np.uint64)
    per = np.ascontiguousarray(per, dtype=np.uint64)
    out = np.empty((n_out, B), dtype=np.uint64)
    L = lib()
    if kind == "merkle_update":
        L.eval_merkle_air(_p(cur), _p(nxt), _p(per), _p(out),
                          ctypes.c_uint64(B))
        return out
    if kind == "rescue_chain":
        L.eval_rescue_chain_air(_p(cur), _p(nxt), _p(per), _p(out),
                                ctypes.c_uint64(B))
        return out
    from ..models.schnorr import _gen12
    from . import curve as CV
    gen = np.asarray([_mont(v) for v in _gen12()], dtype=np.uint64)
    b3m = np.asarray([_mont(v) for v in CV.B3_LIMBS], dtype=np.uint64)
    fn = L.eval_schnorr_air if kind == "schnorr" else L.eval_transaction_air
    fn(_p(cur), _p(nxt), _p(per), _p(out), ctypes.c_uint64(B), _p(gen),
       _p(b3m))
    return out


def _root_of_unity(n: int) -> int:
    from ..ops import field as F
    return pow(F.GENERATOR, (_P - 1) // n, _P)


def ntt_batch(data: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Batched NTT along the last axis of a Montgomery-u64 array [..., n]
    (native/ntt.c; bit-identical to ops/ntt.py ntt)."""
    n = data.shape[-1]
    out = np.ascontiguousarray(data, dtype=np.uint64).reshape(-1, n).copy()
    root = _root_of_unity(n)
    ninv = 0
    if inverse:
        root = pow(root, _P - 2, _P)
        ninv = pow(n, _P - 2, _P)
    lib().f63_ntt_batch(_p(out), out.shape[0], n,
                        ctypes.c_uint64(root), ctypes.c_uint64(ninv))
    return out.reshape(data.shape)


def lde_batch(evals: np.ndarray, blowup: int, offset: int):
    """Fused trace LDE (iNTT + coset scale + padded NTT) for Montgomery-u64
    rows [..., n] -> (coeffs [..., n], lde [..., blowup*n])."""
    n = evals.shape[-1]
    flat = np.ascontiguousarray(evals, dtype=np.uint64).reshape(-1, n)
    w = flat.shape[0]
    coeffs = np.empty((w, n), dtype=np.uint64)
    out = np.empty((w, blowup * n), dtype=np.uint64)
    lib().f63_lde_batch(_p(flat), w, n, blowup,
                        ctypes.c_uint64(_root_of_unity(n)),
                        ctypes.c_uint64(_root_of_unity(blowup * n)),
                        ctypes.c_uint64(offset), _p(coeffs), _p(out))
    return (coeffs.reshape(evals.shape),
            out.reshape(evals.shape[:-1] + (blowup * n,)))


def intt_coset_batch(data: np.ndarray, offset: int) -> np.ndarray:
    """Evaluations over the size-n offset-coset -> coefficients [..., n]."""
    n = data.shape[-1]
    out = np.ascontiguousarray(data, dtype=np.uint64).reshape(-1, n).copy()
    lib().f63_intt_coset_batch(_p(out), out.shape[0], n,
                               ctypes.c_uint64(_root_of_unity(n)),
                               ctypes.c_uint64(offset))
    return out.reshape(data.shape)


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def coeffs_lde_batch(coeffs: np.ndarray, blowup: int, offset: int):
    """Coefficient rows [..., n] Montgomery -> coset evaluations [..., b*n]."""
    n = coeffs.shape[-1]
    flat = np.ascontiguousarray(coeffs, dtype=np.uint64).reshape(-1, n)
    w = flat.shape[0]
    out = np.empty((w, blowup * n), dtype=np.uint64)
    lib().f63_coeffs_lde_batch(_p(flat), w, n, blowup,
                               ctypes.c_uint64(_root_of_unity(blowup * n)),
                               ctypes.c_uint64(offset), _p(out))
    return out.reshape(coeffs.shape[:-1] + (blowup * n,))


def compose_batch(evals, d, ta, tb, t_adj, xpow, zt_inv, lde,
                  b_col, b_ev, ba, bb, b_start, b_xpow, b_invz) -> np.ndarray:
    """Composition polynomial over the LDE domain (native/deep_compose.c
    f63_compose); all arrays Montgomery u64, C-contiguous. Returns [d, bn]."""
    C, bn = evals.shape
    G = b_xpow.shape[0]
    comp = np.empty((d, bn), dtype=np.uint64)
    lib().f63_compose(_p(evals), C, bn, d, _p(ta), _p(tb), _u32p(t_adj),
                      _p(xpow), _p(zt_inv), _p(lde), _u32p(b_col), _p(b_ev),
                      _p(ba), _p(bb), _u32p(b_start), G, _p(b_xpow),
                      _p(b_invz), _p(comp))
    return comp


def deep_batch(lde, d, h, k, xs, z, zg, zk, ood_z, ood_zg, ood_h,
               g_z, g_zg, g_h) -> np.ndarray:
    """DEEP composition over the LDE domain (native/deep_compose.c f63_deep).
    lde [w, bn]; h [d*k, bn] (coordinate-outer); ood_* coordinate-outer
    [d, w]/[d, k]; g_* element-outer [w, d]/[k, d]. Returns [d, bn]."""
    w, bn = lde.shape
    deep = np.empty((d, bn), dtype=np.uint64)
    lib().f63_deep(_p(lde), w, bn, d, _p(h), k, _p(xs), _p(z), _p(zg),
                   _p(zk), _p(ood_z), _p(ood_zg), _p(ood_h), _p(g_z),
                   _p(g_zg), _p(g_h), _p(deep))
    return deep


def fri_fold2(cur: np.ndarray, xi: np.ndarray, invxs: np.ndarray) -> np.ndarray:
    """One radix-2 FRI fold (native/deep_compose.c f63_fri_fold2).
    cur [d, n] coordinate-outer Montgomery; xi [d]; invxs [n/2]. -> [d, n/2]"""
    d, n = cur.shape
    out = np.empty((d, n // 2), dtype=np.uint64)
    lib().f63_fri_fold2(_p(np.ascontiguousarray(cur)), d, n, _p(xi),
                        _p(invxs), _p(out))
    return out


def batch_inv(a: np.ndarray) -> np.ndarray:
    """Montgomery batch inversion of a u64 Montgomery array (any shape)."""
    flat = np.ascontiguousarray(a, dtype=np.uint64).reshape(-1)
    out = np.empty_like(flat)
    lib().f63_batch_inv(_p(flat), flat.size, _p(out))
    return out.reshape(a.shape)


def powers_mont(base: int, count: int) -> np.ndarray:
    """[base^0 .. base^(count-1)] as u64 Montgomery values (base canonical)."""
    out = np.empty(count, dtype=np.uint64)
    lib().f63_powers_mont(ctypes.c_uint64(int(base) % _P),
                          ctypes.c_uint64(count), _p(out))
    return out


def blake3_commit_levels(cols_mont: np.ndarray) -> list:
    """Batched blake3 leaf hashing + full Merkle levels for Montgomery u64
    columns [k, B]; returns levels as uint32-word arrays [8, m] (the device
    hasher's layout, bit-identical)."""
    import ctypes as ct
    k, B = cols_mont.shape
    cols = np.ascontiguousarray(cols_mont, dtype=np.uint64)
    buf = np.empty(32 * B, dtype=np.uint8)
    u8p = ct.POINTER(ct.c_uint8)
    L = lib()
    L.blake3_leaves(_p(cols), ct.c_uint64(k), ct.c_uint64(B),
                    buf.ctypes.data_as(u8p))
    levels = [np.ascontiguousarray(buf.view("<u4").reshape(B, 8).T)]
    cur = buf
    m = B
    while m > 1:
        nxt = np.empty(32 * (m // 2), dtype=np.uint8)
        L.blake3_merge_level(cur.ctypes.data_as(u8p), ct.c_uint64(m),
                             nxt.ctypes.data_as(u8p))
        levels.append(np.ascontiguousarray(
            nxt.view("<u4").reshape(m // 2, 8).T))
        cur = nxt
        m //= 2
    return levels


def chain_trace(seed7, length: int) -> np.ndarray:
    """Rescue hash-chain trace rows [length*8, 14] u64 standard form
    (the reference bench workload; see native/f63.c rescue_chain_trace)."""
    s = _arr(seed7)
    out = np.empty(length * 8 * 14, dtype=np.uint64)
    lib().rescue_chain_trace(_p(s), length, _p(out))
    return out.reshape(length * 8, 14)


def chain_trace_mont(seed7, length: int) -> np.ndarray:
    """Rescue hash-chain trace, column-major Montgomery [14, length*8]
    (native/air_eval.c rescue_chain_trace_mont) — the limb-view-ready layout."""
    s = _arr(seed7)
    out = np.empty((14, length * 8), dtype=np.uint64)
    lib().rescue_chain_trace_mont(_p(s), length, _p(out))
    return out


def blake3(data: bytes) -> bytes:
    """Full BLAKE3-256 (chunk tree included) of arbitrary bytes."""
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data) if data \
        else (ctypes.c_uint8 * 1)()
    out = (ctypes.c_uint8 * 32)()
    lib().blake3_hash(ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
                      len(data), out)
    return bytes(out)


def verify_path(root, index, leaf, path) -> bool:
    r, lf = _arr(root), _arr(leaf)
    flat = _arr([x for d in path for x in d])
    return bool(lib().rescue_verify_path(_p(r), int(index), _p(lf), _p(flat),
                                         len(path)))


def transaction_trace(init_rows, sibs, path_bits, pkey12, rx6, sbits, hbits,
                      msgch, dbits, gbits, gen12, b3_limbs, depth, T):
    """Native composed-transaction trace (native/air_eval.c transaction_trace;
    reference src/trace.rs:28-142). All inputs standard-form uint64 arrays;
    returns Montgomery 16-bit limb planes [4, 94, T*1024] uint32 — the device
    limb layout (ops/field.py), no host conversion needed."""
    assert depth <= 32
    out = np.empty((4, 94, T * 1024), dtype=np.uint32)
    args = [np.ascontiguousarray(a, dtype=np.uint64)
            for a in (init_rows, sibs, path_bits, pkey12, rx6, sbits, hbits,
                      msgch, dbits, gbits, gen12,
                      [int(v) % _P for v in b3_limbs])]
    lib().transaction_trace(*[_p(a) for a in args],
                            int(depth), int(T),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


def ec_mul_gen_batch(scalars, gen12, b3_limbs):
    """Batch fixed-base k_i*G -> [T][12] standard-form affine limbs
    (native/air_eval.c ec_mul_gen_batch). Scalars must be in [1, group order)
    — the identity is not representable in affine output."""
    T = len(scalars)
    words = np.zeros((T, 4), dtype=np.uint64)
    for i, k in enumerate(scalars):
        k = int(k)
        assert 0 < k < (1 << 256)
        for w in range(4):
            words[i, w] = (k >> (64 * w)) & 0xFFFFFFFFFFFFFFFF
    gen = np.ascontiguousarray(gen12, dtype=np.uint64)
    b3 = np.asarray([int(v) % _P for v in b3_limbs], dtype=np.uint64)
    out = np.empty((T, 12), dtype=np.uint64)
    lib().ec_mul_gen_batch(_p(words), _p(gen), _p(b3), T, _p(out))
    return [[int(v) for v in row] for row in out]
