"""Memoized jitted kernels shared across prover phases.

Merkle-tree levels across the trace tree, composition tree, and every FRI layer
tree reuse the same (hasher, shape) merge kernels — caching them by shape makes
tree construction O(#distinct shapes) compiles per process instead of
O(#trees * #levels).
"""
from __future__ import annotations

import jax

_CACHE = {}


def merge_kernel(hasher, shape_key):
    key = ("merge", hasher.name, shape_key)
    if key not in _CACHE:
        _CACHE[key] = jax.jit(hasher.merge_pairs)
    return _CACHE[key]


def tree_levels(hasher, leaves):
    """Build all Merkle levels with per-shape cached merge kernels."""
    levels = [leaves]
    cur = leaves
    while cur.shape[-1] > 1:
        cur = merge_kernel(hasher, cur.shape)(cur)
        levels.append(cur)
    return levels


def hash_columns_kernel(hasher, shape_key):
    key = ("hashcols", hasher.name, shape_key)
    if key not in _CACHE:
        _CACHE[key] = jax.jit(hasher.hash_columns)
    return _CACHE[key]


def hash_columns_chunked_kernel(hasher, shape_key, chunk):
    """hash_columns with the leaf axis processed in lax.map segments of
    `chunk` points: bounds the Montgomery->standard conversion and message
    schedule working set to the segment (the full-domain form peaks at
    several GB for a 94 x 2^20 LDE)."""
    import jax.numpy as jnp

    key = ("hashcols_c", hasher.name, shape_key, chunk)
    if key not in _CACHE:
        def fn(cols):
            nch = cols.shape[-1] // chunk
            g = jnp.moveaxis(
                cols.reshape(cols.shape[:-1] + (nch, chunk)), -2, 0)
            leaves = jax.lax.map(hasher.hash_columns, g)  # [nch, D.., chunk]
            out = jnp.moveaxis(leaves, 0, -2)
            return out.reshape(out.shape[:-2] + (-1,))
        _CACHE[key] = jax.jit(fn)
    return _CACHE[key]


def hash_columns_packed_kernel(hasher, shape_key, chunk, bn):
    """hash_columns over a PACKED trace LDE [2, w, bn+tail] (see
    field.pack2 / Prover._pick_pack_lde): per-chunk dynamic_slice + unpack +
    hash, so the 4-limb form only ever exists one chunk at a time. Hashes
    the first `bn` leaves (the wrap tail is excluded)."""
    import jax.numpy as jnp

    from ..ops import field as F

    key = ("hashcols_p", hasher.name, shape_key, chunk, bn)
    if key not in _CACHE:
        nch = bn // chunk

        def fn(packed):
            def body(i):
                blk = jax.lax.dynamic_slice(
                    packed, (0, 0, i * chunk),
                    (2, packed.shape[1], chunk))
                return hasher.hash_columns(F.unpack2(blk))

            leaves = jax.lax.map(body, jnp.arange(nch, dtype=jnp.int32))
            out = jnp.moveaxis(leaves, 0, -2)
            return out.reshape(out.shape[:-2] + (-1,))
        _CACHE[key] = jax.jit(fn)
    return _CACHE[key]
