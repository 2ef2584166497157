"""Merkle commitment trees built on device, opened/verified on host.

Replaces the reference engine's CPU Merkle commitments (winterfell
`crypto::MerkleTree` used for trace/constraint/FRI commitments; consumed at
src/prover.rs via `Prover::prove`). Leaves are digest columns produced by a
Hasher (engine/hasher.py); every level is computed by one batched merge kernel.
"""
from __future__ import annotations

import numpy as np


class MerkleTree:
    def __init__(self, hsh, leaves):
        """leaves: device digest array with the leaf axis last (power of two)."""
        self.hasher = hsh
        n = leaves.shape[-1]
        assert n & (n - 1) == 0, "leaf count must be a power of two"
        self.levels = [leaves]
        cur = leaves
        while cur.shape[-1] > 1:
            cur = hsh.merge_pairs(cur)
            self.levels.append(cur)
        self._root_host = None

    @classmethod
    def from_levels(cls, hsh, levels):
        """Wrap levels already computed inside a jitted phase kernel."""
        obj = cls.__new__(cls)
        obj.hasher = hsh
        obj.levels = list(levels)
        obj._root_host = None
        return obj

    @property
    def depth(self):
        return len(self.levels) - 1

    def root(self) -> tuple:
        if self._root_host is None:
            top = np.asarray(self.levels[-1])
            self._root_host = self.hasher.to_ints(top[..., 0])
        return self._root_host

    def prove(self, index: int) -> list:
        """Authentication path (sibling digests bottom-up) as host int tuples."""
        path = []
        i = index
        for lvl in self.levels[:-1]:
            sib = np.asarray(lvl[..., i ^ 1])
            path.append(self.hasher.to_ints(sib))
            i >>= 1
        return path

    def prove_batch(self, indices) -> dict:
        """Authentication paths for many indices with one device gather per
        tree level (the per-query version costs thousands of tiny transfers)."""
        import jax.numpy as jnp

        uniq = sorted({int(i) for i in indices})
        idx = np.asarray(uniq, dtype=np.int64)
        paths = {i: [] for i in uniq}
        cur = idx
        for lvl in self.levels[:-1]:
            sibs = np.asarray(jnp.take(lvl, jnp.asarray(cur ^ 1), axis=-1))
            for qi, i in enumerate(uniq):
                paths[i].append(self.hasher.to_ints(sibs[..., qi]))
            cur = cur >> 1
        return paths


def verify_path(hsh, root: tuple, index: int, leaf: tuple, path: list) -> bool:
    """Host-side path verification (the verifier's oracle)."""
    cur = tuple(leaf)
    i = index
    for sib in path:
        if i & 1:
            cur = hsh.host_merge(sib, cur)
        else:
            cur = hsh.host_merge(cur, sib)
        i >>= 1
    return tuple(cur) == tuple(root)
