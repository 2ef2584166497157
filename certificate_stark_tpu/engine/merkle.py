"""Merkle commitment trees built on device, opened/verified on host.

Replaces the reference engine's CPU Merkle commitments (winterfell
`crypto::MerkleTree` used for trace/constraint/FRI commitments; consumed at
src/prover.rs via `Prover::prove`). Leaves are digest columns produced by a
Hasher (engine/hasher.py); every level is computed by one batched merge kernel.
"""
from __future__ import annotations

import numpy as np

_GATHER_LEVELS = None


def _gather_levels(levels, idx_list):
    """Sibling digests from every tree level in one jitted dispatch:
    concat(take(level_i, idx_i)) along the leaf axis. jax.jit caches per
    (level-count, shapes), so repeated proofs of same-shape trees reuse the
    compiled kernel."""
    global _GATHER_LEVELS
    import jax
    import jax.numpy as jnp

    if _GATHER_LEVELS is None:
        def g(lvls, idxs):
            return jnp.concatenate(
                [jnp.take(l, i, axis=-1) for l, i in zip(lvls, idxs)],
                axis=-1)
        _GATHER_LEVELS = jax.jit(g)
    return _GATHER_LEVELS(list(levels), [np.asarray(i) for i in idx_list])


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
        """Authentication paths for many indices with ONE device dispatch and
        ONE device→host transfer for the whole tree (per-level eager gathers
        cost a tunnel roundtrip each — dominant at 42 queries × ~40 levels
        across the trace/composition/FRI trees on remote TPU backends)."""
        return prove_batch_multi([self], [indices])[0]


def prove_batch_multi(trees, indices_list):
    """Authentication paths for several trees in ONE device dispatch + ONE
    transfer (all trees must share a hasher/digest layout). Returns one
    {index: path} dict per tree."""
    assert len(trees) == len(indices_list), \
        f"{len(trees)} trees vs {len(indices_list)} index lists"
    levels, idxs, meta = [], [], []
    for tree, indices in zip(trees, indices_list):
        uniq = sorted({int(i) for i in indices})
        cur = np.asarray(uniq, dtype=np.int64)
        start = len(levels)
        for lvl in tree.levels[:-1]:
            levels.append(lvl)
            idxs.append(cur ^ 1)
            cur = cur >> 1
        meta.append((tree, uniq, start))
    if not levels:
        return [{} for _ in trees]
    offs = np.cumsum([0] + [len(i) for i in idxs])
    sibs = np.asarray(_gather_levels(levels, idxs))
    out = []
    for tree, uniq, start in meta:
        nlev = len(tree.levels) - 1
        paths = {}
        for qi, i in enumerate(uniq):
            paths[i] = [tree.hasher.to_ints(sibs[..., offs[start + li] + qi])
                        for li in range(nlev)]
        out.append(paths)
    return out


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
