"""Field-ops facade used by AIR constraint evaluators.

Constraint code is written once against this interface and runs both:
  * vectorized over the whole LDE domain in the base field (the hot path), and
  * at the single out-of-domain point z in the extension field (quadratic/cubic
    options of the reference, src/tests.rs:40-54) — same code, different ops.

Base elements are limb arrays [4, *S]; extension elements carry an extra
trailing-degree axis handled by the ext facade (engine/extension.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import field as F


class BaseFieldOps:
    degree = 1
    xp = jnp

    add = staticmethod(F.add)
    sub = staticmethod(F.sub)
    mul = staticmethod(F.mul)
    square = staticmethod(F.square)
    neg = staticmethod(F.neg)
    double = staticmethod(F.double)
    inv = staticmethod(F.inv)

    @staticmethod
    def const(x: int, ndim: int = 1):
        return F.broadcast_const(x, ndim)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def stack(elems, axis=1):
        return jnp.stack(elems, axis=axis)

    @classmethod
    def cat(cls, parts, axis=-2):
        return cls.xp.concatenate(parts, axis=axis)

    # -- structure accessors (limbs axis 0, data axes after) ---------------
    @staticmethod
    def col(arr, i):
        """Select trace column i from a frame array [4, w, B] -> [4, B]."""
        return arr[:, i]

    @staticmethod
    def cols(arr, lo, hi):
        return arr[:, lo:hi]

    @staticmethod
    def one_mask(mask_elem):
        """1 - x for 0/1 flag columns (reference utils `not`, mod.rs:44-46)."""
        return F.sub(F.broadcast_const(1, mask_elem.ndim - 1), mask_elem)

    # -- compound crypto ops (ext facade overrides with tower versions) ----
    @staticmethod
    def rescue_mds(state):
        """Rescue MDS layer on a stacked state [4, 14, B]."""
        from ..ops import rescue as R
        return R.mds_apply(state)

    @staticmethod
    def rescue_inv_mds(state):
        from ..ops import rescue as R
        return R.mds_apply(state, R.INV_MDS)

    @staticmethod
    def sbox3(state):
        """x -> x^3 elementwise."""
        return F.mul(state, F.square(state))


BASE = BaseFieldOps()


import numpy as _np  # noqa: E402


class NPFieldOps(BaseFieldOps):
    """Host-numpy twin of BaseFieldOps: same semantics on concrete arrays.

    Used for vectorized witness/trace generation (batched across transactions)
    without touching the device or paying jit compiles."""

    degree = 1
    xp = _np

    add = staticmethod(lambda a, b: F.add(a, b, _np))
    sub = staticmethod(lambda a, b: F.sub(a, b, _np))
    mul = staticmethod(lambda a, b: F.mul(a, b, _np))
    square = staticmethod(lambda a: F.square(a, _np))
    neg = staticmethod(lambda a: F.neg(a, _np))
    double = staticmethod(lambda a: F.add(a, a, _np))
    inv = staticmethod(lambda a: F.inv(a, _np))

    @staticmethod
    def const(x: int, ndim: int = 1):
        return F.np_const(x).reshape((4,) + (1,) * ndim)

    @staticmethod
    def zeros_like(a):
        return _np.zeros_like(a)

    @staticmethod
    def stack(elems, axis=1):
        return _np.stack(elems, axis=axis)

    @staticmethod
    def rescue_mds(state):
        from ..ops import rescue as R
        return R.mds_apply(state, xp=_np)

    @staticmethod
    def rescue_inv_mds(state):
        from ..ops import rescue as R
        return R.mds_apply(state, R.INV_MDS, xp=_np)

    @staticmethod
    def sbox3(state):
        return F.mul(state, F.square(state, _np), _np)


NP = NPFieldOps()
