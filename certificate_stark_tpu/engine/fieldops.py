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
    # measured OFF on XLA:CPU: the dot-reconstruction fp6 mul wins 2x in
    # isolation but loses 5x inside long EC chains (mul_sum's widened
    # intermediates defeat fusion); re-evaluate on real TPU hardware
    fast_f6 = False

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

    @classmethod
    def cat1(cls, parts):
        """Concatenate along the trace-column/constraint axis."""
        return cls.xp.concatenate(parts, axis=1)

    @staticmethod
    def embed(ints):
        """Standard-form int list -> constant element column [4, k, 1]
        (broadcasts over the batch axis)."""
        import numpy as __np
        return F.from_int(__np.array(list(ints), dtype=object))[:, :, None]


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
    fast_f6 = False

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


class HostExtOps:
    """Host-side object-array facade for extension fields.

    Elements are numpy object arrays of tuples (d base coefficients as Python
    ints), layout [1, cols, B] — structurally compatible with the base layout
    [4, cols, B] so the SAME model constraint code evaluates at the single
    out-of-domain point z in the quadratic/cubic options (B is 1 there; speed
    is irrelevant, identical code paths are everything).
    """

    xp = _np

    def __init__(self, degree: int):
        from ..ops import extfield as XF
        self.degree = degree
        d = degree
        z = tuple([0] * d)

        def lift(v):
            return tuple(list(v) + [0] * (d - len(v))) if isinstance(v, tuple) \
                else tuple([int(v)] + [0] * (d - 1))

        self._lift = lift
        self._add = _np.frompyfunc(
            lambda a, b: tuple((x + y) % F.P for x, y in zip(lift(a), lift(b))), 2, 1)
        self._sub = _np.frompyfunc(
            lambda a, b: tuple((x - y) % F.P for x, y in zip(lift(a), lift(b))), 2, 1)
        self._mul = _np.frompyfunc(
            lambda a, b: tuple(XF.host_ext_mul(list(lift(a)), list(lift(b)), d)), 2, 1)
        self._neg = _np.frompyfunc(
            lambda a: tuple((-x) % F.P for x in lift(a)), 1, 1)
        self._inv = _np.frompyfunc(
            lambda a: tuple(XF.host_ext_inv(list(lift(a)), d)), 1, 1)
        self._zero = z

    # element-wise ops
    def add(self, a, b):
        return self._add(a, b)

    def sub(self, a, b):
        return self._sub(a, b)

    def mul(self, a, b):
        return self._mul(a, b)

    def square(self, a):
        return self._mul(a, a)

    def double(self, a):
        return self._add(a, a)

    def neg(self, a):
        return self._neg(a)

    def inv(self, a):
        return self._inv(a)

    # structure
    def const(self, x: int, ndim: int = 1):
        out = _np.empty((1,) + (1,) * ndim, dtype=object)
        out.flat[0] = self._lift(int(x))
        return out

    def embed(self, ints):
        out = _np.empty((1, len(list(ints)), 1), dtype=object)
        for i, v in enumerate(ints):
            out[0, i, 0] = self._lift(int(v))
        return out

    def from_coeffs(self, coeff_lists, shape=(1, -1, 1)):
        """List of d-coefficient lists -> object array column [1, k, 1]."""
        out = _np.empty((1, len(coeff_lists), 1), dtype=object)
        for i, c in enumerate(coeff_lists):
            out[0, i, 0] = self._lift(tuple(int(x) % F.P for x in c))
        return out

    @staticmethod
    def col(arr, i):
        return arr[:, i]

    @staticmethod
    def cols(arr, lo, hi):
        return arr[:, lo:hi]

    def one_mask(self, mask_elem):
        return self._sub(self.const(1, mask_elem.ndim - 1), mask_elem)

    @staticmethod
    def stack(elems, axis=1):
        return _np.stack(elems, axis=axis)

    @classmethod
    def cat(cls, parts, axis=-2):
        return _np.concatenate(parts, axis=axis)

    @classmethod
    def cat1(cls, parts):
        return _np.concatenate(parts, axis=1)

    def zeros_like(self, a):
        out = _np.empty_like(a)
        # fill() stores the d-tuple as one object per cell; plain assignment
        # would broadcast it as a (d,)-shaped array and fail for d > 1
        out.fill(self._zero)
        return out

    # compound crypto ops
    def rescue_mds(self, state):
        from ..params import data as PD
        return self._mds_generic(state, PD.RESCUE_MDS)

    def _mds_generic(self, state, table):
        tbl = table
        out = _np.empty_like(state)
        for i in range(14):
            acc = None
            for j in range(14):
                term = self._mul(state[..., j:j + 1, :], self.const(tbl[i * 14 + j], 2))
                acc = term if acc is None else self._add(acc, term)
            out[..., i:i + 1, :] = acc
        return out

    def rescue_inv_mds(self, state):
        from ..params import data as PD
        return self._mds_generic(state, PD.RESCUE_INV_MDS)

    def sbox3(self, state):
        return self._mul(state, self._mul(state, state))
