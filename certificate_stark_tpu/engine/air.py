"""AIR (algebraic intermediate representation) framework.

Counterpart of winterfell's `Air` trait as consumed by the reference
(src/air.rs:40-189, src/schnorr/air.rs:111-227): transition constraints with
declared degrees, periodic columns, and boundary assertions. The crucial
TPU-native difference: `evaluate_transition` is written as a *vectorized batch
evaluation* over all domain points at once (limb arrays [4, width, B]), not a
per-point callback — the whole constraint system becomes one fused XLA kernel.
"""
from __future__ import annotations

import math

from dataclasses import dataclass

import numpy as np

from ..ops import field as F


@dataclass(frozen=True)
class Assertion:
    """T_column(step) == value  (winterfell Assertion::single)."""
    column: int
    step: int
    value: int


@dataclass(frozen=True)
class PeriodicAssertion:
    """T_column(first_step + i*period) == value for all i
    (winterfell Assertion::periodic)."""
    column: int
    first_step: int
    period: int
    value: int


@dataclass(frozen=True)
class SequenceAssertion:
    """T_column(first_step + i*period) == values[i]
    (winterfell Assertion::sequence)."""
    column: int
    first_step: int
    period: int
    values: tuple


@dataclass(frozen=True)
class ConstraintDegree:
    """Degree of a transition constraint: `mult` in the trace polynomials plus
    one periodic factor per entry of `cycles` (winterfell
    TransitionConstraintDegree::with_cycles)."""
    mult: int
    cycles: tuple = ()

    def poly_degree(self, n: int) -> int:
        d = self.mult * (n - 1)
        for c in self.cycles:
            d += n - n // c
        return d


class Air:
    """Subclass per proof statement. Override the marked members."""

    trace_width: int = 0
    name: str = "air"

    def __init__(self, trace_length: int, pub_inputs, options):
        assert trace_length & (trace_length - 1) == 0
        self.trace_length = trace_length
        self.pub_inputs = pub_inputs
        self.options = options

    # -- to override --------------------------------------------------------
    def transition_degrees(self) -> list:
        raise NotImplementedError

    def periodic_columns(self):
        """Int matrix [n_cols, cycle_length] (numpy object / python ints) of
        periodic values per cycle, or None."""
        return None

    def evaluate_transition(self, fx, current, nxt, periodic):
        """Return the list of constraint evaluations.

        current/nxt: element arrays [width] rows each shaped like fx elements
        with trailing batch axes; periodic: same for periodic columns.
        """
        raise NotImplementedError

    def assertions(self) -> list:
        raise NotImplementedError

    def pub_inputs_elements(self) -> list:
        """Field elements absorbed into the Fiat-Shamir seed (flattened)."""
        out = []

        def rec(x):
            if isinstance(x, (list, tuple)):
                for y in x:
                    rec(y)
            elif isinstance(x, np.ndarray):
                for y in x.ravel():
                    rec(y)
            else:
                out.append(int(x))

        rec(self.pub_inputs)
        return out

    # -- provided -----------------------------------------------------------
    def num_transition_constraints(self) -> int:
        return len(self.transition_degrees())

    def ce_blowup(self) -> int:
        """Constraint-evaluation domain blowup k: composition degree = k*n."""
        n = self.trace_length
        k = 1
        for d in self.transition_degrees():
            qd = d.poly_degree(n) - (n - 1)  # after transition zerofier
            while qd + 1 > k * n:
                k *= 2
        assert k <= self.options.blowup, (
            f"constraint degree needs ce blowup {k} > lde blowup {self.options.blowup}")
        return k

    def periodic_values_at(self, x: int) -> list:
        """Host evaluation of each periodic column's polynomial at point x
        (used by the verifier at the OOD point)."""
        cols = self.periodic_columns()
        if cols is None:
            return []
        from ..utils import poly_host as PH
        n = self.trace_length
        out = []
        for col in np.asarray(cols, dtype=object):
            coeffs = PH.intt(list(col))
            out.append(PH.eval_poly(coeffs, pow(x, n // len(col), F.P)))
        return out

    def periodic_lde(self, blowup: int, offset: int) -> np.ndarray:
        """Periodic columns extended to the LDE domain, COMPACT form:
        [4, n_cols, L] with L = blowup * lcm(cycle lengths).

        The column poly is p(x^(n/t)), which has period blowup*t on the
        coset — so one period block carries the whole LDE; consumers tile
        it to their segment (bn // L repeats for the full domain). Keeping
        the compact block instead of the tiled domain saves b*n-scale host
        and device memory (48 cols x 2^23 = 6.4 GB for the 1024-tx
        composed AIR). Returns a concrete numpy limb array."""
        from ..utils import poly_host as PH
        from ..utils import native as NAT
        cols = self.periodic_columns()
        if cols is None:
            return None
        n = self.trace_length
        native = NAT.available()
        lengths = [len(col) for col in cols]
        lcm = 1
        for t in lengths:
            lcm = lcm * t // math.gcd(lcm, t)
        arrs = []
        for col in np.asarray(cols, dtype=object):
            t = len(col)
            o = pow(offset, n // t, F.P)
            if native and blowup * t >= 256:  # tiny cycles: host is cheaper
                u = F.pack_u64(F.from_int(
                    np.array([int(v) % F.P for v in col], dtype=object)
                    .reshape(1, t)))
                ext_l = F.unpack_u64(NAT.lde_batch(u, blowup, o)[1][0])
            else:
                coeffs = PH.intt([int(v) % F.P for v in col])
                scaled = [c * pow(o, i, F.P) % F.P
                          for i, c in enumerate(coeffs)]
                ext = PH.ntt(scaled + [0] * ((blowup - 1) * t))
                ext_l = F.from_int(np.array(ext, dtype=object))
            arrs.append(np.tile(ext_l, lcm // t))
        return np.stack(arrs, axis=1)
