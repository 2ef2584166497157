"""64-bit range-proof AIR (reference: src/range/): prove that a public field
element decomposes into 63 bits accumulated by double-and-add.

Trace (2 x 64, src/range/prover.rs:65-90): col 0 = bit, col 1 = accumulator;
row 0 = (0, 0); row t+1 carries number-bit[62-t] and acc' = 2*acc + bit'.
Constraints (src/range/air.rs:91-105 + src/utils/field.rs:31-50):
  c0 = is_binary(next.bit), c1 = next.acc - (2*current.acc + next.bit).
Assertions: acc(0) = 0, acc(last) = number.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..engine.air import Air, Assertion, ConstraintDegree
from ..ops import field as F

TRACE_WIDTH = 2
RANGE_LOG = 64


def build_trace(number: int) -> jnp.ndarray:
    """Host-built (tiny) trace: [4, 2, 64] Montgomery limbs."""
    number = int(number)
    if not 0 <= number < F.P:
        # reference parity: field construction panics on value >= modulus and
        # on negative inputs under debug (src/range/tests.rs:54-73)
        raise ValueError(f"range input {number} outside the field [0, p)")
    bits = [(number >> i) & 1 for i in range(RANGE_LOG)]  # LSB first
    col_bit = [0]
    col_acc = [0]
    for t in range(RANGE_LOG - 1):
        b = bits[RANGE_LOG - 2 - t]
        col_bit.append(b)
        col_acc.append((2 * col_acc[-1] + b) % F.P)
    tr = np.array([col_bit, col_acc], dtype=object)
    return jnp.asarray(F.from_int(tr))


class RangeAir(Air):
    """Public input: the number."""

    name = "range"
    trace_width = TRACE_WIDTH

    def __init__(self, trace_length, pub_inputs, options):
        super().__init__(trace_length, pub_inputs, options)
        self.number = int(np.asarray(pub_inputs, dtype=object).ravel()[0]) % F.P

    def transition_degrees(self):
        return [ConstraintDegree(2), ConstraintDegree(1)]

    def periodic_columns(self):
        return None

    def evaluate_transition(self, fx, current, nxt, periodic):
        bit = fx.col(nxt, 0)
        acc_n = fx.col(nxt, 1)
        acc_c = fx.col(current, 1)
        c0 = fx.sub(fx.mul(bit, bit), bit)                       # is_binary
        c1 = fx.sub(acc_n, fx.add(fx.double(acc_c), bit))        # double&add
        return fx.stack([c0, c1], axis=1)

    def assertions(self):
        return [Assertion(1, 0, 0),
                Assertion(1, self.trace_length - 1, self.number)]


class RangeExample:
    """Mirrors src/range/mod.rs RangeProofExample."""

    def __init__(self, number: int, options):
        self.number = int(number)
        self.options = options
        self.trace = build_trace(self.number)  # validates 0 <= number < p

    def prove(self):
        from ..engine import prover as PR
        air = RangeAir(RANGE_LOG, [self.number], self.options)
        # trace rebuilt inside prove, matching the reference (prove = build_trace + engine)
        return PR.prove(air, build_trace(self.number))

    def verify(self, proof, number=None):
        from ..engine import verifier as V
        return V.verify(RangeAir, proof,
                        [self.number if number is None else number],
                        expected_options=self.options)
