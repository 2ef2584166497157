"""Pre-Merkle (leaf initialization) sub-AIR — reference src/merkle/init/:
four parallel Rescue states hash (pk || balance || nonce) for the old/new
sender and receiver leaves. Width 58, trace length 16 (one transaction cycle).

Quirks replicated from the reference:
  * trace init writes the sender-initial coins/nonce into the *updated* state
    slots before overwriting them (init/trace.rs:27-31), leaving
    SENDER_INITIAL[12..14] zero — masked upstream because the standalone
    example uses all-zero inputs (init/mod.rs:69-71); we do the same.
  * the round function applies at every step with ark[step % 8], i.e. the
    8th "round" uses the all-zero ark row (trace.rs:57-75 + rescue.rs ARK).
  * constraint indices are compacted by -0/-1/-1/-2 shifts (init/air.rs:166-198),
    yielding 56 contiguous degree-3 constraints.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..engine.air import Air, Assertion, ConstraintDegree
from ..ops import field as F, rescue as R
from ..params import data as D
from . import constraints as C

HASH_STATE_WIDTH = 14
AFFINE_POINT_WIDTH = 12
TRACE_WIDTH = 4 * HASH_STATE_WIDTH + 2  # 58
CYCLE = 16

SENDER_INITIAL_POS = 0
SENDER_BIT_POS = 14
SENDER_UPDATED_POS = 15
RECEIVER_INITIAL_POS = 29
RECEIVER_BIT_POS = 43
RECEIVER_UPDATED_POS = 44

_STATE_POS = [SENDER_INITIAL_POS, SENDER_UPDATED_POS,
              RECEIVER_INITIAL_POS, RECEIVER_UPDATED_POS]
_RES_POS = [0, 14, 28, 42]


def init_row(s_inputs, r_inputs, delta):
    """First trace row as ints (mirrors init/trace.rs:18-52, incl. quirk)."""
    state = [0] * TRACE_WIDTH
    state[SENDER_INITIAL_POS:SENDER_INITIAL_POS + 12] = s_inputs[:12]
    state[SENDER_UPDATED_POS + 12] = s_inputs[12]
    state[SENDER_UPDATED_POS + 13] = s_inputs[13]
    state[SENDER_UPDATED_POS:SENDER_UPDATED_POS + 12] = s_inputs[:12]
    state[SENDER_UPDATED_POS + 12] = (s_inputs[12] - delta) % F.P
    state[SENDER_UPDATED_POS + 13] = (s_inputs[13] + 1) % F.P
    state[RECEIVER_INITIAL_POS:RECEIVER_INITIAL_POS + 12] = r_inputs[:12]
    state[RECEIVER_INITIAL_POS + 12] = r_inputs[12]
    state[RECEIVER_INITIAL_POS + 13] = r_inputs[13]
    state[RECEIVER_UPDATED_POS:RECEIVER_UPDATED_POS + 12] = r_inputs[:12]
    state[RECEIVER_UPDATED_POS + 12] = (r_inputs[12] + delta) % F.P
    state[RECEIVER_UPDATED_POS + 13] = r_inputs[13]
    return [v % F.P for v in state]


def build_trace(s_inputs, r_inputs, delta) -> jnp.ndarray:
    """[4, 58, 16] Montgomery limbs."""
    row0 = jnp.asarray(F.from_int(np.array(init_row(s_inputs, r_inputs, delta),
                                           dtype=object)[:, None]))  # [4,58,1]

    # simple unrolled build (CYCLE is tiny)
    rows = [row0]
    st = row0
    for step in range(CYCLE - 1):
        new = st
        for pos in _STATE_POS:
            new = new.at[:, pos:pos + 14].set(R.apply_round(new[:, pos:pos + 14], step))
        st = new
        rows.append(st)
    return jnp.concatenate(rows, axis=-1)


class MerkleInitAir(Air):
    """Public inputs: (s_inputs[14], r_inputs[14], delta)."""

    name = "merkle-init"
    trace_width = TRACE_WIDTH

    def __init__(self, trace_length, pub_inputs, options):
        super().__init__(trace_length, pub_inputs, options)
        self.s_inputs = [int(x) % F.P for x in pub_inputs[0]]
        self.r_inputs = [int(x) % F.P for x in pub_inputs[1]]
        self.delta = int(pub_inputs[2]) % F.P

    def transition_degrees(self):
        return [ConstraintDegree(3) for _ in range(56)]

    def periodic_columns(self):
        cols = []
        for j in range(2 * R.STATE_WIDTH):
            cols.append([D.RESCUE_ARK[i][j] for i in range(R.CYCLE_LENGTH)])
        return np.array(cols, dtype=object)

    def evaluate_transition(self, fx, current, nxt, periodic):
        ark0 = fx.cols(periodic, 0, 14)
        ark1 = fx.cols(periodic, 14, 28)
        outs = []
        for pos in _STATE_POS:
            outs.append(C.rescue_enforce_round(
                fx, fx.cols(current, pos, pos + 14),
                fx.cols(nxt, pos, pos + 14), ark0, ark1))
        return fx.cat1(outs)  # [4, 56, B]

    def assertions(self):
        out = []
        for i in range(14):
            out.append(Assertion(SENDER_INITIAL_POS + i, 0, self.s_inputs[i]))
        for i in range(12):
            out.append(Assertion(SENDER_UPDATED_POS + i, 0, self.s_inputs[i]))
        out.append(Assertion(SENDER_UPDATED_POS + 12, 0,
                             (self.s_inputs[12] - self.delta) % F.P))
        out.append(Assertion(SENDER_UPDATED_POS + 13, 0,
                             (self.s_inputs[13] + 1) % F.P))
        for i in range(14):
            out.append(Assertion(RECEIVER_INITIAL_POS + i, 0, self.r_inputs[i]))
        for i in range(12):
            out.append(Assertion(RECEIVER_UPDATED_POS + i, 0, self.r_inputs[i]))
        out.append(Assertion(RECEIVER_UPDATED_POS + 12, 0,
                             (self.r_inputs[12] + self.delta) % F.P))
        out.append(Assertion(RECEIVER_UPDATED_POS + 13, 0, self.r_inputs[13]))
        return out


class MerkleInitExample:
    """Mirrors init/mod.rs PreMerkleExample (all-zero inputs, delta=1)."""

    def __init__(self, options):
        self.options = options
        self.s_inputs = [0] * 14
        self.r_inputs = [0] * 14
        self.delta = 1
        self.trace = build_trace(self.s_inputs, self.r_inputs, self.delta)

    def pub_inputs(self):
        return (self.s_inputs, self.r_inputs, self.delta)

    def prove(self):
        from ..engine import prover as PR
        air = MerkleInitAir(CYCLE, self.pub_inputs(), self.options)
        return PR.prove(air, build_trace(self.s_inputs, self.r_inputs, self.delta))

    def verify(self, proof, pub_inputs=None):
        from ..engine import verifier as V
        return V.verify(MerkleInitAir, proof, pub_inputs or self.pub_inputs(),
                        expected_options=self.options)
