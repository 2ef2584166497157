"""Rescue hash-chain AIR — the reference's benchmark workload
(/root/reference/benches/rescue.rs): prove knowledge of a chain of `length`
Rescue63 merges from a public seed to a public result. Trace 14 wide, 8 steps
per merge (7 rounds + 1 copy/reset step).

Statement note: the reference bench's host-side `compute_hash_chain`
(benches/rescue.rs:104-123) chains merge(d, d) while its trace implements
merge(d, ZERO); its verify bench therefore exercises a failing verification.
We implement the self-consistent statement matching the trace: d_{i+1} =
permutation([d_i, 0])[0..7].

TPU design: trace generation is a lax.scan over chain cycles (the chain is
sequentially dependent); each scan body emits its 8 trace rows from fully
vectorized Rescue round kernels. Constraint evaluation is one stacked kernel
over all domain points: forward s-box on `current`, inverse-MDS + forward s-box
on `next` (the reference's enforce_round trick, rescue.rs:269-300, which keeps
the x^(1/3) exponentiation out of the constraint system).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..engine.air import Air, Assertion, ConstraintDegree
from ..ops import field as F, rescue as R
from ..params import data as D

TRACE_WIDTH = 14
CYCLE = R.CYCLE_LENGTH  # 8


def build_trace(seed, chain_length: int) -> jnp.ndarray:
    """seed: 7 ints. Returns Montgomery limb trace [4, 14, 8*chain_length].

    Fast path: the chain is sequentially dependent, so the rows are produced
    by the native C rescue core (utils/native.py) in one call — standard-form
    u64 — and converted to Montgomery limbs with a single device multiply.
    A 1024-link chain builds in ~15 ms vs ~13 s for the device lax.scan
    (tiny-body scans are latency-bound); the scan remains as the fallback.
    """
    assert chain_length & (chain_length - 1) == 0
    from ..utils import native as NAT
    if NAT.available():
        cols = NAT.chain_trace_mont(list(seed), chain_length)  # [14, 8L] Mont
        return jnp.asarray(F.unpack_u64(cols))                 # [4, 14, 8L]
    d0 = jnp.asarray(F.from_int(np.array(list(seed), dtype=object)[:, None]))  # [4,7,1]

    def cycle(d, _):
        state = jnp.concatenate([d, jnp.zeros_like(d)], axis=1)  # [4,14,1]
        rows = [state]
        for r in range(R.NUM_ROUNDS):
            state = R.apply_round(state, r)
            rows.append(state)
        out = jnp.stack(rows, axis=0)          # [8, 4, 14, 1]
        d_next = state[:, :7]
        return d_next, out

    _, ys = jax.lax.scan(cycle, d0, None, length=chain_length)
    # ys: [L, 8, 4, 14, 1] -> [4, 14, L*8]
    tr = ys[..., 0].transpose(2, 3, 0, 1).reshape(4, TRACE_WIDTH, chain_length * CYCLE)
    return tr


def compute_chain_result(seed, chain_length: int):
    """Host helper: final digest ints (the public result)."""
    tr = build_trace(seed, chain_length)
    last = np.asarray(tr[..., -1])
    # last row of cycle c holds the full permutation output; result = first 7
    return [int(v) for v in F.to_int(last)[:7]]


class RescueChainAir(Air):
    """Public inputs: (seed[7], result[7])."""

    name = "rescue-chain"
    trace_width = TRACE_WIDTH
    native_eval_kind = "rescue_chain"

    def __init__(self, trace_length, pub_inputs, options):
        super().__init__(trace_length, pub_inputs, options)
        self.seed = [int(x) for x in pub_inputs[0]]
        self.result = [int(x) for x in pub_inputs[1]]

    def transition_degrees(self):
        return [ConstraintDegree(3, (CYCLE,)) for _ in range(TRACE_WIDTH)]

    def periodic_columns(self):
        # column 0: hash flag (1 on rounds, 0 on the copy step);
        # columns 1..29: ARK columns (column-major), 8th row zero.
        cols = [[1] * 7 + [0]]
        for j in range(2 * R.STATE_WIDTH):
            cols.append([D.RESCUE_ARK[i][j] for i in range(CYCLE)])
        return np.array(cols, dtype=object)

    def evaluate_transition(self, fx, current, nxt, periodic):
        flag = fx.col(periodic, 0)
        ark0 = fx.cols(periodic, 1, 15)         # [.., 14, B]
        ark1 = fx.cols(periodic, 15, 29)

        # rescue round: sbox+mds+ark on current == inv(ark+mds) sbox side of next
        step1 = fx.sbox3(current)
        step1 = fx.rescue_mds(step1)
        step1 = fx.add(step1, ark0)
        step2 = fx.sub(nxt, ark1)
        step2 = fx.rescue_inv_mds(step2)
        step2 = fx.sbox3(step2)
        round_c = fx.sub(step2, step1)          # [.., 14, B]

        copy_flag = fx.one_mask(flag)
        copy_c = fx.cat1([
            fx.sub(fx.cols(nxt, 0, 7), fx.cols(current, 0, 7)),
            fx.cols(nxt, 7, 14),
        ])

        return fx.add(fx.mul(round_c, flag[:, None]),
                      fx.mul(copy_c, copy_flag[:, None]))  # [4, 14, B]

    def assertions(self):
        last = self.trace_length - 1
        return ([Assertion(i, 0, self.seed[i]) for i in range(7)]
                + [Assertion(i, last, self.result[i]) for i in range(7)])


class RescueChainExample:
    """Mirrors the reference example pattern: new -> prove -> verify."""

    def __init__(self, chain_length: int, options):
        self.chain_length = chain_length
        self.options = options
        self.seed = [42, 43, 44, 45, 46, 47, 48]
        self.trace = build_trace(self.seed, chain_length)
        last = np.asarray(self.trace[..., -1])
        self.result = [int(v) for v in F.to_int(last)[:7]]

    def pub_inputs(self):
        return (self.seed, self.result)

    def prove(self):
        from ..engine import prover as PR
        air = RescueChainAir(self.chain_length * CYCLE, self.pub_inputs(), self.options)
        return PR.prove(air, build_trace(self.seed, self.chain_length))

    def verify(self, proof, pub_inputs=None):
        from ..engine import verifier as V
        return V.verify(RescueChainAir, proof, pub_inputs or self.pub_inputs(),
                        expected_options=self.options)
