"""The composed Topos state-transition AIR — the flagship model (reference
src/air.rs, src/trace.rs, src/prover.rs, src/constants.rs).

Each transaction occupies a 1024-step window over a 94-wide trace:
  steps 0..510   Merkle update sub-program on cols 0..65
  step  511      Schnorr + range initialization (cols 0..58, 92..94)
  steps 512..1023 Schnorr verification on cols 0..56, with 64-bit range
                 proofs on delta (cols 56..58) and sigma (cols 92..94)
  cols 65..92    copy registers: sender/receiver keys, delta, sigma, nonce

Time-multiplexing happens through periodic 0/1 mask columns gating constraint
families over shared result slots (summed aggregation, 115 slots).

Reference quirks replicated (see SURVEY.md §2d):
  * boundary assertions check only root elements 0 and 1 (air.rs:178-183);
  * the sigma range-check endpoint compares the DELTA registers again
    (air.rs:605-609) — sigma's endpoint equality is not actually enforced;
  * merkle-init constraints overlap merkle-update's at setup (summed).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..engine.air import Air, Assertion, ConstraintDegree
from ..ops import field as F, rescue as R
from ..params import data as D
from ..utils import account_tree as AT
from . import constraints as C
from . import merkle_update as MU
from . import schnorr as SC

TRACE_WIDTH = 94
CYCLE = 1024
N_CONSTRAINTS = 115

S_KEY_COPY, R_KEY_COPY = 65, 77
DELTA_COPY, SIGMA_COPY, NONCE_COPY = 89, 90, 91
DELTA_BIT, DELTA_ACC = 56, 57
SIGMA_BIT, SIGMA_ACC = 92, 93

SENDER_KEY_RES, RECEIVER_KEY_RES = 101, 103
DELTA_COPY_RES, SIGMA_COPY_RES, NONCE_COPY_RES = 105, 106, 107
DELTA_RANGE_RES, SIGMA_RANGE_RES = 108, 109

RANGE_LOG = 64
VALUE_COPY_END = 512 + RANGE_LOG  # 576 (== 512 + max(3*8-1, 64))


def hash_length(depth):
    return 8 * depth + 7


# ---------------------------------------------------------------------------
# trace generation (host ints; device scan/vmap version is the planned
# optimization path for the headline benchmark)
# ---------------------------------------------------------------------------
def tx_rows(t, depth, message, signature):
    """One 1024-row transaction window (mirrors src/trace.rs:28-142)."""
    thl = hash_length(depth)
    pkey12, s_bits, h_bits = SC.build_sig_info(message, signature)
    gen12 = SC._gen12()
    delta = t["delta"]
    sigma = (t["s_old"][12] - delta) % F.P
    delta_bits = [(delta >> i) & 1 for i in range(64)]
    sigma_bits = [(sigma >> i) & 1 for i in range(64)]

    row = [0] * TRACE_WIDTH
    # merkle update init on cols 0..65 (trace.rs:28-53)
    base = row
    base[MU.S_INIT:MU.S_INIT + 14] = [v % F.P for v in t["s_old"]]
    base[MU.S_UPD:MU.S_UPD + 14] = [v % F.P for v in t["s_old"]]
    base[MU.S_UPD + 12] = (t["s_old"][12] - delta) % F.P
    base[MU.S_UPD + 13] = (t["s_old"][13] + 1) % F.P
    base[MU.R_INIT:MU.R_INIT + 14] = [v % F.P for v in t["r_old"]]
    base[MU.R_UPD:MU.R_UPD + 14] = [v % F.P for v in t["r_old"]]
    base[MU.R_UPD + 12] = (t["r_old"][12] + delta) % F.P
    base[MU.PREV_ROOT:MU.PREV_ROOT + 7] = list(t["initial_root"])
    # copy registers (trace.rs:44-53)
    base[S_KEY_COPY:S_KEY_COPY + 12] = [v % F.P for v in t["s_old"][:12]]
    base[R_KEY_COPY:R_KEY_COPY + 12] = [v % F.P for v in t["r_old"][:12]]
    base[DELTA_COPY] = delta % F.P
    base[SIGMA_COPY] = sigma
    base[NONCE_COPY] = t["s_old"][13] % F.P

    rows = [list(row)]
    for step in range(CYCLE - 1):
        row = list(row)
        if step < 511:
            if step < thl:
                MU._auth_update(row, MU.S_INIT, step, t["s_idx"], t["s_path"])
                MU._auth_update(row, MU.R_INIT, step, t["r_idx"], t["r_path"])
            if step == thl - 1:
                row[MU.PREV_ROOT:MU.PREV_ROOT + 7] = row[MU.R_UPD:MU.R_UPD + 7]
        elif step == 511:
            SC.init_sig_state(row, signature[0])
            row[DELTA_BIT] = row[DELTA_ACC] = 0
            row[SIGMA_BIT] = row[SIGMA_ACC] = 0
        else:
            sstep = step - 512
            SC.sig_step(row, sstep, message, pkey12, s_bits, h_bits, gen12)
            if sstep < RANGE_LOG:
                row[DELTA_BIT] = delta_bits[RANGE_LOG - 1 - sstep]
                row[DELTA_ACC] = (2 * row[DELTA_ACC] + row[DELTA_BIT]) % F.P
                row[SIGMA_BIT] = sigma_bits[RANGE_LOG - 1 - sstep]
                row[SIGMA_ACC] = (2 * row[SIGMA_ACC] + row[SIGMA_BIT]) % F.P
        rows.append(row)
    return rows


def build_trace(md, messages) -> jnp.ndarray:
    """Composed trace dispatcher. When prover debug logging is on, emits its
    own 'trace gen' phase span (VERDICT r2: the 1023-step generation scan
    used to hide inside the 'trace LDE' span at scale)."""
    import logging
    import time
    plog = logging.getLogger("certificate_stark_tpu.prover")
    if plog.isEnabledFor(logging.DEBUG):
        import jax
        t0 = time.perf_counter()
        out = _build_trace(md, messages)
        jax.block_until_ready(out)
        plog.debug("%-22s %8.1f ms", "trace gen",
                   (time.perf_counter() - t0) * 1e3)
        return out
    return _build_trace(md, messages)


def _build_trace(md, messages) -> jnp.ndarray:
    import os
    nat = os.environ.get("CSTARK_NATIVE_TRACE")
    if nat != "0":
        # native scalar C per-transaction recurrence under OpenMP
        # (models/trace_native.py) — the production path on the CPU backend
        # (like the reference's rayon fragment fill). NOT the default on
        # accelerators: the finished trace is 4*94*n*4 bytes (1.6 GB at
        # 1024 txs) and the host->device upload dominates — through the
        # axon tunnel it is minutes, while the device scan path uploads
        # only witness-sized inputs. CSTARK_NATIVE_TRACE=1 forces it.
        import jax
        want = nat == "1" or (nat is None
                              and jax.default_backend() == "cpu")
        if want:
            from . import trace_native as TNV
            if TNV.available():
                return TNV.build_trace_native(md, messages)
    if len(md.deltas) > 8:
        use_dev = os.environ.get("CSTARK_DEVICE_TRACE")
        if use_dev is None:
            # default: device scan path on accelerators (the numpy step loop
            # costs minutes there via host round-trips), numpy on XLA:CPU
            # (where the 511-step scan over narrow lanes is slower than the
            # vectorized host loop)
            import jax
            use_dev = "1" if jax.default_backend() != "cpu" else "0"
        if use_dev != "0":
            # production path: one jitted scan/vmap XLA program builds every
            # transaction window simultaneously (models/trace_device.py);
            # output is bit-identical to the host paths (tested)
            from . import trace_device as TD
            return TD.build_trace_device(md, messages)
        # batched numpy path (identical output; see models/trace_np.py)
        from . import trace_np as TN
        return jnp.asarray(TN.build_trace_np(md, messages))
    all_rows = []
    for t, msg, sig in zip(md.tx_dicts(), messages, md.signatures):
        all_rows.extend(tx_rows(t, md.depth, msg, sig))
    arr = np.array(all_rows, dtype=object).T
    return jnp.asarray(F.from_int(arr))


# ---------------------------------------------------------------------------
class TransactionAir(Air):
    """Public inputs: (initial_root[7], final_root[7]); depth via air kwarg."""

    name = "transaction"
    trace_width = TRACE_WIDTH
    native_eval_kind = "transaction"

    def __init__(self, trace_length, pub_inputs, options, depth=15):
        super().__init__(trace_length, pub_inputs, options)
        self.depth = depth
        self.initial_root = [int(x) % F.P for x in pub_inputs[0]]
        self.final_root = [int(x) % F.P for x in pub_inputs[1]]

    def transition_degrees(self):
        c = (CYCLE,)
        cc = (CYCLE, CYCLE)
        deg = []
        deg += [ConstraintDegree(5, cc)] * 6      # 0..6   x(S) + reduce
        deg += [ConstraintDegree(4, cc)] * 12     # 6..18  y,z(S)
        deg += [ConstraintDegree(3, cc)] * 1      # 18
        deg += [ConstraintDegree(5, cc)] * 18     # 19..37 h.P
        deg += [ConstraintDegree(3, cc)] * 1      # 37
        deg += [ConstraintDegree(3, cc)] * 18     # 38..56
        deg += [ConstraintDegree(3, cc)] * 2      # 56,57  (+ delta range)
        deg += [ConstraintDegree(1, c)] * 7       # 58..65 prev root
        deg += [ConstraintDegree(1, c)] * 25      # 65..90 value copies
        deg += [ConstraintDegree(1, c)] * 2       # 90,91
        deg += [ConstraintDegree(2, c)] * 1       # 92 int eq + sigma bit
        deg += [ConstraintDegree(1, c)] * 6       # 93..99
        deg += [ConstraintDegree(1, c)] * 2       # 99..101 prev match
        deg += [ConstraintDegree(1, c)] * 14      # 101..115 copies/ranges
        assert len(deg) == N_CONSTRAINTS
        return deg

    def periodic_columns(self):
        thl = hash_length(self.depth)
        z, o = 0, 1
        setup = [o] + [z] * (CYCLE - 1)
        merkle_mask = [o] * thl + [z] * (CYCLE - thl)
        hash_input = [z] * 7 + [o]
        finish = [z] * (thl - 1) + [o] + [z] * (CYCLE - thl)
        hash_mask = [(o if (i < thl and i % 8 < 7) else z) for i in range(CYCLE)]
        schnorr_mask = [z] * 512 + [o] * 511 + [z]
        scalar_mult = [z] * 512 + [o] * 510 + [z, z]
        doubling = [z] * 512 + [o, z] * 255 + [z, z]
        digest = [[z] * CYCLE for _ in range(4)]
        digest[0][512:512 + 126] = [o] * 126
        digest[1][512 + 126:512 + 254] = [o] * 128
        digest[2][512 + 254:512 + 382] = [o] * 128
        digest[3][512 + 382:512 + 510] = [o] * 128
        schnorr_hash = [z] * 512 + ([o] * 7 + [z]) * 5 + [z] * (512 - 40)
        internal_flags = [[z] * CYCLE for _ in range(4)]
        for k in range(4):
            internal_flags[k][512 + (k + 1) * 8 - 1] = o
        range_step = [z] * 512 + [o] * RANGE_LOG + [z] * (512 - RANGE_LOG)
        range_finish = [z] * (512 + RANGE_LOG - 1) + [o] + [z] * (512 - RANGE_LOG)
        value_copy = [z] + [o] * (VALUE_COPY_END - 1) + [z] * (CYCLE - VALUE_COPY_END)
        cols = [setup, merkle_mask, hash_input, finish, hash_mask,
                schnorr_mask, scalar_mult, doubling] + digest + [schnorr_hash] \
            + internal_flags + [range_step, range_finish, value_copy]
        for j in range(2 * R.STATE_WIDTH):
            cols.append([D.RESCUE_ARK[i][j] for i in range(R.CYCLE_LENGTH)])
        return np.array(cols, dtype=object)

    def evaluate_transition(self, fx, current, nxt, periodic):
        setup = fx.col(periodic, 0)[:, None]
        merkle_mask = fx.col(periodic, 1)[:, None]
        hash_input = fx.col(periodic, 2)[:, None]
        finish = fx.col(periodic, 3)[:, None]
        hash_mask = fx.col(periodic, 4)[:, None]
        schnorr_mask = fx.col(periodic, 5)[:, None]
        scalar_mult = fx.col(periodic, 6)[:, None]
        doubling = fx.col(periodic, 7)[:, None]
        digest_flags = [fx.col(periodic, 8 + i)[:, None] for i in range(4)]
        schnorr_hash = fx.col(periodic, 12)[:, None]
        internal_flags = [fx.col(periodic, 13 + i)[:, None] for i in range(4)]
        range_step = fx.col(periodic, 17)[:, None]
        range_finish = fx.col(periodic, 18)[:, None]
        value_copy = fx.col(periodic, 19)[:, None]
        ark0 = fx.cols(periodic, 20, 34)
        ark1 = fx.cols(periodic, 34, 48)

        one = fx.const(1, current.ndim - 1)
        copy_hash = fx.mul(fx.sub(one, schnorr_hash), schnorr_mask)
        final_flag = fx.mul(fx.sub(one, scalar_mult), schnorr_mask)
        addition = fx.mul(fx.sub(one, doubling), scalar_mult)

        res = [None] * N_CONSTRAINTS

        def agg(idx, val):
            res[idx] = val if res[idx] is None else fx.add(res[idx], val)

        # 1. merkle-init rounds at setup (init/air.rs:166-198; slots 0..56)
        for res_base, pos in ((0, MU.S_INIT), (14, MU.S_UPD),
                              (28, MU.R_INIT), (42, MU.R_UPD)):
            rc = fx.mul(C.rescue_enforce_round(
                fx, fx.cols(current, pos, pos + 14),
                fx.cols(nxt, pos, pos + 14), ark0, ark1), setup)
            for i in range(14):
                agg(res_base + i, rc[:, i])

        # 2. setup value constraints (slots 65..92)
        MU.evaluate_setup_values(fx, current, agg, setup)

        # 3. key/delta/sigma/nonce copy setup + carry (slots 101..108)
        for res_idx, origin, copy_pos in ((SENDER_KEY_RES, MU.S_INIT, S_KEY_COPY),
                                          (RECEIVER_KEY_RES, MU.R_INIT, R_KEY_COPY)):
            st = fx.mul(fx.sub(fx.cols(nxt, copy_pos, copy_pos + 12),
                               fx.cols(current, origin, origin + 12)), setup)
            cp = fx.mul(fx.sub(fx.cols(nxt, copy_pos, copy_pos + 12),
                               fx.cols(current, copy_pos, copy_pos + 12)),
                        value_copy)
            for i in range(12):
                agg(res_idx + i, fx.add(st[:, i], cp[:, i]))
        delta_src = fx.sub(fx.col(current, MU.S_INIT + 12),
                           fx.col(current, MU.S_UPD + 12))
        agg(DELTA_COPY_RES, fx.mul(fx.sub(fx.col(nxt, DELTA_COPY), delta_src),
                                   setup[:, 0]))
        agg(SIGMA_COPY_RES, fx.mul(fx.sub(fx.col(nxt, SIGMA_COPY),
                                          fx.col(current, MU.S_UPD + 12)),
                                   setup[:, 0]))
        agg(NONCE_COPY_RES, fx.mul(fx.sub(fx.col(nxt, NONCE_COPY),
                                          fx.col(current, MU.S_INIT + 13)),
                                   setup[:, 0]))
        for res_idx, copy_pos in ((DELTA_COPY_RES, DELTA_COPY),
                                  (SIGMA_COPY_RES, SIGMA_COPY),
                                  (NONCE_COPY_RES, NONCE_COPY)):
            agg(res_idx, fx.mul(fx.sub(fx.col(nxt, copy_pos),
                                       fx.col(current, copy_pos)),
                                value_copy[:, 0]))

        # 4. merkle auth constraints (slots 0..65, 92..106)
        MU.evaluate_merkle_auth(fx, current, nxt, agg, ark0, ark1,
                                merkle_mask, hash_input, finish, hash_mask)

        # 5. schnorr constraints with copy-register-driven pkey and hash
        #    internal inputs (air.rs:542-583; slots 0..56)
        pkey = fx.cols(nxt, S_KEY_COPY, S_KEY_COPY + 12)
        internal = None
        srcs = [fx.cols(nxt, S_KEY_COPY, S_KEY_COPY + 7),
                fx.cat1([fx.cols(nxt, S_KEY_COPY + 7, S_KEY_COPY + 12),
                         fx.cols(nxt, R_KEY_COPY, R_KEY_COPY + 2)]),
                fx.cols(nxt, R_KEY_COPY + 2, R_KEY_COPY + 9),
                fx.cat1([fx.cols(nxt, R_KEY_COPY + 9, R_KEY_COPY + 12),
                         fx.col(nxt, DELTA_COPY)[:, None],
                         fx.col(nxt, NONCE_COPY)[:, None],
                         fx.zeros_like(fx.cols(nxt, 0, 2))])]
        for k in range(4):
            term = fx.mul(srcs[k], internal_flags[k])
            internal = term if internal is None else fx.add(internal, term)

        SC.evaluate_schnorr(fx, current, nxt, agg, ark0, ark1, doubling,
                            addition, digest_flags, pkey, final_flag,
                            schnorr_hash, copy_hash, internal)

        # 6. range proofs on delta and sigma (air.rs:585-609)
        for acc_pos, bit_pos in ((DELTA_ACC, DELTA_BIT), (SIGMA_ACC, SIGMA_BIT)):
            bit = fx.col(nxt, bit_pos)
            acc = fx.sub(fx.col(nxt, acc_pos),
                         fx.add(fx.double(fx.col(current, acc_pos)), bit))
            agg(acc_pos, fx.mul(acc, range_step[:, 0]))
            agg(bit_pos, fx.mul(fx.sub(fx.mul(bit, bit), bit), range_step[:, 0]))
        # endpoint equalities — note the reference's sigma bug is replicated:
        # both compare the DELTA registers (air.rs:605-609)
        delta_eq = fx.sub(fx.col(nxt, DELTA_ACC), fx.col(nxt, DELTA_COPY))
        agg(DELTA_RANGE_RES, fx.mul(delta_eq, range_finish[:, 0]))
        agg(SIGMA_RANGE_RES, fx.mul(delta_eq, range_finish[:, 0]))

        return fx.stack(res, axis=1)

    def assertions(self):
        last = self.trace_length - 1
        # reference quirk: only root elements 0 and 1 are asserted
        return [Assertion(MU.PREV_ROOT, 0, self.initial_root[0]),
                Assertion(MU.PREV_ROOT + 1, 0, self.initial_root[1]),
                Assertion(MU.PREV_ROOT, last, self.final_root[0]),
                Assertion(MU.PREV_ROOT + 1, last, self.final_root[1])]


class TransactionExample:
    """Mirrors crate-root TransactionExample (src/lib.rs:75-162)."""

    def __init__(self, num_transactions: int, options, depth: int = 15,
                 seed: int = 42):
        from ..utils import witness as W
        self.options = options
        self.depth = depth
        self.md = W.build_random(num_transactions, depth, seed,
                                 with_signatures=True)
        self.messages = [
            W.build_tx_message(self.md.s_old_values[i][:12],
                               self.md.r_old_values[i][:12],
                               self.md.deltas[i], self.md.s_old_values[i][13])
            for i in range(num_transactions)]

    @property
    def trace(self):
        # built on demand, NOT cached: a resident copy would hold
        # 4*94*n*4 bytes of device memory across prove() (which builds its
        # own trace, reference parity) — at 1024 txs that is 1.6 GB of the
        # TPU's HBM budget (see DESIGN.md "2^23-domain memory plan")
        return build_trace(self.md, self.messages)

    def pub_inputs(self):
        return (list(self.md.initial_roots[0]), list(self.md.final_root))

    def prove(self):
        from ..engine import prover as PR
        n = 1024 * len(self.md.deltas)
        air = TransactionAir(n, self.pub_inputs(), self.options, depth=self.depth)
        return PR.prove(air, build_trace(self.md, self.messages))

    def verify(self, proof, pub_inputs=None):
        from ..engine import verifier as V
        return V.verify(TransactionAir, proof, pub_inputs or self.pub_inputs(),
                        air_kwargs={"depth": self.depth},
                        expected_options=self.options)
