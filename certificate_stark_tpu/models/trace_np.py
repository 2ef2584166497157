"""Vectorized trace generation for the composed state-transition AIR.

The reference fills per-transaction trace fragments with scalar Rust code under
rayon (src/prover.rs:50-96). Here one numpy step-loop advances ALL transaction
windows simultaneously: the state is a limb array [4, 94, T] and each of the
1023 transitions applies batched field kernels (the same `ops/` code that runs
on device, via the numpy namespace). This is also the blueprint for the
device-side lax.scan version (swap the namespace and record with scan).

Produces output identical to models/transaction.tx_rows (tested).
"""
from __future__ import annotations

import numpy as np

from ..engine.fieldops import NP
from ..ops import ecc as E, field as F, rescue as R
from ..utils import curve as CV
from . import merkle_update as MU
from . import schnorr as SC
from . import transaction as TX


def _limbs2(ints_2d) -> np.ndarray:
    """[rows][T] python ints -> [4, rows, T] Montgomery limbs."""
    return F.from_int(np.array(ints_2d, dtype=object))


def _bit_limbs(bits_T: np.ndarray) -> np.ndarray:
    """0/1 int array [T] -> Montgomery limb array [4, T]."""
    one = F.ONE_MONT.reshape(4, 1)
    return np.where(bits_T[None, :] != 0, one, np.uint32(0)).astype(np.uint32)


def build_trace_np(md, messages) -> np.ndarray:
    """TxMetadata + messages -> [4, 94, 1024*T] Montgomery limb trace."""
    depth = md.depth
    thl = TX.hash_length(depth)
    T = len(md.deltas)
    txs = md.tx_dicts()

    # ---- per-transaction witness arrays ----------------------------------
    init_rows = []
    for t, msg, sig in zip(txs, messages, md.signatures):
        row = [0] * TX.TRACE_WIDTH
        delta = t["delta"]
        sigma = (t["s_old"][12] - delta) % F.P
        row[MU.S_INIT:MU.S_INIT + 14] = [v % F.P for v in t["s_old"]]
        row[MU.S_UPD:MU.S_UPD + 14] = [v % F.P for v in t["s_old"]]
        row[MU.S_UPD + 12] = (t["s_old"][12] - delta) % F.P
        row[MU.S_UPD + 13] = (t["s_old"][13] + 1) % F.P
        row[MU.R_INIT:MU.R_INIT + 14] = [v % F.P for v in t["r_old"]]
        row[MU.R_UPD:MU.R_UPD + 14] = [v % F.P for v in t["r_old"]]
        row[MU.R_UPD + 12] = (t["r_old"][12] + delta) % F.P
        row[MU.PREV_ROOT:MU.PREV_ROOT + 7] = list(t["initial_root"])
        row[TX.S_KEY_COPY:TX.S_KEY_COPY + 12] = [v % F.P for v in t["s_old"][:12]]
        row[TX.R_KEY_COPY:TX.R_KEY_COPY + 12] = [v % F.P for v in t["r_old"][:12]]
        row[TX.DELTA_COPY] = delta % F.P
        row[TX.SIGMA_COPY] = sigma
        row[TX.NONCE_COPY] = t["s_old"][13] % F.P
        init_rows.append(row)
    state = _limbs2(np.array(init_rows, dtype=object).T)       # [4, 94, T]

    # merkle siblings / index bits per level
    sibs = {"s": [], "r": []}
    bits = {"s": [], "r": []}
    for lvl in range(depth):
        for side, ikey, pkey in (("s", "s_idx", "s_path"), ("r", "r_idx", "r_path")):
            sibs[side].append(_limbs2(
                np.array([list(t[pkey][lvl + 1]) for t in txs], dtype=object).T))
            bits[side].append(np.array(
                [(t[ikey] >> lvl) & 1 for t in txs], dtype=np.uint32))

    # schnorr witness arrays
    pk_rows, sbit_rows, hbit_rows, rx_rows = [], [], [], []
    for msg, sig in zip(messages, md.signatures):
        pk, s_bits, h_bits = SC.build_sig_info(msg, sig)
        pk_rows.append(pk)
        sbit_rows.append(s_bits)
        hbit_rows.append(h_bits)
        rx_rows.append([int(v) % F.P for v in sig[0]])
    pkey12 = _limbs2(np.array(pk_rows, dtype=object).T)        # [4, 12, T]
    s_bits = np.array(sbit_rows, dtype=np.uint32).T            # [256, T]
    h_bits = np.array(hbit_rows, dtype=np.uint32).T
    rx6 = _limbs2(np.array(rx_rows, dtype=object).T)           # [4, 6, T]
    msg_chunks = [_limbs2(np.array([[int(v) % F.P for v in m[7 * k:7 * k + 7]]
                                    for m in messages], dtype=object).T)
                  for k in range(4)]
    gen12 = np.broadcast_to(
        F.from_int(np.array(SC._gen12(), dtype=object))[:, :, None], (4, 12, T))
    b3 = np.broadcast_to(
        F.from_int(np.array(CV.B3_LIMBS, dtype=object))[:, :, None], (4, 6, T))
    delta_bits = np.array([[(t["delta"] >> i) & 1 for i in range(64)]
                           for t in txs], dtype=np.uint32).T
    sigma_bits = np.array(
        [[(((t["s_old"][12] - t["delta"]) % F.P) >> i) & 1 for i in range(64)]
         for t in txs], dtype=np.uint32).T

    out = np.empty((4, TX.TRACE_WIDTH, T, TX.CYCLE), dtype=np.uint32)
    out[..., 0] = state

    def clusters_round(st, step):
        stk = np.stack([st[:, MU.S_INIT:MU.S_INIT + 14],
                        st[:, MU.S_UPD:MU.S_UPD + 14],
                        st[:, MU.R_INIT:MU.R_INIT + 14],
                        st[:, MU.R_UPD:MU.R_UPD + 14]], axis=1)  # [4,4,14,T]
        stk = R.apply_round(stk, step, xp=np)
        st[:, MU.S_INIT:MU.S_INIT + 14] = stk[:, 0]
        st[:, MU.S_UPD:MU.S_UPD + 14] = stk[:, 1]
        st[:, MU.R_INIT:MU.R_INIT + 14] = stk[:, 2]
        st[:, MU.R_UPD:MU.R_UPD + 14] = stk[:, 3]

    def inject(st, base, sib, bit):
        """Sibling injection for one cluster pair (update/trace.rs:96-136)."""
        b = bit[None, None, :] != 0
        for reg in (base, base + 15):
            digest = st[:, reg:reg + 7].copy()
            st[:, reg + 7:reg + 14] = np.where(b, digest, sib)
            st[:, reg:reg + 7] = np.where(b, sib, digest)
        st[:, base + 14] = _bit_limbs(bit)

    for step in range(TX.CYCLE - 1):
        if step < 511:
            if step < thl:
                cyc, pos = divmod(step, 8)
                if pos < 7:
                    clusters_round(state, step)
                else:
                    inject(state, MU.S_INIT, sibs["s"][cyc], bits["s"][cyc])
                    inject(state, MU.R_INIT, sibs["r"][cyc], bits["r"][cyc])
            if step == thl - 1:
                state[:, MU.PREV_ROOT:MU.PREV_ROOT + 7] = \
                    state[:, MU.R_UPD:MU.R_UPD + 7]
        elif step == 511:
            state[:, 0:58] = 0
            state[:, SC.PCW] = F.ONE_MONT[:, None]
            state[:, SC.PPW + 1 + SC.PCW] = F.ONE_MONT[:, None]
            state[:, 42:48] = rx6
            state[:, TX.SIGMA_BIT] = 0
            state[:, TX.SIGMA_ACC] = 0
        else:
            sstep = step - 512
            # hash lane
            if sstep < 40:
                pos = sstep % 8
                if pos < 7:
                    state[:, 42:56] = R.apply_round(state[:, 42:56], sstep, xp=np)
                elif sstep < 32:
                    state[:, 49:56] = msg_chunks[sstep // 8]
                else:
                    state[:, 49:56] = 0
            # scalar-mul lane
            if sstep < SC.SCALAR_MUL_LENGTH:
                real = sstep // 2
                chunk = 0 if real < 63 else (real - 63) // 64 + 1
                sb = s_bits[254 - real]
                hb = h_bits[254 - real]
                state[:, SC.PPW] = _bit_limbs(sb)
                state[:, 2 * SC.PPW + 1] = _bit_limbs(hb)
                if sstep % 2 == 0:
                    pts = np.stack([state[:, 0:18], state[:, 19:37]], axis=1)
                    dbl = E.compute_double(NP, pts, b3[:, None])
                    state[:, 0:18] = dbl[:, 0]
                    state[:, 19:37] = dbl[:, 1]
                    vp = 41 - chunk
                    state[:, vp] = F.add(
                        F.add(state[:, vp], state[:, vp], np),
                        state[:, 37], np)
                else:
                    added = E.compute_add_mixed(NP, state[:, 0:18], gen12, b3)
                    sel = (sb[None, None, :] != 0)
                    state[:, 0:18] = np.where(sel, added, state[:, 0:18])
                    added2 = E.compute_add_mixed(NP, state[:, 19:37], pkey12, b3)
                    sel2 = (hb[None, None, :] != 0)
                    state[:, 19:37] = np.where(sel2, added2, state[:, 19:37])
            elif sstep == SC.SCALAR_MUL_LENGTH:
                hp = state[:, 19:37].copy()
                state[:, SC.PPW] = F.ONE_MONT[:, None]
                added = E.compute_add(NP, state[:, 0:18], hp, b3)
                state[:, 0:18] = added
                zinv = E.f6_inv(NP, state[:, 12:18])
                state[:, 0:6] = E.f6_mul(NP, state[:, 0:6], zinv)
            # range lane
            if sstep < TX.RANGE_LOG:
                db = delta_bits[TX.RANGE_LOG - 1 - sstep]
                sg = sigma_bits[TX.RANGE_LOG - 1 - sstep]
                state[:, TX.DELTA_BIT] = _bit_limbs(db)
                state[:, TX.DELTA_ACC] = F.add(
                    F.add(state[:, TX.DELTA_ACC], state[:, TX.DELTA_ACC], np),
                    state[:, TX.DELTA_BIT], np)
                state[:, TX.SIGMA_BIT] = _bit_limbs(sg)
                state[:, TX.SIGMA_ACC] = F.add(
                    F.add(state[:, TX.SIGMA_ACC], state[:, TX.SIGMA_ACC], np),
                    state[:, TX.SIGMA_BIT], np)
        out[..., step + 1] = state

    # [4, 94, T, 1024] -> [4, 94, T*1024] (transaction-major windows)
    return out.reshape(4, TX.TRACE_WIDTH, T * TX.CYCLE)
