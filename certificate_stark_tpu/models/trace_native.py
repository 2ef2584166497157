"""Host-native composed-transaction trace generation.

Thin marshalling layer over native/air_eval.c `transaction_trace` (OpenMP
scalar C mirroring models/trace_np.py step-for-step; reference
src/trace.rs:28-142, src/prover.rs:37-98). Trace generation is a sequential
per-transaction recurrence — scalar host code territory, like the reference's
rayon fragments — and this path is ~50x the vectorized numpy builder and
~1000x the XLA:CPU scan. Output is bit-identical to the other builders
(tests/test_trace_native.py).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import field as F
from ..utils import curve as CV
from . import schnorr as SC
from . import transaction as TX


def available() -> bool:
    from ..utils import native as NAT
    return NAT.available()


def build_trace_native(md, messages) -> jnp.ndarray:
    from ..utils import native as NAT
    depth = md.depth
    T = len(md.deltas)
    txs = md.tx_dicts()

    init_rows = np.zeros((T, TX.TRACE_WIDTH), dtype=np.uint64)
    sibs = np.zeros((T, 2, depth, 7), dtype=np.uint64)
    path_bits = np.zeros((T, 2, depth), dtype=np.uint64)
    pkey12 = np.zeros((T, 12), dtype=np.uint64)
    rx6 = np.zeros((T, 6), dtype=np.uint64)
    sbits = np.zeros((T, 256), dtype=np.uint64)
    hbits = np.zeros((T, 256), dtype=np.uint64)
    msgch = np.zeros((T, 4, 7), dtype=np.uint64)
    dbits = np.zeros((T, 64), dtype=np.uint64)
    gbits = np.zeros((T, 64), dtype=np.uint64)

    for ti, (t, msg, sig) in enumerate(zip(txs, messages, md.signatures)):
        delta = t["delta"]
        sigma = (t["s_old"][12] - delta) % F.P
        row = init_rows[ti]
        row[0:14] = [v % F.P for v in t["s_old"]]
        row[15:29] = [v % F.P for v in t["s_old"]]
        row[15 + 12] = (t["s_old"][12] - delta) % F.P
        row[15 + 13] = (t["s_old"][13] + 1) % F.P
        row[29:43] = [v % F.P for v in t["r_old"]]
        row[44:58] = [v % F.P for v in t["r_old"]]
        row[44 + 12] = (t["r_old"][12] + delta) % F.P
        row[58:65] = list(t["initial_root"])
        row[TX.S_KEY_COPY:TX.S_KEY_COPY + 12] = [v % F.P
                                                 for v in t["s_old"][:12]]
        row[TX.R_KEY_COPY:TX.R_KEY_COPY + 12] = [v % F.P
                                                 for v in t["r_old"][:12]]
        row[TX.DELTA_COPY] = delta % F.P
        row[TX.SIGMA_COPY] = sigma
        row[TX.NONCE_COPY] = t["s_old"][13] % F.P

        for si, (ikey, pkey) in enumerate((("s_idx", "s_path"),
                                           ("r_idx", "r_path"))):
            for lvl in range(depth):
                sibs[ti, si, lvl] = [int(v) % F.P for v in t[pkey][lvl + 1]]
                path_bits[ti, si, lvl] = (t[ikey] >> lvl) & 1

        pk, s_b, h_b = SC.build_sig_info(msg, sig)
        pkey12[ti] = pk
        sbits[ti] = s_b
        hbits[ti] = h_b
        rx6[ti] = [int(v) % F.P for v in sig[0]]
        for c in range(4):
            msgch[ti, c] = [int(v) % F.P for v in msg[7 * c:7 * c + 7]]
        dbits[ti] = [(delta >> i) & 1 for i in range(64)]
        gbits[ti] = [(sigma >> i) & 1 for i in range(64)]

    gen12 = np.asarray(SC._gen12(), dtype=np.uint64)
    limbs = NAT.transaction_trace(init_rows, sibs, path_bits, pkey12, rx6,
                                  sbits, hbits, msgch, dbits, gbits, gen12,
                                  CV.B3_LIMBS, depth, T)
    return jnp.asarray(limbs)
