"""Shared constraint evaluators used by the sub-AIRs (generic over the field
facade fx, so they run vectorized on the LDE domain and at the OOD point)."""
from __future__ import annotations


def rescue_enforce_round(fx, cur, nxt, ark0, ark1):
    """Rescue round constraint on stacked states [.., 14, B]
    (reference src/utils/rescue.rs:269-300): forward half-round from `cur`
    must equal the inverted second half-round of `nxt`.

    ark0/ark1: first/second half round-constant columns [.., 14, B].
    Returns unflagged constraint values [.., 14, B].
    """
    step1 = fx.sbox3(cur)
    step1 = fx.rescue_mds(step1)
    step1 = fx.add(step1, ark0)
    step2 = fx.sub(nxt, ark1)
    step2 = fx.rescue_inv_mds(step2)
    step2 = fx.sbox3(step2)
    return fx.sub(step2, step1)


def double_and_add(fx, acc_cur, acc_nxt, bit_nxt):
    """acc' == 2*acc + bit' (reference src/utils/field.rs:31-50).
    Returns (acc_constraint, binary_constraint)."""
    c_acc = fx.sub(acc_nxt, fx.add(fx.double(acc_cur), bit_nxt))
    c_bit = fx.sub(fx.mul(bit_nxt, bit_nxt), bit_nxt)
    return c_acc, c_bit
