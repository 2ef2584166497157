"""Cheetah-f63 curve host utilities: point arithmetic over fp6, Schnorr
sign/verify, witness-side scalar ops.

Curve form (derived from reference src/utils/ecc.rs, see DESIGN.md):
    E: y^2 = x^3 + x + b   over fp6 = fp2[v]/(v^3+v+1), fp2 = fp[u]/(u^2-2u-2)
The reference instance's b lives in fp6 with an unrecoverable group order
(fork-only: ecc.rs:23-45 gives no order and the fork is unfetchable here), so
the framework carries its own order-verified instances, selected by
CSTARK_CURVE (or set_curve()):

  * "fp2"      (default) b = 5 + 29u in F_p2 (params/curve_fp2.py): 245-bit
               prime scalar field, ~2^122 generic-DL security — the
               reference-strength instance (its ~254-bit Scalar gives ~2^127).
  * "subfield" b = 57 in F_p (params/curve_subfield.py): 125-bit prime scalar
               field — kept for fast tests.

The in-circuit formulas and trace layout are identical across instances; only
the curve constant b (hence b3 = 3b) and the generator differ.
"""
from __future__ import annotations

import os

from . import field_ref as FR
from . import rescue_ref as RR
from ..params.data import P


def _load(name: str) -> dict:
    if name == "subfield":
        from ..params import curve_subfield as M
        from ..params import curve_subfield_gen as G
        b_limbs = [M.B0, 0, 0, 0, 0, 0]
    elif name == "fp2":
        from ..params import curve_fp2 as M
        G = M
        b_limbs = list(M.B_LIMBS)
    else:
        raise ValueError(f"unknown curve instance {name!r} "
                         "(choices: fp2, subfield)")
    return dict(name=name, b_limbs=b_limbs, scalar_q=M.SCALAR_Q, n6=M.N6,
                cofactor=M.COFACTOR, gen12=list(G.GX) + list(G.GY))


def set_curve(name: str) -> None:
    """Select the curve instance; rebinds module globals and invalidates
    curve-derived caches (comb tables, prover phase cache via CURVE_NAME)."""
    global CURVE_NAME, B_LIMBS, SCALAR_Q, N6, COFACTOR, GEN12, B6, B3_LIMBS
    inst = _load(name)
    CURVE_NAME = inst["name"]
    B_LIMBS = inst["b_limbs"]
    SCALAR_Q = inst["scalar_q"]
    N6 = inst["n6"]
    COFACTOR = inst["cofactor"]
    GEN12 = inst["gen12"]
    B6 = FR.f6_from_limbs(B_LIMBS)
    B3_LIMBS = [(3 * v) % P for v in B_LIMBS]  # in-circuit b3 constant


A6 = FR.f6_scalar(1)
set_curve(os.environ.get("CSTARK_CURVE", "fp2"))


# ---- affine point ops (None = infinity) -----------------------------------
def on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    lhs = FR.f6_mul(y, y)
    rhs = FR.f6_add(FR.f6_add(FR.f6_mul(x, FR.f6_mul(x, x)), x), B6)
    return lhs == rhs


def add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if FR.f6_is_zero(FR.f6_add(y1, y2)):
            return None
        num = FR.f6_add(FR.f6_mul(FR.f6_scalar(3), FR.f6_mul(x1, x1)), A6)
        den = FR.f6_inv(FR.f6_mul(FR.f6_scalar(2), y1))
    else:
        num = FR.f6_sub(y2, y1)
        den = FR.f6_inv(FR.f6_sub(x2, x1))
    lam = FR.f6_mul(num, den)
    x3 = FR.f6_sub(FR.f6_sub(FR.f6_mul(lam, lam), x1), x2)
    y3 = FR.f6_sub(FR.f6_mul(lam, FR.f6_sub(x1, x3)), y1)
    return (x3, y3)


def mul(k: int, pt):
    r = None
    k = int(k)
    while k:
        if k & 1:
            r = add(r, pt)
        pt = add(pt, pt)
        k >>= 1
    return r


def generator():
    return (FR.f6_from_limbs(GEN12[:6]), FR.f6_from_limbs(GEN12[6:]))


def mul_gen(k: int) -> list:
    """Fixed-base k*G -> affine 12 limbs, via the comb table
    (utils/curve_batch.py) — ~60x faster than the affine double-and-add."""
    from . import curve_batch as CB
    return CB.batch_mul_gen([k])[0]


def pkey_coords(skey: int) -> list:
    """Affine (x||y) 12 limbs of skey*G."""
    return mul_gen(skey)


# ---- Schnorr (reference src/schnorr/mod.rs:197-288) ------------------------
def hash_message(r_x6, message28) -> list:
    """h = iterated Rescue hash of (R_x || message), 7 elements."""
    try:
        from . import native as NAT
        if NAT.available():
            h = list(NAT.digest(list(r_x6)))
            for i in range(4):
                h = list(NAT.merge(h, list(message28[7 * i:7 * i + 7])))
            return h
    except Exception:  # noqa: BLE001 — fall back to the Python oracle
        pass
    h = RR.digest(list(r_x6))
    for i in range(4):
        h = RR.merge(h, list(message28[7 * i:7 * i + 7]))
    return h


def h_to_scalar_bits(h7) -> list:
    """255 bits from the first 4 digest limbs' 8-byte LE serialization
    (schnorr/mod.rs:205-213 + trace bit usage)."""
    byts = b"".join(int(x).to_bytes(8, "little") for x in h7[:4])
    v = int.from_bytes(byts, "little")
    return [(v >> i) & 1 for i in range(256)]


def sign(message28, skey: int, rng) -> tuple:
    r = rng.randrange(1, SCALAR_Q)
    r12 = mul_gen(r)
    R = (FR.f6_from_limbs(r12[:6]), FR.f6_from_limbs(r12[6:]))
    h = hash_message(FR.f6_to_limbs(R[0]), message28)
    h_scalar = int.from_bytes(
        b"".join(int(x).to_bytes(8, "little") for x in h[:4]), "little") % SCALAR_Q
    s = (r - skey * h_scalar) % SCALAR_Q
    return (FR.f6_to_limbs(R[0]), s)


def verify_signature(message28, signature) -> bool:
    r_x, s = signature
    pk = (FR.f6_from_limbs(message28[0:6]), FR.f6_from_limbs(message28[6:12]))
    assert on_curve(pk)
    h = hash_message(list(r_x), message28)
    h_scalar = int.from_bytes(
        b"".join(int(x).to_bytes(8, "little") for x in h[:4]), "little") % SCALAR_Q
    R = add(mul(s, generator()), mul(h_scalar, pk))
    return R is not None and FR.f6_to_limbs(R[0]) == list(r_x)
