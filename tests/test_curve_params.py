"""Order/generator verification of both Cheetah-f63 curve instances and the
reference-strength (fp2) Schnorr path.

The reference's Cheetah scalar field is ~254 bits (ecc.rs:23-45,
schnorr/mod.rs:197-245); the fp2 instance's 245-bit prime scalar field gives
~2^122 generic-DL security, the same class as the reference's ~2^127.
"""
import random

import pytest

from certificate_stark_tpu.params.data import P
from certificate_stark_tpu.utils import curve as CV
from certificate_stark_tpu.utils import field_ref as FR


def _is_probable_prime(n, rounds=40):
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    rg = random.Random(0xC0FFEE ^ n)
    for _ in range(rounds):
        a = rg.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


@pytest.fixture(params=["subfield", "fp2"])
def curve_name(request):
    prev = CV.CURVE_NAME
    CV.set_curve(request.param)
    yield request.param
    CV.set_curve(prev)


def test_instance_verified(curve_name):
    # scalar field is prime and divides the curve order
    assert _is_probable_prime(CV.SCALAR_Q)
    assert CV.COFACTOR * CV.SCALAR_Q == CV.N6
    # generator is on the curve and has order exactly q
    G = CV.generator()
    assert CV.on_curve(G)
    assert CV.mul(CV.SCALAR_Q, G) is None
    # q is large enough that small-subgroup checks matter: G != identity and
    # no tiny order (q prime + q*G = O already implies order q)
    assert CV.mul(2, G) is not None


def test_fp2_is_reference_strength():
    prev = CV.CURVE_NAME
    try:
        CV.set_curve("fp2")
        assert CV.SCALAR_Q.bit_length() >= 240  # ~2^120+ generic DL
        # b genuinely lives in fp2 \ fp (limb layout [c0, c1*u, ...])
        assert CV.B_LIMBS[1] != 0 and all(v == 0 for v in CV.B_LIMBS[2:])
        assert CV.B3_LIMBS == [(3 * v) % P for v in CV.B_LIMBS]
    finally:
        CV.set_curve(prev)


def test_fp2_schnorr_sign_verify():
    prev = CV.CURVE_NAME
    try:
        CV.set_curve("fp2")
        rng = random.Random(42)
        skey = rng.randrange(1, CV.SCALAR_Q)
        pk12 = CV.pkey_coords(skey)
        msg = list(pk12) + [rng.randrange(P) for _ in range(16)]
        sig = CV.sign(msg, skey, rng)
        assert CV.verify_signature(msg, sig)
        # tampered message rejected
        bad = list(msg)
        bad[13] = (bad[13] + 1) % P
        assert not CV.verify_signature(bad, sig)
    finally:
        CV.set_curve(prev)


def test_set_curve_switches_consistently():
    prev = CV.CURVE_NAME
    try:
        CV.set_curve("fp2")
        b3_fp2 = list(CV.B3_LIMBS)
        g_fp2 = CV.generator()
        CV.set_curve("subfield")
        assert CV.B3_LIMBS != b3_fp2
        assert CV.generator() != g_fp2
        assert CV.on_curve(CV.generator())
        # comb-table cache is per-instance: fixed-base mul matches the
        # affine reference after a switch
        k = 123456789
        assert CV.mul_gen(k)[:6] == FR.f6_to_limbs(
            CV.mul(k, CV.generator())[0])
        CV.set_curve("fp2")
        assert CV.mul_gen(k)[:6] == FR.f6_to_limbs(
            CV.mul(k, CV.generator())[0])
    finally:
        CV.set_curve(prev)
