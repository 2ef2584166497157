"""NTT/LDE vs naive Python-int polynomial evaluation."""
import numpy as np
import jax
import jax.numpy as jnp

from certificate_stark_tpu.ops import field as F, ntt as NTT
from certificate_stark_tpu.utils import field_ref as FR

rng = np.random.default_rng(11)


def naive_eval(coeffs, xs):
    out = []
    for x in xs:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % F.P
        out.append(acc)
    return out


def test_ntt_matches_naive():
    n = 32
    coeffs = [int(x) for x in rng.integers(0, F.P, size=n, dtype=np.uint64)]
    w = NTT.root_of_unity(n)
    xs = [pow(w, i, F.P) for i in range(n)]
    exp = naive_eval(coeffs, xs)
    got = F.to_int(np.asarray(NTT.ntt(jnp.asarray(F.from_int(coeffs)))))
    assert list(got) == exp


def test_intt_roundtrip():
    n = 64
    vals = [int(x) for x in rng.integers(0, F.P, size=n, dtype=np.uint64)]
    a = jnp.asarray(F.from_int(vals))
    back = NTT.ntt(NTT.intt(a))
    assert list(F.to_int(np.asarray(back))) == vals


def test_ntt_batched_and_jitted():
    n, b = 16, 3
    vals = rng.integers(0, F.P, size=(b, n), dtype=np.uint64)
    a = jnp.asarray(F.from_int(vals))
    got = np.asarray(jax.jit(NTT.ntt)(a))
    w = NTT.root_of_unity(n)
    xs = [pow(w, i, F.P) for i in range(n)]
    for row in range(b):
        exp = naive_eval([int(v) for v in vals[row]], xs)
        assert list(F.to_int(got[:, row])) == exp


def test_lde_coset():
    n, blowup = 16, 4
    vals = [int(x) for x in rng.integers(0, F.P, size=n, dtype=np.uint64)]
    a = jnp.asarray(F.from_int(vals))
    offset = F.GENERATOR
    ext = NTT.lde(a, blowup, offset)
    # the extension evaluated on the coset must interpolate the same polynomial
    coeffs = [int(c) for c in F.to_int(np.asarray(NTT.intt(a)))]
    w_big = NTT.root_of_unity(n * blowup)
    xs = [(offset * pow(w_big, i, F.P)) % F.P for i in range(n * blowup)]
    exp = naive_eval(coeffs, xs)
    assert list(F.to_int(np.asarray(ext))) == exp


def test_eval_poly_at_and_sum_reduce():
    n = 33
    vals = [int(x) for x in rng.integers(0, F.P, size=n, dtype=np.uint64)]
    a = jnp.asarray(F.from_int(vals))
    s = F.to_int(np.asarray(NTT.sum_reduce(a)))
    assert int(s) == sum(vals) % F.P
    coeffs = jnp.asarray(F.from_int(vals[:32]))
    z = 123456789
    got = int(F.to_int(np.asarray(NTT.eval_poly_at(coeffs, z))))
    assert got == naive_eval(vals[:32], [z])[0]


def test_ntt_mxu_matches_butterfly():
    """The MXU matmul NTT (four-step with byte-plane DFT-128 blocks,
    ops/ntt.ntt_mxu) must be bit-identical to the radix-2 butterfly path,
    both directions."""
    import numpy as np
    import jax.numpy as jnp
    from certificate_stark_tpu.ops import field as F, ntt as NTT

    rng = np.random.default_rng(5)
    for n in (64, 512, 4096):
        vals = rng.integers(0, F.P, size=(3, n), dtype=np.uint64)
        a = jnp.asarray(F.from_int(vals.astype(object)))
        for inv in (False, True):
            ref = np.asarray(NTT._ntt_butterfly(a, inv))
            got = np.asarray(NTT.ntt_mxu(a, inv))
            assert np.array_equal(ref, got), (n, inv)


def test_ntt_four_step_matches_butterfly(monkeypatch):
    """The Bailey four-step NTT (the default dispatch for n >= 2^15 on
    accelerators, ops/ntt.ntt_four_step) must be bit-identical to the
    radix-2 butterfly path, both directions, single and batched — including
    the device-built gather-twiddle branch (n >= _DEVICE_TABLE_MIN)."""
    rng = np.random.default_rng(17)
    for n in (256, 2048, 8192):
        vals = rng.integers(0, F.P, size=(3, n), dtype=np.uint64)
        a = jnp.asarray(F.from_int(vals.astype(object)))
        for inv in (False, True):
            ref = np.asarray(NTT._ntt_butterfly(a, inv))
            got = np.asarray(NTT.ntt_four_step(a, inv))
            assert np.array_equal(ref, got), (n, inv)
    # device twiddle-gather branch: lower the constant-embedding bound so the
    # powers_device path runs at a testable size
    monkeypatch.setattr(NTT, "_DEVICE_TABLE_MIN", 1024)
    for n in (2048, 4096):
        vals = rng.integers(0, F.P, size=n, dtype=np.uint64)
        a = jnp.asarray(F.from_int([int(v) for v in vals]))
        for inv in (False, True):
            ref = np.asarray(NTT._ntt_butterfly(a, inv))
            got = np.asarray(NTT.ntt_four_step(a, inv))
            assert np.array_equal(ref, got), ("device-twiddle", n, inv)


def test_ntt_dispatch_four_step_env(monkeypatch):
    """CSTARK_NTT_FOUR_STEP=1 forces ntt() through the four-step form; the
    result must stay bit-identical to the butterfly on the same backend."""
    rng = np.random.default_rng(23)
    n = 1024
    vals = rng.integers(0, F.P, size=(2, n), dtype=np.uint64)
    a = jnp.asarray(F.from_int(vals.astype(object)))
    ref = np.asarray(NTT._ntt_butterfly(a, False))
    monkeypatch.setenv("CSTARK_NTT_FOUR_STEP", "1")
    got = np.asarray(NTT.ntt(a, False))
    assert np.array_equal(ref, got)
    back = np.asarray(NTT.ntt(NTT.ntt(a), True))
    assert np.array_equal(back, np.asarray(a))
