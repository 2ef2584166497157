"""Adversarial verifier tests: every mutated proof INTERNAL must be rejected
with the right phase tag, and proof-supplied options cannot silently weaken
verification (reference analog: only pub-input tampering, src/lib.rs:152-161;
these go further because prover and verifier share an author here).
"""
import copy

import pytest

from certificate_stark_tpu.engine import verifier as V
from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError
from certificate_stark_tpu.models import range as RG
from certificate_stark_tpu.ops.field import P

NUMBER = 0xDEADBEEF12345


def _opts(**kw):
    base = dict(num_queries=14, blowup=8, grinding_bits=4, hash_fn="blake3",
                extension_degree=1, fri_folding=4, fri_max_remainder=256)
    base.update(kw)
    return ProofOptions(**base)


@pytest.fixture(scope="module")
def proof():
    ex = RG.RangeExample(NUMBER, _opts())
    p = ex.prove()
    assert ex.verify(p)
    return p


def _expect(proof_mut, phase):
    with pytest.raises(VerificationError) as e:
        V.verify(RG.RangeAir, proof_mut, [NUMBER])
    assert str(e.value).startswith(phase + ":"), \
        f"expected phase {phase!r}, got {e.value}"


def _expect_coin_divergence(proof_mut):
    """Tampers that only diverge the Fiat-Shamir transcript are caught at the
    first transcript-dependent gate: grinding ("pow") or, when the diverged
    coin passes the 4-bit PoW by chance (1/16), the query-position replay /
    FRI checks."""
    with pytest.raises(VerificationError) as e:
        V.verify(RG.RangeAir, proof_mut, [NUMBER])
    tag = str(e.value).split(":", 1)[0]
    assert tag in ("pow", "queries", "fri"), f"unexpected tag: {e.value}"


def _flip_felt(v):
    return (int(v) + 1) % P


def test_tamper_trace_root(proof):
    p = copy.deepcopy(proof)
    p.trace_root = tuple([_flip_felt(p.trace_root[0])] + list(p.trace_root[1:])) \
        if isinstance(p.trace_root, tuple) else \
        bytes([p.trace_root[0] ^ 1]) + bytes(p.trace_root[1:])
    # a tampered trace commitment diverges the coin: the OOD consistency
    # check is the first phase that can notice
    _expect(p, "ood")


def test_tamper_h_root(proof):
    p = copy.deepcopy(proof)
    p.h_root = bytes([p.h_root[0] ^ 1]) + bytes(p.h_root[1:]) \
        if isinstance(p.h_root, (bytes, bytearray)) else \
        tuple([_flip_felt(p.h_root[0])] + list(p.h_root[1:]))
    _expect(p, "ood")


def test_tamper_ood_trace_frame(proof):
    # column 1 (acc) at z feeds the transition constraint, so the OOD
    # consistency check itself must reject
    p = copy.deepcopy(proof)
    p.ood_trace_z = [p.ood_trace_z[0], _flip_felt(p.ood_trace_z[1])]
    _expect(p, "ood")


def test_tamper_ood_unused_column_still_rejected(proof):
    # column 0 (bit) at z is NOT referenced by the range constraints at z
    # (only next-row bit is), so the OOD consistency check passes — the
    # transcript binding must still reject (coin divergence at grinding)
    p = copy.deepcopy(proof)
    p.ood_trace_z = [_flip_felt(p.ood_trace_z[0]), p.ood_trace_z[1]]
    _expect_coin_divergence(p)


def test_tamper_ood_h(proof):
    p = copy.deepcopy(proof)
    p.ood_h = [_flip_felt(p.ood_h[0])] + list(p.ood_h[1:])
    _expect(p, "ood")


def test_tamper_query_trace_value(proof):
    p = copy.deepcopy(proof)
    p.queries[0].trace_row = [_flip_felt(p.queries[0].trace_row[0])] + \
        list(p.queries[0].trace_row[1:])
    _expect(p, "merkle")


def test_tamper_query_h_value(proof):
    p = copy.deepcopy(proof)
    p.queries[0].h_row = [_flip_felt(p.queries[0].h_row[0])] + \
        list(p.queries[0].h_row[1:])
    _expect(p, "merkle")


def test_tamper_merkle_path_node(proof):
    p = copy.deepcopy(proof)
    path = [list(d) for d in p.queries[0].trace_path]
    path[0][0] = path[0][0] ^ 1 if isinstance(path[0][0], int) else path[0][0]
    p.queries[0].trace_path = [tuple(d) for d in path]
    _expect(p, "merkle")


def test_tamper_fri_root(proof):
    p = copy.deepcopy(proof)
    r0 = p.fri_roots[0]
    r0 = bytes([r0[0] ^ 1]) + bytes(r0[1:]) \
        if isinstance(r0, (bytes, bytearray)) else \
        tuple([_flip_felt(r0[0])] + list(r0[1:]))
    p.fri_roots = [r0] + list(p.fri_roots[1:])
    # tampered FRI commitment diverges the fold randomness AND the transcript
    _expect_coin_divergence(p)


def test_tamper_fri_opening_value(proof):
    p = copy.deepcopy(proof)
    vals, path = p.queries[0].fri_openings[0]
    p.queries[0].fri_openings[0] = ([_flip_felt(vals[0])] + list(vals[1:]),
                                    path)
    _expect(p, "fri")


def test_tamper_fri_remainder(proof):
    p = copy.deepcopy(proof)
    p.fri_remainder = [_flip_felt(p.fri_remainder[0])] + \
        list(p.fri_remainder[1:])
    _expect_coin_divergence(p)   # remainder reseeds the coin before queries


def test_tamper_pow_nonce(proof):
    p = copy.deepcopy(proof)
    p.pow_nonce = int(p.pow_nonce) + 1
    _expect(p, "pow")


def test_tamper_dropped_query(proof):
    p = copy.deepcopy(proof)
    p.queries = p.queries[:-1]
    _expect(p, "queries")


# ---- options guard --------------------------------------------------------
def test_options_guard_expected_mismatch(proof):
    p = copy.deepcopy(proof)
    with pytest.raises(VerificationError) as e:
        V.verify(RG.RangeAir, p, [NUMBER],
                 expected_options=_opts(num_queries=42))
    assert str(e.value).startswith("options:")


def test_options_guard_min_security(proof):
    p = copy.deepcopy(proof)
    need = p.security_level(True) + 1
    with pytest.raises(VerificationError) as e:
        V.verify(RG.RangeAir, p, [NUMBER], min_security=need)
    assert str(e.value).startswith("options:")
    assert V.verify(RG.RangeAir, p, [NUMBER],
                    min_security=p.security_level(True))


def test_wrong_pub_inputs_rejected(proof):
    # the reference's negative test (src/lib.rs:152-161): wrong public inputs
    p = copy.deepcopy(proof)
    with pytest.raises(VerificationError):
        V.verify(RG.RangeAir, p, [(NUMBER + 1) % P])
