"""SHA3-256: official vector, device kernel vs hashlib oracle (single- and
multi-block absorb), and an e2e proof in sha3 commitment mode (the reference's
alternative hash, HashFunction::Sha3_256 at src/lib.rs:82)."""
import hashlib

import numpy as np
import jax.numpy as jnp

from certificate_stark_tpu.ops import field as F, sha3 as S3
from certificate_stark_tpu.engine.hasher import get_hasher


def test_official_empty_vector():
    assert hashlib.sha3_256(b"").hexdigest() == (
        "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a")
    # our numpy-path kernel on the empty message must agree
    got = S3.sha3_words(np.zeros((0, 1), dtype=np.uint32), xp=np)
    exp = np.frombuffer(hashlib.sha3_256(b"").digest(), dtype="<u4")
    assert np.array_equal(got[:, 0], exp)


def test_device_matches_hashlib_columns():
    rng = np.random.default_rng(11)
    h = get_hasher("sha3")
    # k=13 -> 104B single-block; k=20 -> 160B multi-block absorb
    for k in (13, 20):
        vals = rng.integers(0, F.P, size=(k, 8), dtype=np.uint64)
        got = np.asarray(h.hash_columns(jnp.asarray(F.from_int(vals))))
        for j in range(8):
            byts = b"".join(int(v).to_bytes(8, "little") for v in vals[:, j])
            exp = np.frombuffer(hashlib.sha3_256(byts).digest(), dtype="<u4")
            assert np.array_equal(got[:, j], exp), (k, j)


def test_device_matches_host_merge():
    rng = np.random.default_rng(12)
    level = rng.integers(0, 1 << 32, size=(8, 6), dtype=np.uint64).astype(np.uint32)
    h = get_hasher("sha3")
    got = np.asarray(h.merge_pairs(jnp.asarray(level)))
    for j in range(3):
        exp = h.host_merge(tuple(level[:, 2 * j]), tuple(level[:, 2 * j + 1]))
        assert tuple(got[:, j]) == exp, j


def test_rate_boundary_padding():
    # exactly one full rate block of data (136B) forces the all-padding block
    rng = np.random.default_rng(13)
    w = rng.integers(0, 1 << 32, size=(34, 4), dtype=np.uint64).astype(np.uint32)
    got = S3.sha3_words(w, xp=np)
    for j in range(4):
        byts = b"".join(int(x).to_bytes(4, "little") for x in w[:, j])
        exp = np.frombuffer(hashlib.sha3_256(byts).digest(), dtype="<u4")
        assert np.array_equal(got[:, j], exp), j


def test_e2e_sha3_proof():
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.engine import prover as PR, verifier as VR
    from certificate_stark_tpu.models import rescue_chain as RC

    opts = ProofOptions(num_queries=8, blowup=4, hash_fn="sha3")
    ex = RC.RescueChainExample(2, opts)
    air = RC.RescueChainAir(16, ex.pub_inputs(), opts)
    proof = PR.Prover(air).prove(ex.trace)
    assert VR.verify(RC.RescueChainAir, proof, ex.pub_inputs())
    rt = type(proof).from_bytes(proof.to_bytes())
    assert VR.verify(RC.RescueChainAir, rt, ex.pub_inputs())
