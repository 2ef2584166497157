"""BLAKE3-256: official vector, device-kernel vs host-oracle consistency, and
an e2e proof in blake3 commitment mode (the reference's default hash,
HashFunction::Blake3_256 at src/lib.rs:82)."""
import numpy as np
import jax.numpy as jnp

from certificate_stark_tpu.ops import field as F, blake3 as B3
from certificate_stark_tpu.engine.hasher import get_hasher


def test_official_empty_vector():
    assert B3.blake3_bytes(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")


def test_device_matches_host_columns():
    rng = np.random.default_rng(7)
    k, B = 13, 32  # 104 bytes/message: multi-block, non-64-multiple word count
    vals = rng.integers(0, F.P, size=(k, B), dtype=np.uint64)
    h = get_hasher("blake3")
    got = np.asarray(h.hash_columns(jnp.asarray(F.from_int(vals))))
    for j in range(B):
        byts = b"".join(int(v).to_bytes(8, "little") for v in vals[:, j])
        exp = np.frombuffer(B3.blake3_bytes(byts), dtype="<u4")
        assert np.array_equal(got[:, j], exp), j


def test_device_matches_host_merge():
    rng = np.random.default_rng(8)
    level = rng.integers(0, 1 << 32, size=(8, 6), dtype=np.uint64).astype(np.uint32)
    h = get_hasher("blake3")
    got = np.asarray(h.merge_pairs(jnp.asarray(level)))
    for j in range(3):
        exp = h.host_merge(tuple(level[:, 2 * j]), tuple(level[:, 2 * j + 1]))
        assert tuple(got[:, j]) == exp, j


def test_multichunk_host_path():
    # >1024B exercises the chunk tree; check determinism + chunk sensitivity
    data = bytes(i % 251 for i in range(3000))
    d1, d2 = B3.blake3_bytes(data), B3.blake3_bytes(data)
    assert d1 == d2 and len(d1) == 32
    assert B3.blake3_bytes(data[:-1] + b"\x00") != d1


def test_e2e_blake3_proof():
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.engine import prover as PR, verifier as VR
    from certificate_stark_tpu.models import rescue_chain as RC

    opts = ProofOptions(num_queries=8, blowup=4, hash_fn="blake3")
    ex = RC.RescueChainExample(2, opts)
    air = RC.RescueChainAir(16, ex.pub_inputs(), opts)
    proof = PR.Prover(air).prove(ex.trace)
    assert VR.verify(RC.RescueChainAir, proof, ex.pub_inputs())
    rt = type(proof).from_bytes(proof.to_bytes())
    assert VR.verify(RC.RescueChainAir, rt, ex.pub_inputs())


def test_native_blake3_matches_python_oracle():
    from certificate_stark_tpu.utils import native as NV
    import pytest
    if not NV.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(9)
    for n in (0, 1, 63, 64, 65, 104, 1023, 1024, 1025, 2048, 3000, 5000, 9000):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert NV.blake3(data) == B3.blake3_bytes(data), n


def test_chunked_hash_columns_matches_unchunked():
    """engine.kernels.hash_columns_chunked_kernel (lax.map segments, used by
    _commit on large accelerator domains) must equal the one-shot kernel."""
    from certificate_stark_tpu.engine import kernels as K

    rng = np.random.default_rng(11)
    k, B, chunk = 5, 64, 16
    vals = rng.integers(0, F.P, size=(k, B), dtype=np.uint64)
    cols = jnp.asarray(F.from_int(vals))
    h = get_hasher("blake3")
    ref = np.asarray(K.hash_columns_kernel(h, cols.shape)(cols))
    got = np.asarray(K.hash_columns_chunked_kernel(h, cols.shape, chunk)(cols))
    assert np.array_equal(ref, got)
