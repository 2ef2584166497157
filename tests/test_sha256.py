"""Device SHA-256 vs hashlib oracle."""
import hashlib

import numpy as np
import jax.numpy as jnp

from certificate_stark_tpu.ops import sha256 as S
from certificate_stark_tpu.ops import field as F

rng = np.random.default_rng(5)


def words_to_bytes(words):
    return b"".join(int(w).to_bytes(4, "big") for w in words)


def test_sha256_single_block():
    words = rng.integers(0, 2 ** 32, size=(4, 3), dtype=np.uint32)
    got = np.asarray(S.sha256_words(jnp.asarray(words)))
    for col in range(3):
        exp = hashlib.sha256(words_to_bytes(words[:, col])).digest()
        assert S.digest_to_bytes(got[:, col]) == exp


def test_sha256_multi_block():
    for n in (16, 17, 30, 64):
        words = rng.integers(0, 2 ** 32, size=(n, 2), dtype=np.uint32)
        got = np.asarray(S.sha256_words_jit(jnp.asarray(words)))
        for col in range(2):
            exp = hashlib.sha256(words_to_bytes(words[:, col])).digest()
            assert S.digest_to_bytes(got[:, col]) == exp


def test_felems_to_words_serialization():
    vals = rng.integers(0, F.P, size=(3, 2), dtype=np.uint64)
    limbs = jnp.asarray(F.from_int(vals, mont=False))
    words = np.asarray(S.felems_to_words(limbs))
    for col in range(2):
        byts = b"".join(int(v).to_bytes(8, "little") for v in vals[:, col])
        assert words_to_bytes(words[:, col]) == byts


def test_row_hash_end_to_end():
    """Hash field-element rows exactly as the Merkle layer will."""
    vals = rng.integers(0, F.P, size=(5, 4), dtype=np.uint64)
    limbs = jnp.asarray(F.from_int(vals, mont=False))
    dig = np.asarray(S.sha256_words(S.felems_to_words(limbs)))
    for col in range(4):
        byts = b"".join(int(v).to_bytes(8, "little") for v in vals[:, col])
        assert S.digest_to_bytes(dig[:, col]) == hashlib.sha256(byts).digest()
