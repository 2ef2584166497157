"""Commitment hashers for the proof system.

The reference commits with byte-oriented hashes (Blake3-256/Sha3-256 via
winterfell `HashFunction`, src/lib.rs:82) and uses Rescue63 as the in-circuit /
account-tree hash. Our TPU-native system flips the default: the proof's Merkle
commitments and the Fiat-Shamir coin use **Rescue63 digests (7 f63 elements)**
— algebraic hashing keeps the whole commit path in field kernels (MDS = matmul)
and makes proofs recursion-friendly. SHA-256 is provided as the byte-oriented
alternative (hashlib oracle, see ops/sha256.py).

A Hasher provides:
  device side: hash_columns(rows) -> digests, merge_pairs(level) -> next level
  host side:   digest elements / merge digests with Python ints (coin + verify)
Digests are column arrays: rescue [4, 7, B] limbs; sha256 [8, B] uint32 words.
"""
from __future__ import annotations

import hashlib

import numpy as np
import jax.numpy as jnp

from ..ops import field as F, rescue as R, sha256 as S, blake3 as B3, sha3 as S3
from ..utils import rescue_ref as RR


class RescueHasher:
    """Algebraic hasher: commitment digests are the first 4 f63 elements of
    the Rescue sponge output (Montgomery limbs on device, ints on host) —
    the reference's Digest::as_bytes truncation (rescue.rs:202-211, 32 bytes,
    ~126-bit collision resistance), adopted natively for the proof Merkle
    trees: every authentication-path node is 32 instead of 56 bytes. The
    in-circuit account tree (utils/account_tree.py) keeps full 7-element
    digests — that structure is enforced by the Merkle sub-AIR."""

    name = "rescue"
    digest_len = 4  # field elements (truncated; ops/rescue.TRUNC_DIGEST)

    # -- device ------------------------------------------------------------
    def hash_columns(self, cols: jnp.ndarray) -> jnp.ndarray:
        """cols: [4, k, B] Montgomery limbs -> [4, 4, B] truncated digests."""
        return R.digest(cols)[:, :R.TRUNC_DIGEST]

    def merge_pairs(self, level: jnp.ndarray) -> jnp.ndarray:
        """level: [4, 4, 2m] -> [4, 4, m] by merging adjacent pairs."""
        return R.merge4(level[..., 0::2], level[..., 1::2])

    # -- host (native C library when built; python-int fallback) -----------
    def __init__(self):
        from ..utils import native as NV
        self._nv = NV if NV.available() else None

    def host_digest(self, elements) -> tuple:
        if self._nv is not None:
            return self._nv.digest(
                [int(e) % F.P for e in elements])[:R.TRUNC_DIGEST]
        return tuple(
            RR.digest([int(e) % F.P for e in elements])[:R.TRUNC_DIGEST])

    def host_merge(self, d0, d1) -> tuple:
        if self._nv is not None:
            return self._nv.merge4(d0, d1)
        return tuple(RR.merge4(list(d0), list(d1)))

    def to_ints(self, device_digest_col) -> tuple:
        """One digest column [4, 4] (Montgomery limbs, numpy) -> 4 ints."""
        return tuple(int(x) for x in F.to_int(np.asarray(device_digest_col)))


class Sha256Hasher:
    """Byte-oriented hasher; digests are 8 uint32 big-endian words."""

    name = "sha256"
    digest_len = 8  # uint32 words

    def hash_columns(self, cols: jnp.ndarray) -> jnp.ndarray:
        """cols: [4, k, B] Montgomery limbs -> [8, B] digests.

        Serialization: per element, 8-byte little-endian standard form
        (matching the reference's BaseElement::to_bytes, rescue.rs:179-186).
        """
        std = F.from_mont(cols)
        return S.sha256_words(S.felems_to_words(std))

    def merge_pairs(self, level: jnp.ndarray) -> jnp.ndarray:
        both = jnp.concatenate([level[:, 0::2], level[:, 1::2]], axis=0)  # [16, m]
        return S.sha256_words(both)

    def host_digest(self, elements) -> tuple:
        byts = b"".join((int(e) % F.P).to_bytes(8, "little") for e in elements)
        d = hashlib.sha256(byts).digest()
        return tuple(int.from_bytes(d[i * 4:(i + 1) * 4], "big") for i in range(8))

    def host_merge(self, d0, d1) -> tuple:
        byts = b"".join(int(w).to_bytes(4, "big") for w in tuple(d0) + tuple(d1))
        d = hashlib.sha256(byts).digest()
        return tuple(int.from_bytes(d[i * 4:(i + 1) * 4], "big") for i in range(8))

    def to_ints(self, device_digest_col) -> tuple:
        return tuple(int(x) for x in np.asarray(device_digest_col))


class Blake3Hasher:
    """Byte-oriented hasher matching the reference's default commitment hash
    (HashFunction::Blake3_256, src/lib.rs:82). Digests are 8 uint32
    little-endian words; element serialization is 8-byte LE standard form."""

    name = "blake3"
    digest_len = 8  # uint32 words

    def __init__(self):
        from ..utils import native as NV
        self._nv = NV if NV.available() else None

    def hash_columns(self, cols: jnp.ndarray) -> jnp.ndarray:
        """cols: [4, k, B] Montgomery limbs -> [8, B] digests."""
        std = F.from_mont(cols)
        return B3.blake3_words(B3.felems_to_words_le(std))

    def merge_pairs(self, level: jnp.ndarray) -> jnp.ndarray:
        both = jnp.concatenate([level[:, 0::2], level[:, 1::2]], axis=0)  # [16, m]
        return B3.blake3_words(both)

    def _host_bytes(self, byts: bytes) -> tuple:
        if self._nv is not None:
            return tuple(int(w) for w in
                         np.frombuffer(self._nv.blake3(byts), dtype="<u4"))
        return B3.digest_words(byts)

    def host_digest(self, elements) -> tuple:
        return self._host_bytes(b"".join(
            (int(e) % F.P).to_bytes(8, "little") for e in elements))

    def host_merge(self, d0, d1) -> tuple:
        return self._host_bytes(b"".join(
            int(w).to_bytes(4, "little") for w in tuple(d0) + tuple(d1)))

    def to_ints(self, device_digest_col) -> tuple:
        return tuple(int(x) for x in np.asarray(device_digest_col))


class Sha3Hasher:
    """Byte-oriented hasher matching the reference's alternative commitment
    hash (HashFunction::Sha3_256, src/lib.rs:82). Digests are 8 uint32
    little-endian words; element serialization is 8-byte LE standard form."""

    name = "sha3"
    digest_len = 8  # uint32 words

    def hash_columns(self, cols: jnp.ndarray) -> jnp.ndarray:
        """cols: [4, k, B] Montgomery limbs -> [8, B] digests."""
        std = F.from_mont(cols)
        return S3.sha3_words(B3.felems_to_words_le(std))

    def merge_pairs(self, level: jnp.ndarray) -> jnp.ndarray:
        both = jnp.concatenate([level[:, 0::2], level[:, 1::2]], axis=0)  # [16, m]
        return S3.sha3_words(both)

    def host_digest(self, elements) -> tuple:
        byts = b"".join((int(e) % F.P).to_bytes(8, "little") for e in elements)
        return S3.digest_words(byts)

    def host_merge(self, d0, d1) -> tuple:
        byts = b"".join(int(w).to_bytes(4, "little") for w in tuple(d0) + tuple(d1))
        return S3.digest_words(byts)

    def to_ints(self, device_digest_col) -> tuple:
        return tuple(int(x) for x in np.asarray(device_digest_col))


HASHERS = {"rescue": RescueHasher, "sha256": Sha256Hasher,
           "blake3": Blake3Hasher, "sha3": Sha3Hasher}


def get_hasher(name: str):
    return HASHERS[name]()
