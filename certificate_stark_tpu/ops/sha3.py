"""SHA3-256 (Keccak) as a batched JAX uint32 kernel + hashlib host oracle.

Role: the reference's second proof-commitment hash option
(winterfell `HashFunction::Sha3_256`, src/lib.rs:82; CLI flag at
examples/state-transition.rs:68-72). Completes our HashFunction parity:
rescue (algebraic default), blake3 (reference default), sha256, sha3.

Keccak is 64-bit-lane; TPUs have no native 64-bit integers, so each lane is
an (lo, hi) pair of uint32 arrays and 64-bit rotations decompose into paired
32-bit shifts. The 24 rounds run as a lax.fori_loop (a fully unrolled round
chain produces pathological XLA:CPU executables — see ops/blake3.py); theta/
rho/pi/chi inside one round body are unrolled over the 25 lanes with static
rotation amounts.

Layout mirrors ops/blake3.py: messages are uint32 LE word arrays [n, B]
(word 2k = lane k low half); digests are [8, B] uint32 LE words. Multi-block
messages absorb block-by-block at the SHA3-256 rate (136 bytes = 34 words).
"""
from __future__ import annotations

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

# tiny-keccak-style flat tables: rotation amounts and pi lane order
ROTC = [1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14,
        27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44]
PILN = [10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4,
        15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1]
RC = [0x0000000000000001, 0x0000000000008082, 0x800000000000808a,
      0x8000000080008000, 0x000000000000808b, 0x0000000080000001,
      0x8000000080008081, 0x8000000000008009, 0x000000000000008a,
      0x0000000000000088, 0x0000000080008009, 0x000000008000000a,
      0x000000008000808b, 0x800000000000008b, 0x8000000000008089,
      0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
      0x000000000000800a, 0x800000008000000a, 0x8000000080008081,
      0x8000000000008080, 0x0000000080000001, 0x8000000080008008]
RC_WORDS = np.array([[c & 0xFFFFFFFF, c >> 32] for c in RC], dtype=np.uint32)

RATE_WORDS = 34  # SHA3-256: rate 136 bytes


def _rotl64(lo, hi, r):
    """Rotate a 64-bit lane (lo, hi uint32 arrays) left by static r."""
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r > 32:
        lo, hi, r = hi, lo, r - 32
    rr = np.uint32(r)
    ri = np.uint32(32 - r)
    return ((lo << rr) | (hi >> ri)), ((hi << rr) | (lo >> ri))


def _round(st, rc_lo, rc_hi):
    """One Keccak round on st = list of 25 (lo, hi) pairs."""
    # theta
    bc = [tuple((st[i][h] ^ st[i + 5][h] ^ st[i + 10][h]
                 ^ st[i + 15][h] ^ st[i + 20][h]) for h in range(2))
          for i in range(5)]
    for i in range(5):
        t = _rotl64(*bc[(i + 1) % 5], 1)
        d = (bc[(i + 4) % 5][0] ^ t[0], bc[(i + 4) % 5][1] ^ t[1])
        for j in range(0, 25, 5):
            st[j + i] = (st[j + i][0] ^ d[0], st[j + i][1] ^ d[1])
    # rho + pi
    t = st[1]
    for i in range(24):
        j = PILN[i]
        st[j], t = _rotl64(*t, ROTC[i]), st[j]
    # chi
    for j in range(0, 25, 5):
        row = [st[j + i] for i in range(5)]
        for i in range(5):
            st[j + i] = tuple(
                row[i][h] ^ (~row[(i + 1) % 5][h] & row[(i + 2) % 5][h])
                for h in range(2))
    # iota
    st[0] = (st[0][0] ^ rc_lo, st[0][1] ^ rc_hi)
    return st


def keccak_f(st, xp=jnp):
    """Keccak-f[1600]. st: list of 25 (lo, hi) uint32 array pairs."""
    if xp is np:
        for r in range(24):
            with np.errstate(over="ignore"):
                st = _round(st, RC_WORDS[r, 0], RC_WORDS[r, 1])
        return st
    rc = jnp.asarray(RC_WORDS)

    def body(r, flat):
        st = [(flat[2 * i], flat[2 * i + 1]) for i in range(25)]
        st = _round(st, rc[r, 0], rc[r, 1])
        return tuple(x for lane in st for x in lane)

    flat = jax.lax.fori_loop(
        0, 24, body, tuple(x for lane in st for x in lane))
    return [(flat[2 * i], flat[2 * i + 1]) for i in range(25)]


def sha3_words(words, byte_len: int = None, xp=jnp):
    """SHA3-256 of a batch of equal-length word-aligned messages.

    words: [n, ...B] uint32 LE words; byte_len defaults to 4*n. Returns
    digests [8, ...B] (uint32 LE words). Handles any length (multi-block
    absorb at rate 136B). Padding is the SHA3 0x06 ... 0x80 domain pad;
    word alignment means the 0x06 always lands on a word boundary.
    """
    n = words.shape[0]
    byte_len = 4 * n if byte_len is None else byte_len
    assert (byte_len + 3) // 4 == n and byte_len % 4 == 0
    bsh = words.shape[1:]
    n_blocks = n // RATE_WORDS + 1  # always room for padding in last block
    total = n_blocks * RATE_WORDS
    z = xp.zeros((total - n,) + bsh, dtype=xp.uint32)
    padded = xp.concatenate([words, z], axis=0)
    # 0x06 at the first free byte (word-aligned), 0x80 at the block's last byte
    pad6 = xp.zeros((total,) + (1,) * len(bsh), dtype=xp.uint32)
    if xp is np:
        pad6[n] ^= np.uint32(0x06)
        pad6[total - 1] ^= np.uint32(0x80000000)
    else:
        pad6 = pad6.at[n].set(jnp.uint32(0x06))
        pad6 = pad6.at[total - 1].set(pad6[total - 1] | jnp.uint32(0x80000000))
    padded = padded ^ pad6

    zero = xp.zeros(bsh, dtype=xp.uint32) if bsh else xp.uint32(0)
    st = [(zero, zero)] * 25
    for blk in range(n_blocks):
        base = blk * RATE_WORDS
        st = [((st[i][0] ^ padded[base + 2 * i],
                st[i][1] ^ padded[base + 2 * i + 1])
               if i < RATE_WORDS // 2 else st[i]) for i in range(25)]
        st = keccak_f(st, xp)
    return xp.stack([st[i // 2][i % 2] for i in range(8)], axis=0)


def digest_words(data: bytes) -> tuple:
    """Host digest (hashlib oracle) as 8 LE uint32 words."""
    d = hashlib.sha3_256(data).digest()
    return tuple(int(w) for w in np.frombuffer(d, dtype="<u4"))
