"""SHA-256 as a batched JAX uint32 kernel — the byte-oriented commitment hash.

Role: the reference uses Blake3-256/Sha3-256 (winterfell `HashFunction`,
src/lib.rs:82) for trace/constraint/FRI Merkle commitments and the Fiat-Shamir
public coin. Our proof system defines SHA-256 as its default byte-oriented
commitment hash: it is all 32-bit adds/rotates/xors (a perfect VPU fit, unlike
64-bit-lane SHA-3), and `hashlib` provides a host oracle so device kernels are
testable bit-for-bit. (A Rescue-based algebraic commitment mode is provided
separately for hash-chain-friendly recursion; see engine/merkle.py.)

Layout: a batch of messages is a uint32 word array [n_words, B] (big-endian
words, as in the SHA spec); digests are [8, B].
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

IV = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
               0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress(state, block):
    """One SHA-256 compression as fori_loops (small compiled graph).

    state: [8, B]; block: [16, B]. The message schedule fills a [64, B] buffer;
    the 64 rounds run as a loop with K indexed dynamically.
    """
    import jax

    bsh = block.shape[1:]
    w_buf = jnp.zeros((64,) + bsh, dtype=jnp.uint32).at[:16].set(block)

    def sched(i, w):
        w15 = w[i - 15]
        w2 = w[i - 2]
        s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> np.uint32(3))
        s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> np.uint32(10))
        return w.at[i].set(w[i - 16] + s0 + w[i - 7] + s1)

    w_buf = jax.lax.fori_loop(16, 64, sched, w_buf)
    k_arr = jnp.asarray(K)

    def round_body(i, st):
        a, b, c, d, e, f, g, h = st
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + k_arr[i] + w_buf[i]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g)

    st = jax.lax.fori_loop(0, 64, round_body, tuple(state[i] for i in range(8)))
    return jnp.stack(st) + state


def bswap32(x):
    """Byte-swap a uint32 array (LE<->BE)."""
    return ((x >> np.uint32(24)) | ((x >> np.uint32(8)) & np.uint32(0xFF00))
            | ((x << np.uint32(8)) & np.uint32(0xFF0000)) | (x << np.uint32(24)))


def sha256_words(msg_words: jnp.ndarray) -> jnp.ndarray:
    """SHA-256 of messages given as big-endian uint32 words [n, B] -> [8, B].

    The byte length is n*4 (whole words only — all our messages are
    word-aligned: field elements and digests).
    """
    n = msg_words.shape[0]
    bsh = msg_words.shape[1:]
    bitlen = n * 32
    # pad: 0x80000000 word, zeros, 64-bit length (we only need the low word)
    nblocks = (n + 1 + 2 + 15) // 16
    total = nblocks * 16
    pad = [jnp.broadcast_to(jnp.uint32(0x80000000), bsh)]
    for _ in range(total - n - 3):
        pad.append(jnp.broadcast_to(jnp.uint32(0), bsh))
    pad.append(jnp.broadcast_to(jnp.uint32(bitlen >> 32), bsh))
    pad.append(jnp.broadcast_to(jnp.uint32(bitlen & 0xFFFFFFFF), bsh))
    full = jnp.concatenate([msg_words, jnp.stack(pad)], axis=0)
    state = jnp.broadcast_to(jnp.asarray(IV).reshape((8,) + (1,) * len(bsh)),
                             (8,) + bsh)
    for blk in range(nblocks):
        state = _compress(state, full[blk * 16:(blk + 1) * 16])
    return state


sha256_words_jit = jax.jit(sha256_words)


def digest_to_bytes(dig: np.ndarray) -> bytes:
    """[8] uint32 big-endian words -> 32 bytes (single digest, host)."""
    return b"".join(int(w).to_bytes(4, "big") for w in np.asarray(dig))


def felems_to_words(limbs: jnp.ndarray) -> jnp.ndarray:
    """Standard-form f63 limb array [4, k, B] -> BE words [2k, B] of the
    canonical little-endian 8-byte serialization of each element."""
    lo = limbs[0] | (limbs[1] << np.uint32(16))
    hi = limbs[2] | (limbs[3] << np.uint32(32 - 16))
    lo = bswap32(lo)
    hi = bswap32(hi)
    k = limbs.shape[1]
    out = jnp.stack([lo, hi], axis=1)  # [k, 2, B]
    return out.reshape((2 * k,) + limbs.shape[2:])
