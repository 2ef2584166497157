"""BLAKE3-256 as a batched JAX uint32 kernel + general host implementation.

Role: the reference's *default* proof-commitment hash is Blake3-256
(winterfell `HashFunction::Blake3_256`, src/lib.rs:82; example default at
examples/state-transition.rs:68-72). Like SHA-256 it is pure 32-bit
add/xor/rotate — an excellent VPU fit — and its 7-round compression is ~8x
cheaper than SHA-256's 64 rounds, which makes it the fastest byte-oriented
commitment mode we offer.

Device layout mirrors ops/sha256.py: a batch of messages is a uint32 word
array [n_words, B]; digests are [8, B]. BLAKE3 is little-endian: word j of a
message is bytes[4j..4j+4] interpreted LE (field elements serialize as 8-byte
LE standard form, matching the reference's BaseElement::to_bytes,
rescue.rs:179-186 — so element limbs pack as word0 = l0 | l1<<16,
word1 = l2 | l3<<16).

The device path implements single-chunk hashing (messages <= 1024 bytes —
covers trace-row hashing, composition rows, FRI layers, digest merges; the
widest row is 94 elements = 752 bytes). The host path (`blake3_bytes`) is the
full spec including the chunk tree, used by the Fiat-Shamir coin and as the
test oracle for the device kernel.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

IV = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
               0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)

MSG_PERM = np.array([2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8],
                    dtype=np.int32)

# PERM_POW[r][i] = index of the message word used at position i in round r
# (MSG_PERM composed r times) — lets the device kernel gather all 7 round
# schedules up front and run the rounds as a lax.fori_loop.
PERM_POW = np.empty((7, 16), dtype=np.int32)
PERM_POW[0] = np.arange(16, dtype=np.int32)
for _r in range(1, 7):
    PERM_POW[_r] = PERM_POW[_r - 1][MSG_PERM]

CHUNK_START = 1
CHUNK_END = 2
PARENT = 4
ROOT = 8

_MASK = np.uint64(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# device (jnp) / numpy single-chunk kernel — batched over trailing axes
# ---------------------------------------------------------------------------

def _rotr(x, n, xp):
    n = x.dtype.type(n) if xp is np else np.uint32(n)
    w = x.dtype.type(32) if xp is np else np.uint32(32)
    return (x >> n) | (x << (w - n))


def _g(v, a, b, c, d, mx, my, xp):
    v[a] = v[a] + v[b] + mx
    v[d] = _rotr(v[d] ^ v[a], 16, xp)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12, xp)
    v[a] = v[a] + v[b] + my
    v[d] = _rotr(v[d] ^ v[a], 8, xp)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7, xp)


def _round(v, m, xp):
    """One BLAKE3 round: 4 column + 4 diagonal G mixes. v: list of 16 arrays;
    m: indexable of 16 message words (already permuted for this round)."""
    _g(v, 0, 4, 8, 12, m[0], m[1], xp)
    _g(v, 1, 5, 9, 13, m[2], m[3], xp)
    _g(v, 2, 6, 10, 14, m[4], m[5], xp)
    _g(v, 3, 7, 11, 15, m[6], m[7], xp)
    _g(v, 0, 5, 10, 15, m[8], m[9], xp)
    _g(v, 1, 6, 11, 12, m[10], m[11], xp)
    _g(v, 2, 7, 8, 13, m[12], m[13], xp)
    _g(v, 3, 4, 9, 14, m[14], m[15], xp)
    return v


def compress(cv, block, counter, block_len, flags, xp=jnp):
    """One BLAKE3 compression. cv: [8, ...B]; block: [16, ...B] uint32.

    counter/block_len/flags are python ints (static — they index the chunk
    structure, which is shape-determined). Returns the new cv [8, ...B].

    Device path: the 7 rounds run as a lax.fori_loop over pre-gathered
    per-round message schedules (block[PERM_POW]), keeping the compiled graph
    one round deep. (The fully unrolled form — 7x8 G functions feeding one
    stack — compiles fine but its XLA:CPU executable never terminates; the
    loop form also matches ops/sha256.py and the Rescue kernels, see
    tpu-env notes.)
    """
    bsh = block.shape[1:]
    full = lambda x: xp.broadcast_to(xp.asarray(np.uint32(x)), bsh)
    v0 = [cv[i] for i in range(8)] + \
        [full(IV[i]) for i in range(4)] + \
        [full(counter & 0xFFFFFFFF), full((counter >> 32) & 0xFFFFFFFF),
         full(block_len), full(flags)]
    if xp is np:
        m = [block[i] for i in range(16)]
        for rnd in range(7):
            _round(v0, m, xp)
            if rnd < 6:
                m = [m[MSG_PERM[i]] for i in range(16)]
        return np.stack([v0[i] ^ v0[i + 8] for i in range(8)], axis=0)

    sched = block[jnp.asarray(PERM_POW).reshape(-1)].reshape(
        (7, 16) + bsh)                                  # [7, 16, ...B]

    def body(r, v):
        mr = sched[r]
        return tuple(_round(list(v), [mr[i] for i in range(16)], xp))

    v = jax.lax.fori_loop(0, 7, body, tuple(v0))
    return xp.stack([v[i] ^ v[i + 8] for i in range(8)], axis=0)


def blake3_words(words, byte_len: int = None, xp=jnp):
    """Single-chunk BLAKE3-256 of a batch of equal-length messages.

    words: [n, ...B] uint32 LE words (zero-padded to the given byte_len);
    byte_len defaults to 4*n. Requires byte_len <= 1024 (one chunk).
    Returns digests [8, ...B].
    """
    n = words.shape[0]
    byte_len = 4 * n if byte_len is None else byte_len
    assert byte_len <= 1024, "device path is single-chunk (<=1024B) only"
    assert (byte_len + 3) // 4 == n
    bsh = words.shape[1:]
    n_blocks = max(1, (byte_len + 63) // 64)
    pad = n_blocks * 16 - n
    if pad:
        z = xp.zeros((pad,) + bsh, dtype=xp.uint32)
        words = xp.concatenate([words, z], axis=0)
    cv = xp.broadcast_to(xp.asarray(IV).reshape((8,) + (1,) * len(bsh)),
                         (8,) + bsh)
    for i in range(n_blocks):
        flags = (CHUNK_START if i == 0 else 0) | \
                (CHUNK_END | ROOT if i == n_blocks - 1 else 0)
        blen = byte_len - 64 * i if i == n_blocks - 1 else 64
        cv = compress(cv, words[16 * i:16 * i + 16], 0, blen, flags, xp)
    return cv


def felems_to_words_le(std, xp=jnp):
    """Standard-form limbs [4, k, ...B] -> LE uint32 words [2k, ...B].

    Element serialization is 8-byte LE (reference rescue.rs:179-186); limbs
    are 16-bit little-endian so word0 = l0 | l1<<16, word1 = l2 | l3<<16.
    """
    lo = std[0] | (std[1] << xp.uint32(16))   # [k, ...B]
    hi = std[2] | (std[3] << xp.uint32(16))
    return xp.concatenate([xp.stack([lo, hi], axis=1).reshape(
        (-1,) + std.shape[2:])], axis=0)


# ---------------------------------------------------------------------------
# host: full-spec BLAKE3 over arbitrary byte strings (chunk tree included)
# ---------------------------------------------------------------------------

def _words_of(chunk: bytes) -> np.ndarray:
    buf = chunk + b"\x00" * (-len(chunk) % 4)
    return np.frombuffer(buf, dtype="<u4").astype(np.uint32)


def _chunk_cv(chunk: bytes, counter: int, is_root: bool) -> np.ndarray:
    cv = IV.copy()
    n_blocks = max(1, (len(chunk) + 63) // 64)
    with np.errstate(over="ignore"):  # uint32 wraparound is the spec
        for i in range(n_blocks):
            blk = chunk[64 * i:64 * i + 64]
            w = np.zeros(16, dtype=np.uint32)
            ww = _words_of(blk)
            w[:len(ww)] = ww
            flags = (CHUNK_START if i == 0 else 0) | \
                    (CHUNK_END if i == n_blocks - 1 else 0) | \
                    (ROOT if is_root and i == n_blocks - 1 else 0)
            cv = compress(cv, w, counter, len(blk), flags, np)
    return cv


def _parent_cv(left: np.ndarray, right: np.ndarray, is_root: bool) -> np.ndarray:
    block = np.concatenate([left, right]).astype(np.uint32)
    with np.errstate(over="ignore"):
        return compress(IV.copy(), block, 0, 64,
                        PARENT | (ROOT if is_root else 0), np)


def blake3_bytes(data: bytes) -> bytes:
    """Full BLAKE3-256 (default key, 32-byte output) of an arbitrary message."""
    chunks = [data[i:i + 1024] for i in range(0, len(data), 1024)] or [b""]
    if len(chunks) == 1:
        cv = _chunk_cv(chunks[0], 0, True)
        return cv.astype("<u4").tobytes()
    # chunk tree: left subtree is the largest power-of-two chunks < total
    def subtree(lo: int, hi: int, is_root: bool) -> np.ndarray:
        if hi - lo == 1:
            return _chunk_cv(chunks[lo], lo, False)
        split = 1 << ((hi - lo - 1).bit_length() - 1)
        return _parent_cv(subtree(lo, lo + split, False),
                          subtree(lo + split, hi, False), is_root)
    return subtree(0, len(chunks), True).astype("<u4").tobytes()


def digest_words(data: bytes) -> tuple:
    """Host digest as 8 LE uint32 words (the hasher's digest encoding)."""
    return tuple(int(w) for w in np.frombuffer(blake3_bytes(data), dtype="<u4"))
