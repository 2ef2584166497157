"""Fiat-Shamir public coin (host side).

Replaces winterfell's Blake3 public coin (engine-side; seeded by the serialized
public inputs, e.g. src/air.rs:57-62). Ours is field-native: the transcript
state is a Rescue63 digest (or SHA-256 in byte mode), reseeded with each phase
commitment; draws hash (state, counter) and read out field elements directly
(uniform in F_p by construction for the rescue mode; rejection-sampled u64 for
sha mode).

The coin is intentionally host-only: every draw is cheap, and phase barriers
(commit -> draw -> next phase) synchronize the device pipeline anyway.
"""
from __future__ import annotations

from ..ops import field as F


class RandomCoin:
    def __init__(self, hasher, seed_elements, journal=None):
        self.h = hasher
        self.state = hasher.host_digest([int(x) % F.P for x in seed_elements])
        self.counter = 0
        # optional transcript journal: records (event, payload) per protocol
        # step, for the golden-transcript tests (tests/test_transcript.py) —
        # any silent drift in draw order / serialization / phase structure
        # changes these vectors and breaks loudly.
        self.journal = journal
        if journal is not None:
            journal.append(("seed", [int(x) for x in self.state]))

    def reseed(self, commitment: tuple):
        self.state = self.h.host_merge(self.state, commitment)
        self.counter = 0
        if self.journal is not None:
            self.journal.append(("reseed", [int(x) for x in self.state]))

    def _next_block(self) -> tuple:
        self.counter += 1
        if self.h.name == "rescue":
            return self.h.host_digest(list(self.state) + [self.counter])
        # sha mode: hash state words || counter as one element
        return self.h.host_merge(self.state, (self.counter,) * self.h.digest_len)

    def draw_felt(self) -> int:
        """Uniform element of F_p."""
        v = self._draw_felt_raw()
        if self.journal is not None:
            self.journal.append(("felt", v))
        return v

    def _draw_felt_raw(self) -> int:
        while True:
            blk = self._next_block()
            if self.h.name == "rescue":
                return int(blk[0])  # already uniform in F_p
            # sha mode: 8 BE words -> take two 32-bit words as a u64, reject >= p
            for i in range(0, 8, 2):
                v = (int(blk[i]) << 32) | int(blk[i + 1])
                v &= (1 << 63) - 1
                if v < F.P:
                    return v

    def draw_felts(self, n: int) -> list:
        return [self.draw_felt() for _ in range(n)]

    def draw_ext(self, degree: int) -> list:
        """One extension-field element as `degree` base coefficients."""
        return self.draw_felts(degree)

    def draw_indices(self, n: int, domain_size: int) -> list:
        """n distinct indices in [0, domain_size) (power-of-two domain)."""
        assert domain_size & (domain_size - 1) == 0
        mask = domain_size - 1
        out = []
        seen = set()
        while len(out) < n:
            v = self.draw_felt() & mask
            if v not in seen:
                seen.add(v)
                out.append(v)
        return out

    def check_pow(self, nonce: int, grinding_bits: int) -> bool:
        if grinding_bits == 0:
            return True
        blk = (self.h.host_digest(list(self.state) + [int(nonce)])
               if self.h.name == "rescue"
               else self.h.host_merge(self.state, (int(nonce),) * self.h.digest_len))
        lead = int(blk[0])
        bound = 1 << (63 - grinding_bits) if self.h.name == "rescue" else 1 << (32 - grinding_bits)
        return lead < bound

    def grind(self, grinding_bits: int, max_iter: int = 1 << 26) -> int:
        """Find the smallest PoW nonce (reference: winterfell grinding over the
        coin state; expected 2^grinding_bits trials).

        Small factors run the host loop; larger ones search on device in
        batches (the hash kernels are batched over a trailing axis, so one
        dispatch tests 2^15 nonces — VPU-parallel PoW). Both paths scan
        nonces in increasing order, so they return the same (first) hit.
        """
        if grinding_bits == 0:
            return 0
        if grinding_bits <= 10:
            for nonce in range(max_iter):
                if self.check_pow(nonce, grinding_bits):
                    return nonce
            raise RuntimeError("grinding failed")
        return self._grind_device(grinding_bits, max_iter)

    def _grind_device(self, g: int, max_iter: int, batch: int = 1 << 15) -> int:
        import numpy as np
        import jax
        import jax.numpy as jnp
        from ..ops import rescue as R, sha256 as S, blake3 as B3

        name = self.h.name
        if name == "rescue":
            sl = len(self.state)
            state_l = jnp.asarray(
                F.from_int(np.array(list(self.state), dtype=object)))  # [4,sl]

            @jax.jit
            def hits(nonce_std):                       # [4, B] standard limbs
                msgs = jnp.concatenate(
                    [jnp.broadcast_to(state_l[:, :, None],
                                      (4, sl, nonce_std.shape[-1])),
                     F.to_mont(nonce_std)[:, None, :]], axis=1)  # [4, sl+1, B]
                std = F.from_mont(R.digest(msgs)[:, 0, :])        # [4, B]
                hi = std[2] | (std[3] << jnp.uint32(16))
                lo = std[0] | (std[1] << jnp.uint32(16))
                k = 63 - g
                if k >= 32:
                    return hi < jnp.uint32(1 << (k - 32))
                return (hi == 0) & (lo < jnp.uint32(1 << k))

            def batch_hits(base):
                n = np.arange(base, base + batch, dtype=np.uint32)
                std = np.zeros((4, batch), dtype=np.uint32)
                std[0], std[1] = n & 0xFFFF, n >> 16
                return np.asarray(hits(jnp.asarray(std)))
        else:  # byte hashers: block = state words ++ nonce*8 (= host_merge)
            from ..ops import sha3 as S3
            words = {"blake3": B3.blake3_words, "sha256": S.sha256_words,
                     "sha3": S3.sha3_words}[name]
            state_w = jnp.asarray(np.array(self.state, dtype=np.uint32))  # [8]

            @jax.jit
            def hits(nonce_w):                          # [B] uint32
                blk = jnp.concatenate(
                    [jnp.broadcast_to(state_w[:, None], (8, nonce_w.shape[0])),
                     jnp.broadcast_to(nonce_w[None, :], (8, nonce_w.shape[0]))],
                    axis=0)                             # [16, B]
                return words(blk)[0] < jnp.uint32(1 << (32 - g))

            def batch_hits(base):
                n = np.arange(base, base + batch, dtype=np.uint32)
                return np.asarray(hits(jnp.asarray(n)))

        for base in range(0, max_iter, batch):
            h = batch_hits(base)
            if h.any():
                nonce = base + int(np.argmax(h))
                assert self.check_pow(nonce, g)
                return nonce
        raise RuntimeError("grinding failed")
