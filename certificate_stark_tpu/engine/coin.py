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
    def __init__(self, hasher, seed_elements):
        self.h = hasher
        self.state = hasher.host_digest([int(x) % F.P for x in seed_elements])
        self.counter = 0

    def reseed(self, commitment: tuple):
        self.state = self.h.host_merge(self.state, commitment)
        self.counter = 0

    def _next_block(self) -> tuple:
        self.counter += 1
        if self.h.name == "rescue":
            return self.h.host_digest(list(self.state) + [self.counter])
        # sha mode: hash state words || counter as one element
        return self.h.host_merge(self.state, (self.counter,) * self.h.digest_len)

    def draw_felt(self) -> int:
        """Uniform element of F_p."""
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

    def grind(self, grinding_bits: int, max_iter: int = 1 << 24) -> int:
        """Find a PoW nonce on host (device grinding is wired in later)."""
        for nonce in range(max_iter):
            if self.check_pow(nonce, grinding_bits):
                return nonce
        raise RuntimeError("grinding failed")
