"""STARK proof container + byte serialization.

The reference's `StarkProof` is winterfell's serialized struct; ours is a
self-describing container with a deterministic byte encoding (proof size is a
tracked metric; see bench.py). Field elements serialize as 8-byte LE standard
form, matching the reference's element encoding (rescue.rs:179-186).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field


@dataclass
class QueryOpening:
    index: int
    trace_row: list          # trace_width ints (base field)
    h_row: list              # k * ext ints
    trace_path: list         # list of digest tuples
    h_path: list
    fri_openings: list       # per layer: (coset_values: list, path: list)


@dataclass
class Proof:
    trace_width: int
    trace_length: int
    options: object
    pub_inputs: list
    trace_root: tuple = ()
    h_root: tuple = ()
    ood_trace_z: list = field(default_factory=list)     # ext coeff lists
    ood_trace_zg: list = field(default_factory=list)
    ood_h: list = field(default_factory=list)
    fri_roots: list = field(default_factory=list)
    fri_remainder: list = field(default_factory=list)   # ext evals of last layer
    pow_nonce: int = 0
    queries: list = field(default_factory=list)

    # -- serialization ------------------------------------------------------
    def to_bytes(self) -> bytes:
        out = bytearray()

        def w_u32(v):
            out.extend(struct.pack("<I", int(v)))

        def w_felt(v):
            out.extend(int(v).to_bytes(8, "little"))

        def w_felts(vs):
            w_u32(len(vs))
            for v in vs:
                if isinstance(v, (list, tuple)):
                    for c in v:
                        w_felt(c)
                else:
                    w_felt(v)

        def w_digest(d):
            for x in d:
                w_felt(x)

        def w_path(path):
            w_u32(len(path))
            for d in path:
                w_digest(d)

        w_u32(self.trace_width)
        w_u32(self.trace_length)
        w_felts(self.pub_inputs)
        w_digest(self.trace_root)
        w_digest(self.h_root)
        for grp in (self.ood_trace_z, self.ood_trace_zg, self.ood_h):
            w_felts(grp)
        w_u32(len(self.fri_roots))
        for r in self.fri_roots:
            w_digest(r)
        w_felts(self.fri_remainder)
        w_u32(self.pow_nonce)
        w_u32(len(self.queries))
        for q in self.queries:
            w_u32(q.index)
            w_felts(q.trace_row)
            w_felts(q.h_row)
            w_path(q.trace_path)
            w_path(q.h_path)
            w_u32(len(q.fri_openings))
            for vals, path in q.fri_openings:
                w_felts(vals)
                w_path(path)
        return bytes(out)

    def size_bytes(self) -> int:
        return len(self.to_bytes())
