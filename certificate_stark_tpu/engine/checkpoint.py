"""Phase-level prover checkpointing.

The reference has no checkpoint/resume at all — `prove` is a synchronous
`unwrap()` (reference src/lib.rs:140) and the only durable artifact is the
serialized proof. For TPU runs at 2^20+ steps (minutes of device time and a
preemptible accelerator), we add the phase-granular checkpointing SURVEY.md §5
calls for: the prover persists each Fiat-Shamir phase artifact (post-trace-LDE,
post-commitment, per-FRI-layer) and `prove` resumes from the last completed
phase after a restart.

Design notes:
- Checkpoint keys follow the proof's phase order; a phase is skipped on resume
  iff its artifact file exists and its manifest entry matches the proving
  context (AIR shape + options + pub inputs), so stale checkpoints from a
  different instance are never resumed.
- The public coin needs no checkpointing: its state is a pure function of the
  commitments, which live in the saved Merkle levels — resume replays the
  (cheap, host-side) transcript from the restored roots.
- Format: one .npz per phase (device limb arrays are plain uint32 ndarrays)
  plus a JSON manifest. No framework dependencies — artifacts are portable
  across CPU/TPU backends.
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np


class Checkpointer:
    """Directory-backed phase checkpoint store.

    `context` is any JSON-serializable description of the proving run (trace
    shape, options, public inputs). Artifacts saved under a different context
    hash are invisible to `load`, so a directory can be reused safely.
    """

    def __init__(self, directory: str, context=None):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        ctx_bytes = json.dumps(context, sort_keys=True, default=int).encode()
        self.ctx = hashlib.sha256(ctx_bytes).hexdigest()[:16]
        self._manifest_path = os.path.join(directory, "MANIFEST.json")
        self._manifest = {}
        if os.path.exists(self._manifest_path):
            try:
                with open(self._manifest_path) as f:
                    self._manifest = json.load(f)
            except (OSError, ValueError):
                self._manifest = {}

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.npz")

    def save(self, key: str, **arrays):
        """Persist named arrays for a phase (atomic rename)."""
        tmp = self._path(key) + ".tmp.npz"  # .npz suffix: savez keeps the name
        np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(tmp, self._path(key))
        self._manifest[key] = self.ctx
        with open(self._manifest_path, "w") as f:
            json.dump(self._manifest, f)

    def load(self, key: str):
        """Return the phase's array dict, or None if absent/context-mismatched."""
        if self._manifest.get(key) != self.ctx:
            return None
        path = self._path(key)
        if not os.path.exists(path):
            return None
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    def save_levels(self, key: str, main_arrays: dict, levels: list):
        """Save a phase that carries a Merkle level list (variable length)."""
        packed = {f"level{i}": lvl for i, lvl in enumerate(levels)}
        packed["n_levels"] = np.asarray(len(levels))
        self.save(key, **main_arrays, **packed)

    @staticmethod
    def unpack_levels(data: dict):
        n = int(data["n_levels"])
        return [data[f"level{i}"] for i in range(n)]
