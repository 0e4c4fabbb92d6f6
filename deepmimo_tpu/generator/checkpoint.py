"""Checkpoint/resume for long channel-generation jobs.

Pod-scale scenario sweeps can run for hours; the reference toolchain can
only restart whole scenarios (SURVEY §5). Here each rendered user block is
persisted as an npz chunk keyed by a config fingerprint, so an interrupted
``compute_channels`` resumes at the first missing block — and stale chunks
from a different configuration are never mixed in.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import numpy as np


class ChunkStore:
    """On-disk store of rendered channel blocks for one (dataset, config).

    Layout: ``<root>/<fingerprint>/block_<start>.npz`` + manifest.json.
    """

    def __init__(self, root: str, fingerprint: str):
        self.dir = os.path.join(root, fingerprint)
        os.makedirs(self.dir, exist_ok=True)
        self._manifest_path = os.path.join(self.dir, "manifest.json")

    @staticmethod
    def fingerprint(cfg, n_ue: int, extra: Optional[dict] = None) -> str:
        """Stable hash of the channel configuration + dataset size."""
        payload = {
            "cfg": repr(cfg),
            "n_ue": n_ue,
            "extra": extra or {},
        }
        digest = hashlib.sha256(
            json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]
        return digest

    def has_block(self, start: int) -> bool:
        return os.path.exists(self._block_path(start))

    def _block_path(self, start: int) -> str:
        return os.path.join(self.dir, f"block_{start:09d}.npz")

    def save_block(self, start: int, channel: np.ndarray) -> None:
        # np.savez appends .npz when missing — name the temp file fully.
        tmp = self._block_path(start) + ".tmp.npz"
        with open(tmp, "wb") as f:
            # complex stored as planes for portability
            np.savez(f, real=np.real(channel).astype(np.float32),
                     imag=np.imag(channel).astype(np.float32))
        os.replace(tmp, self._block_path(start))

    def load_block(self, start: int) -> np.ndarray:
        with np.load(self._block_path(start)) as z:
            return z["real"] + 1j * z["imag"]

    def write_manifest(self, meta: dict) -> None:
        with open(self._manifest_path, "w") as f:
            json.dump(meta, f, indent=1)

    def blocks(self):
        return sorted(int(f[6:15]) for f in os.listdir(self.dir)
                      if f.startswith("block_") and f.endswith(".npz"))
