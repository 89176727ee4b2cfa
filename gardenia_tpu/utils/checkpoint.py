"""Checkpoint/resume for long-running solves.

The reference has no application-level checkpointing (only gem5
simulation snapshots, include/sim.h) — single-process CUDA binaries
simply rerun.  A production TPU deployment wants restartable iterative
solves, so the stateful solvers expose their loop state as a pytree and
this module persists/restores it (atomic .npz on disk; swap in orbax for
multi-host setups).

Usage:
    ckpt = Checkpointer("/tmp/pr_lj")
    state = ckpt.restore() or initial_state
    ... run k iterations on device ...
    ckpt.save(state, step=n)
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional

import numpy as np

import jax


class Checkpointer:
    def __init__(self, prefix: str):
        self.prefix = prefix

    @property
    def _path(self) -> str:
        return self.prefix + ".ckpt.npz"

    def save(self, state: Any, step: int = 0, **meta) -> str:
        """Persist a pytree of arrays atomically."""
        leaves, treedef = jax.tree_util.tree_flatten(state)
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        payload = {"step": step, "n_leaves": len(leaves),
                   "treedef": str(treedef), **meta}
        d = os.path.dirname(os.path.abspath(self._path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, __meta__=json.dumps(payload), **arrays)
            os.replace(tmp, self._path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return self._path

    def restore(self, like: Optional[Any] = None):
        """Load the checkpoint; returns None if absent.  When `like` (a
        pytree template) is given, leaves are re-assembled into its
        structure; otherwise a flat list of arrays is returned along
        with the saved step: (leaves_or_tree, step)."""
        if not os.path.exists(self._path):
            return None
        with np.load(self._path, allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))
            leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
        if like is not None:
            treedef = jax.tree_util.tree_structure(like)
            return jax.tree_util.tree_unflatten(treedef, leaves), \
                meta["step"]
        return leaves, meta["step"]

    def step(self) -> int:
        if not os.path.exists(self._path):
            return -1
        with np.load(self._path, allow_pickle=False) as z:
            return json.loads(str(z["__meta__"]))["step"]
