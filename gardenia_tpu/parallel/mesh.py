"""Device mesh helpers for multi-chip graph partitioning.

The reference has no scale-out axis (SURVEY.md §2.4 item 6); this layer is
the new capability: 1D vertex-range partitioning with frontier/contribution
all-gather over ICI, 2D edge partitioning for TC/SCC (BASELINE.json)."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "v") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), (axis,))
