"""Run statistics reporting (reference include/statistics.h is an empty
reportStat stub; here it actually reports): degree distribution summary,
solver counters, and environment checks (include/env_check.h analog)."""

from __future__ import annotations

import os
from typing import Dict


def graph_stats(g) -> Dict:
    deg = g.degrees
    return {
        "num_vertices": int(g.m),
        "num_edges": int(g.nnz),
        "min_degree": int(deg.min()) if g.m else 0,
        "max_degree": int(deg.max()) if g.m else 0,
        "avg_degree": float(deg.mean()) if g.m else 0.0,
        "degree_variance": float(deg.var()) if g.m else 0.0,
        "symmetric": bool(g.symmetric),
        "weighted": g.weights is not None,
    }


def report_stats(stats: Dict, prefix: str = "") -> None:
    for k, v in stats.items():
        print(f"{prefix}{k} = {v}")


def env_check() -> Dict:
    """Environment report (reference include/env_check.h env helpers)."""
    import jax
    return {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "device_count": jax.device_count(),
        "omp_threads_analog": os.cpu_count(),
    }
