"""Test harness config: run JAX on CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md §7)."""

import os

# Force CPU regardless of environment: this image's sitecustomize
# registers an 'axon' TPU backend and exports JAX_PLATFORMS=axon, which
# would route every test through the (slow, single-chip) TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATASETS = "/root/reference/datasets"
TEST_GRAPHS = "/root/reference/test/graphs"


@pytest.fixture(scope="session")
def chesapeake():
    from gardenia_tpu import load_graph
    return load_graph(f"{DATASETS}/chesapeake.mtx", "mtx", symmetrize=True)


@pytest.fixture(scope="session")
def pr4():
    """The 4-vertex directed fixture test/graphs/pr.mtx."""
    from gardenia_tpu import load_graph
    return load_graph(f"{TEST_GRAPHS}/pr.mtx", "mtx", need_reverse=True)


def random_graph(m=97, avg_deg=6, seed=0, weighted=False, symmetric=False):
    """Small random COO graph for property tests."""
    from gardenia_tpu.core.graph import from_edges
    from gardenia_tpu.core.io import EdgeListData
    rng = np.random.default_rng(seed)
    nnz = m * avg_deg
    src = rng.integers(0, m, nnz).astype(np.int32)
    dst = rng.integers(0, m, nnz).astype(np.int32)
    wt = rng.integers(1, 10, nnz).astype(np.float64) if weighted else None
    e = EdgeListData(m, m, src, dst, wt)
    return from_edges(e, symmetrize=symmetric, need_reverse=not symmetric)
