"""Checkpoint/resume subsystem (utils/checkpoint.py): interrupted
training resumes to the exact same result as an uninterrupted run."""

import numpy as np

from tests.conftest import random_graph

from gardenia_tpu.solvers.sgd import sgd_train_checkpointed
from gardenia_tpu.utils.checkpoint import Checkpointer


def test_roundtrip_pytree(tmp_path):
    ck = Checkpointer(str(tmp_path / "s"))
    state = {"a": np.arange(5), "b": (np.ones((2, 3)),
                                      np.float32(2.5))}
    ck.save(state, step=7, note="x")
    got, step = ck.restore(like=state)
    assert step == 7 and ck.step() == 7
    np.testing.assert_array_equal(got["a"], state["a"])
    np.testing.assert_array_equal(got["b"][0], state["b"][0])


def test_restore_missing(tmp_path):
    ck = Checkpointer(str(tmp_path / "none"))
    assert ck.restore() is None
    assert ck.step() == -1


def test_sgd_resume_matches_straight_run(tmp_path):
    g = random_graph(m=50, avg_deg=4, seed=2, weighted=True)
    # uninterrupted 4 epochs
    full = sgd_train_checkpointed(
        g, Checkpointer(str(tmp_path / "full")), total_iters=4)
    # interrupted: 2 epochs, then a fresh call resumes from the ckpt
    ck = Checkpointer(str(tmp_path / "part"))
    sgd_train_checkpointed(g, ck, total_iters=2)
    assert ck.step() == 2
    resumed = sgd_train_checkpointed(g, ck, total_iters=4)
    np.testing.assert_allclose(np.asarray(resumed.user_lv),
                               np.asarray(full.user_lv), atol=1e-7)
    np.testing.assert_allclose(np.asarray(resumed.item_lv),
                               np.asarray(full.item_lv), atol=1e-7)
