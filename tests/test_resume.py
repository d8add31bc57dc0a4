"""Exact checkpoint/resume (SURVEY.md §5 failure recovery): a run killed and
restarted from its last checkpoint must continue the EXACT trajectory — the
full RunnerState (params, optimizer moments, env state, RNG key, update
counter) round-trips through orbax, so train(3)+crash+resume(3) equals
train(6) bitwise. This is the framework's whole failure-recovery story
(multi-host failure = restart from checkpoint, as on real pods)."""

import numpy as np
import jax

from drone_tpu.train import train
from drone_tpu.utils.config import Config


def _cfg(tmp_path, name, total, ckpt_every, resume_from=""):
    cfg = Config.default().with_overrides([
        "train.num_envs=64", "train.horizon=8", "train.epochs=2",
        "train.num_minibatches=2", "run.mesh=false", "run.log_interval=100",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.run.run_name = name
    cfg.run.total_updates = total
    cfg.run.checkpoint_interval = ckpt_every
    cfg.run.hidden = (16, 16)
    cfg.run.resume_from = resume_from
    return cfg


def test_resume_is_bitwise_exact(tmp_path):
    # uninterrupted reference: 6 updates
    runner_a, _ = train(_cfg(tmp_path, "full", 6, 100))

    # interrupted run: 3 updates + checkpoint, then resume for 3 more
    train(_cfg(tmp_path, "part", 3, 3))
    runner_b, _ = train(_cfg(
        tmp_path, "part2", 6, 100,
        resume_from=str(tmp_path / "part" / "checkpoints"),
    ))

    assert int(runner_b.update_idx) == 6
    la = jax.tree_util.tree_leaves(runner_a.params)
    lb = jax.tree_util.tree_leaves(runner_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state and env streams too
    for a, b in zip(jax.tree_util.tree_leaves(runner_a.opt_state),
                    jax.tree_util.tree_leaves(runner_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(runner_a.env_state),
                    jax.tree_util.tree_leaves(runner_b.env_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
