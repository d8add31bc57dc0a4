"""Exact checkpoint/resume (SURVEY.md §5 failure recovery): a run killed and
restarted from its last checkpoint must continue the EXACT trajectory — the
full RunnerState (params, optimizer moments, env state, RNG key, update
counter) round-trips through orbax, so train(3)+crash+resume(3) equals
train(6) bitwise. This is the framework's whole failure-recovery story
(multi-host failure = restart from checkpoint, as on real pods)."""

import numpy as np
import jax

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu.models import ActorCritic
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


def test_resume_megakernel_trainer_bitwise(tmp_path):
    """train(2)+resume(2) == train(4) through the megakernel trainer
    (reference mode on CPU): the fused adam state (count, mu, nu) must
    round-trip orbax exactly like the optax state does."""
    from drone_tpu import ppo_pallas
    from drone_tpu.utils.checkpoint import Checkpointer

    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=(16, 16))
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=256, epochs=1,
                            num_minibatches=2)
    opt = ppo_mod.make_optimizer(cfg)

    def fresh():
        r = ppo_mod.init_runner(model, env, cfg, seed=4)
        return r.replace(opt_state=ppo_pallas.init_fused_opt_state(r.params))

    step = jax.jit(ppo_pallas.make_pallas_train_step(
        opt, env.params, env.statics, cfg, mode="reference",
        fused_optimizer=True))

    ra = fresh()
    for _ in range(4):
        ra, _ = step(ra)

    rb = fresh()
    for _ in range(2):
        rb, _ = step(rb)
    ck = Checkpointer(tmp_path / "ck")
    ck.save(2, rb)
    ck.wait()
    restored, start = ck.restore(fresh())
    assert start == 2
    assert float(restored.opt_state[0]) == float(rb.opt_state[0])
    for _ in range(2):
        restored, _ = step(restored)

    for a, b in zip(jax.tree_util.tree_leaves(ra),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
