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


def _cfg(tmp_path, name, total, ckpt_every, resume_from="", extra=()):
    cfg = Config.default().with_overrides([
        "train.num_envs=64", "train.horizon=8", "train.epochs=2",
        "train.num_minibatches=2", "run.mesh=false", "run.log_interval=100",
        *extra,
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


def test_opt_state_converters_roundtrip_bitwise():
    """optax <-> fused adam state conversion preserves the moments bit for
    bit (the two layouts hold the same tensors, transposed/reshaped)."""
    from drone_tpu import ppo_pallas

    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=(16, 16))
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=64, epochs=2,
                            num_minibatches=2, anneal_lr=True,
                            total_updates=10)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=7)
    step = jax.jit(ppo_mod.make_train_step(
        model.apply, opt, env.params, env.statics, cfg))
    for _ in range(2):
        runner, _ = step(runner)  # non-trivial moments

    fused = ppo_pallas.optax_to_fused_opt_state(runner.opt_state)
    assert ppo_pallas.is_fused_opt_state(fused)
    assert not ppo_pallas.is_fused_opt_state(runner.opt_state)
    assert float(fused[0]) == 2 * 2 * 2  # updates*epochs*minibatches
    # moments match the direct kernel-layout extraction bitwise
    import optax as _optax

    adam = ppo_pallas._find_state(runner.opt_state, _optax.ScaleByAdamState)
    mu_t, _, _ = ppo_pallas._kernel_tensors(adam.mu)
    for a, b in zip(fused[1], mu_t):
        np.testing.assert_array_equal(np.asarray(a).view(np.uint32),
                                      np.asarray(b).view(np.uint32))
    # round trip back to optax: bitwise-identical tree (incl. both counts)
    back = ppo_pallas.fused_to_optax_opt_state(opt, runner.params, fused)
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(runner.opt_state))
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(runner.opt_state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cross_trainer_resume_both_directions(tmp_path):
    """A checkpoint written under one trainer resumes under the other with
    optimizer momentum carried over (VERDICT r2 missing #2): scan/optax ->
    megakernel/fused-adam and the reverse, through the train() driver."""
    from drone_tpu import ppo_pallas

    mk = ["train.num_envs=256"]  # megakernel-eligible batch shape

    # scan -> pallas
    train(_cfg(tmp_path, "sc", 2, 2, extra=mk + ["run.rollout=scan"]))
    rb, last = train(_cfg(
        tmp_path, "sc2pal", 4, 100,
        resume_from=str(tmp_path / "sc" / "checkpoints"),
        extra=mk + ["run.rollout=pallas"]))
    assert ppo_pallas.is_fused_opt_state(rb.opt_state)
    assert int(rb.update_idx) == 4
    # momentum carried: count continued from 8 (2u*2e*2mb), not from 0
    assert float(rb.opt_state[0]) == 16.0
    assert np.isfinite(last["loss"])

    # pallas -> scan
    train(_cfg(tmp_path, "pal", 2, 2, extra=mk + ["run.rollout=pallas"]))
    rc, last2 = train(_cfg(
        tmp_path, "pal2sc", 4, 100,
        resume_from=str(tmp_path / "pal" / "checkpoints"),
        extra=mk + ["run.rollout=scan"]))
    assert not ppo_pallas.is_fused_opt_state(rc.opt_state)
    assert int(rc.update_idx) == 4
    import optax as _optax

    adam = ppo_pallas._find_state(rc.opt_state, _optax.ScaleByAdamState)
    assert int(adam.count) == 16
    assert np.isfinite(last2["loss"])


def test_incompatible_checkpoint_fails_with_clear_error(tmp_path):
    """A checkpoint whose shapes match neither trainer layout raises an
    actionable RuntimeError, not an orbax structure traceback."""
    import pytest

    train(_cfg(tmp_path, "small", 2, 2))  # num_envs=64, hidden (16,16)
    bad = _cfg(tmp_path, "bad", 4, 100,
               resume_from=str(tmp_path / "small" / "checkpoints"),
               extra=["train.num_envs=256"])
    bad.run.hidden = (32, 32)  # template can't match in either layout
    with pytest.raises(RuntimeError, match="neither trainer layout"):
        train(bad)


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


def test_cross_trainer_resume_recurrent_both_directions(tmp_path):
    """Recurrent cross-trainer portability through the train() driver:
    a checkpoint written by the scan recurrent trainer (optax) resumes
    under the recurrent MEGAKERNEL trainer (fused adam in LSTM kernel
    layout) with momentum carried over, and the reverse."""
    from drone_tpu import ppo_pallas

    mk = ["train.num_envs=256", "run.policy=lstm"]

    def rcfg(name, total, ckpt_every, resume_from="", extra=()):
        cfg = _cfg(tmp_path, name, total, ckpt_every,
                   resume_from=resume_from, extra=mk + list(extra))
        cfg.run.lstm_hidden = 16
        return cfg

    # scan/optax -> recurrent megakernel/fused-adam
    train(rcfg("rsc", 2, 2, extra=["run.rollout=scan"]))
    rb, last = train(rcfg(
        "rsc2pal", 4, 100,
        resume_from=str(tmp_path / "rsc" / "checkpoints"),
        extra=["run.rollout=pallas"]))
    assert ppo_pallas.is_fused_opt_state(rb.opt_state)
    assert int(rb.update_idx) == 4
    # momentum carried: count continued from 8 (2u*2e*2mb), not from 0
    assert float(rb.opt_state[0]) == 16.0
    assert np.isfinite(last["loss"])

    # recurrent megakernel/fused-adam -> scan/optax
    train(rcfg("rpal", 2, 2, extra=["run.rollout=pallas"]))
    rc, last2 = train(rcfg(
        "rpal2sc", 4, 100,
        resume_from=str(tmp_path / "rpal" / "checkpoints"),
        extra=["run.rollout=scan"]))
    assert not ppo_pallas.is_fused_opt_state(rc.opt_state)
    assert int(rc.update_idx) == 4
    import optax as _optax

    adam = ppo_pallas._find_state(rc.opt_state, _optax.ScaleByAdamState)
    assert int(adam.count) == 16
    assert np.isfinite(last2["loss"])


def test_cross_trainer_resume_cnn_both_directions(tmp_path):
    """CNN cross-trainer portability through the train() driver (round-4
    missing #4): a policy=cnn checkpoint written by the scan trainer
    (optax) resumes under the CNN megakernel trainer (fused adam in CNN
    kernel layout) with momentum carried over, and the reverse."""
    from drone_tpu import ppo_pallas

    mk = ["train.num_envs=256", "run.policy=cnn"]

    # scan/optax -> CNN megakernel/fused-adam
    train(_cfg(tmp_path, "csc", 2, 2, extra=mk + ["run.rollout=scan"]))
    rb, last = train(_cfg(
        tmp_path, "csc2pal", 4, 100,
        resume_from=str(tmp_path / "csc" / "checkpoints"),
        extra=mk + ["run.rollout=pallas"]))
    assert ppo_pallas.is_fused_opt_state(rb.opt_state)
    assert int(rb.update_idx) == 4
    # momentum carried: count continued from 8 (2u*2e*2mb), not from 0
    assert float(rb.opt_state[0]) == 16.0
    assert np.isfinite(last["loss"])

    # CNN megakernel/fused-adam -> scan/optax
    train(_cfg(tmp_path, "cpal", 2, 2, extra=mk + ["run.rollout=pallas"]))
    rc, last2 = train(_cfg(
        tmp_path, "cpal2sc", 4, 100,
        resume_from=str(tmp_path / "cpal" / "checkpoints"),
        extra=mk + ["run.rollout=scan"]))
    assert not ppo_pallas.is_fused_opt_state(rc.opt_state)
    assert int(rc.update_idx) == 4
    import optax as _optax

    adam = ppo_pallas._find_state(rc.opt_state, _optax.ScaleByAdamState)
    assert int(adam.count) == 16
    assert np.isfinite(last2["loss"])


def test_cross_trainer_resume_cnn_lstm_both_directions(tmp_path):
    """Pixel-RECURRENT cross-trainer portability: a policy=cnn_lstm
    checkpoint round-trips scan/optax <-> recurrent-megakernel/fused-adam
    (the LSTM converters' CNN-encoder tensor layout) with momentum carried."""
    from drone_tpu import ppo_pallas

    mk = ["train.num_envs=256", "run.policy=cnn_lstm", "run.lstm_hidden=16"]

    train(_cfg(tmp_path, "clsc", 2, 2, extra=mk + ["run.rollout=scan"]))
    rb, last = train(_cfg(
        tmp_path, "clsc2pal", 4, 100,
        resume_from=str(tmp_path / "clsc" / "checkpoints"),
        extra=mk + ["run.rollout=pallas"]))
    assert ppo_pallas.is_fused_opt_state(rb.opt_state)
    assert float(rb.opt_state[0]) == 16.0
    assert np.isfinite(last["loss"])

    train(_cfg(tmp_path, "clpal", 2, 2, extra=mk + ["run.rollout=pallas"]))
    rc, last2 = train(_cfg(
        tmp_path, "clpal2sc", 4, 100,
        resume_from=str(tmp_path / "clpal" / "checkpoints"),
        extra=mk + ["run.rollout=scan"]))
    assert not ppo_pallas.is_fused_opt_state(rc.opt_state)
    import optax as _optax

    adam = ppo_pallas._find_state(rc.opt_state, _optax.ScaleByAdamState)
    assert int(adam.count) == 16
    assert np.isfinite(last2["loss"])


def test_fresh_run_refuses_existing_checkpoint_dir(tmp_path):
    """orbax silently returns False when saving over an existing step, so a
    fresh run reusing a run_name would 'finish' while export/watch serve the
    OLD weights. train() must refuse up front (self-resume stays legal)."""
    import pytest

    train(_cfg(tmp_path, "dup", 2, 2))
    with pytest.raises(RuntimeError, match="previous run's checkpoints"):
        train(_cfg(tmp_path, "dup", 2, 2))
    # self-resume into the same directory is the legitimate overlap
    runner, _ = train(_cfg(tmp_path, "dup", 4, 4,
                           resume_from=str(tmp_path / "dup" / "checkpoints")))
    assert int(runner.update_idx) == 4
