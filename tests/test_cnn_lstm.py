"""Pixel-recurrent policy family (CNNLSTMActorCritic / pluggable encoders).

The reference's LSTMWrapper composes with ANY encoder — the default MLP or
a CNN (SURVEY.md §2.2 #10, `[U] pufferlib/models.py`). This file gates that
composition here: the generic encoder_module hook trains, the flagship
CNNLSTMActorCritic learns on hover through the scan recurrent trainer, and
the train.py wiring (run.policy=cnn_lstm) builds/trains/evaluates it.
Kernel-tier contracts (rollout/update megakernels) live in
tests/test_pallas_lstm_traj.py and tests/test_pallas_update_lstm.py.
"""

import numpy as np
import jax
import jax.numpy as jnp

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu import ppo_rnn
from drone_tpu.models import (
    CNNLSTMActorCritic,
    LSTMActorCritic,
    PatchCNNActorCritic,
    PatchCNNEncoder,
)


def tiny_model(**kw):
    return CNNLSTMActorCritic(res=8, patch0=2, patch1=2, channels=(8, 8),
                              trunk_hidden=16, hidden=16, **kw)


def test_cnn_lstm_shares_tower_params_with_patch_cnn():
    """CNNLSTMActorCritic's conv tower has the SAME top-level param names
    and shapes as PatchCNNActorCritic's (one patch_cnn_trunk definition) —
    the property the kernel weight extractors and the exporter rely on."""
    m_ff = PatchCNNActorCritic(res=8, patch0=2, patch1=2, channels=(8, 8),
                               hidden=16)
    p_ff = m_ff.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))["params"]
    m_rec = tiny_model()
    p_rec = m_rec.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                       m_rec.initial_carry((1,)))["params"]
    for name in ("conv0", "conv1", "trunk"):
        for k in p_ff[name]:
            assert p_ff[name][k].shape == p_rec[name][k].shape, (name, k)
    assert "lstm" in p_rec and "lstm" not in p_ff


def test_cnn_lstm_scan_trainer_learns():
    """The pixel-recurrent policy learns on hover through the scan
    recurrent trainer: value loss drops, every param leaf (convs AND lstm
    gates) moves and stays finite."""
    env = drone_tpu.DroneEnv()
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=64, epochs=2,
                            num_minibatches=2, lr=1e-3)
    model = tiny_model()
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    step = jax.jit(ppo_rnn.make_recurrent_train_step(
        model.apply, opt, env.params, env.statics, cfg))
    p0 = jax.tree_util.tree_leaves(runner.params)
    vloss = []
    for _ in range(20):
        runner, m = step(runner)
        assert np.isfinite(float(m["loss"]))
        vloss.append(float(m["v_loss"]))
    assert np.mean(vloss[-5:]) < np.mean(vloss[1:6]), vloss
    p1 = jax.tree_util.tree_leaves(runner.params)
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(p0, p1)]
    assert all(moved), f"stale leaves: {[i for i, x in enumerate(moved) if not x]}"
    for leaf in p1:
        assert np.isfinite(np.asarray(leaf)).all()


def test_encoder_module_composition_trains():
    """LSTMActorCritic(encoder_module=...) — the generic LSTMWrapper hook:
    an arbitrary encoder module trains through the recurrent trainer, with
    gradients reaching the encoder's params."""
    env = drone_tpu.DroneEnv()
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=32, epochs=1,
                            num_minibatches=1)
    enc = PatchCNNEncoder(res=8, patch0=2, patch1=2, channels=(8, 8),
                          hidden=16)
    model = LSTMActorCritic(hidden=16, encoder_module=enc)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    assert "encoder_module" in runner.params["params"]
    step = jax.jit(ppo_rnn.make_recurrent_train_step(
        model.apply, opt, env.params, env.statics, cfg))
    p0 = jax.tree_util.tree_leaves(runner.params)
    for _ in range(2):
        runner, m = step(runner)
    assert np.isfinite(float(m["loss"]))
    p1 = jax.tree_util.tree_leaves(runner.params)
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(p0, p1)]
    assert all(moved), f"stale leaves: {[i for i, x in enumerate(moved) if not x]}"


def test_train_py_cnn_lstm_megakernel_dispatch(tmp_path):
    """run.rollout=pallas routes policy=cnn_lstm to the fully-fused
    recurrent megakernel trainer (fused-adam opt state; the kernels'
    CNN-encoder hook) when the batch shape supports the update kernel's
    minibatch tiling."""
    from drone_tpu import ppo_pallas
    from drone_tpu.train import train
    from drone_tpu.utils.config import Config

    cfg = Config.default().with_overrides([
        "run.policy=cnn_lstm", "run.lstm_hidden=8", "run.total_updates=1",
        "run.log_interval=1", "run.checkpoint_interval=100",
        "train.horizon=8", "train.epochs=1", "train.num_minibatches=2",
        "train.num_envs=256", "run.mesh=false", "run.rollout=pallas",
        "run.save_final=false",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    runner, last = train(cfg)
    assert np.isfinite(last["loss"])
    assert ppo_pallas.is_fused_opt_state(runner.opt_state)
    assert "conv0" in runner.params["params"]


def test_train_py_cnn_lstm_wiring(tmp_path):
    """run.policy=cnn_lstm builds the pixel-recurrent model, trains on the
    scan tier, checkpoints, and evaluates (recurrent scan eval path)."""
    from drone_tpu.train import evaluate, train
    from drone_tpu.utils.config import Config

    cfg = Config.default().with_overrides([
        "run.policy=cnn_lstm", "train.num_envs=32", "train.horizon=8",
        "train.epochs=1", "train.num_minibatches=1", "run.mesh=false",
        "run.total_updates=2", "run.log_interval=10",
        "run.checkpoint_interval=100",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.run.lstm_hidden = 16
    runner, last = train(cfg)
    assert np.isfinite(last["loss"])
    assert "lstm" in runner.params["params"]
    assert "conv0" in runner.params["params"]
    cfg.env.params["horizon"] = 30
    stats = evaluate(cfg, runner=runner, episodes=4)
    assert stats["episodes"] >= 4
    assert np.isfinite(stats["ep_return_mean"])


def test_encoder_module_params_rejected_by_kernel_dispatch():
    """A custom encoder_module policy must be REJECTED by the recurrent
    kernels' encoder dispatch with a clear error (not silently classified
    as an empty dense encoder and left to die in an opaque matmul shape
    mismatch deep in kernel tracing). The scan tier (ppo_rnn, above) is
    the supported path for arbitrary encoders."""
    import pytest

    from drone_tpu.ops.pallas_acting_lstm import lstm_encoder_kind

    enc = PatchCNNEncoder(res=8, patch0=2, patch1=2, channels=(8, 8),
                          hidden=16)
    model = LSTMActorCritic(hidden=16, encoder_module=enc)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                        model.initial_carry((1,)))
    with pytest.raises(ValueError, match="encoder_module"):
        lstm_encoder_kind(params)
    # the two kernel-supported structures still classify
    dense = LSTMActorCritic(hidden=16, encoder=(16,))
    pd = dense.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                    dense.initial_carry((1,)))
    assert lstm_encoder_kind(pd)[0] == "dense"
    pc = tiny_model().init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                           tiny_model().initial_carry((1,)))
    assert lstm_encoder_kind(pc)[0] == "cnn"
