"""Pixel-observation pipeline tests (pixels.py + PixelActorCritic).

The gate the round-1 verdict asked for: the CNN policy trained end-to-end
through the REAL trainer on a pixel observation path (not just shape/grad
checks) — value loss must improve over a short run.
"""

import numpy as np
import jax
import jax.numpy as jnp

import drone_tpu
from drone_tpu import pixels
from drone_tpu import ppo as ppo_mod
from drone_tpu.models import PixelActorCritic
from drone_tpu.types import OBS_DIM


def _obs(rel=(0, 0, 0), quat=(1, 0, 0, 0), vel=(0, 0, 0), omega=(0, 0, 0)):
    return jnp.asarray([*rel, *quat, *vel, *omega], jnp.float32)[None]


def test_renderer_semantics():
    res = 24
    # level drone, target straight ahead (+x): blob on the +x half of ch0,
    # horizon blob at the image center of ch1 with full amplitude
    img = pixels.obs_to_pixels(_obs(rel=(2.0, 0.0, 0.0)), res)[0]
    assert img.shape == (res, res, 4)
    ch0 = np.asarray(img[..., 0])
    iy, ix = np.unravel_index(ch0.argmax(), ch0.shape)
    assert ix > res // 2  # +x maps to the +x side (grid x = last axis)
    ch1 = np.asarray(img[..., 1])
    hy, hx = np.unravel_index(ch1.argmax(), ch1.shape)
    assert abs(hx - res // 2) <= 1 and abs(hy - res // 2) <= 1
    assert ch1.max() > 0.9  # upright -> amplitude ~1

    # inverted drone (180 deg about x): horizon amplitude collapses
    img_inv = pixels.obs_to_pixels(_obs(quat=(0.0, 1.0, 0.0, 0.0)), res)[0]
    assert float(img_inv[..., 1].max()) < 0.1

    # yaw 90 deg about z moves the target blob to the body-y axis
    s = float(np.sqrt(0.5))
    img_yaw = pixels.obs_to_pixels(
        _obs(rel=(2.0, 0.0, 0.0), quat=(s, 0.0, 0.0, s)), res)[0]
    cy = np.asarray(img_yaw[..., 0])
    jy, jx = np.unravel_index(cy.argmax(), cy.shape)
    assert (jy, jx) != (iy, ix)  # the camera actually rotates

    # velocity and rate channels light up exactly when nonzero
    img_v = pixels.obs_to_pixels(_obs(vel=(1.0, 0, 0), omega=(0, 2.0, 0)))[0]
    assert float(img_v[..., 2].max()) > 0.3
    assert float(img_v[..., 3].max()) > 0.5
    img_0 = pixels.obs_to_pixels(_obs())[0]
    assert float(img_0[..., 2].max()) < 1e-6
    assert float(img_0[..., 3].max()) < 1e-6


def test_renderer_batched_and_finite():
    env = drone_tpu.DroneEnv()
    state = env.init_batch(0, 64)
    obs = env.observe_batch(state)
    img = jax.jit(pixels.obs_to_pixels)(obs)
    assert img.shape == (64, 24, 24, 4)
    assert np.isfinite(np.asarray(img)).all()


def test_cnn_trains_through_real_trainer():
    """PixelActorCritic through ppo.make_train_step: finite and value loss
    improves (the policy-gradient signal needs more updates than a CI run,
    but the critic fitting the pixel features is a real learning gate)."""
    env = drone_tpu.DroneEnv()
    model = PixelActorCritic(res=16, channels=(8, 16), kernels=(4, 3),
                             strides=(2, 2), hidden=32)
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=64, epochs=2,
                            num_minibatches=2, lr=1e-3)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)
    step = jax.jit(ppo_mod.make_train_step(
        model.apply, opt, env.params, env.statics, cfg))
    vloss = []
    for _ in range(25):
        runner, m = step(runner)
        assert np.isfinite(float(m["loss"]))
        vloss.append(float(m["v_loss"]))
    # the first couple of updates see artificially easy targets (episodes
    # are all young), so the improvement gate starts after the return
    # distribution fills out
    assert np.mean(vloss[-6:]) < np.mean(vloss[2:8]), vloss
    for leaf in jax.tree_util.tree_leaves(runner.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_grad_accum_matches_full_batch_update():
    """grad_accum chunks the minibatch forward+backward but must leave the
    TRAINING SEMANTICS unchanged: params after one train step with
    grad_accum=4 match grad_accum=1 to float tolerance (mean of equal-chunk
    means == full mean, up to reduction order) — the knob that lets the
    overlapping-conv pixel policy train at the 64k production batch."""
    env = drone_tpu.DroneEnv()
    model = PixelActorCritic(res=8, channels=(4, 8), kernels=(3, 3),
                             strides=(1, 1), hidden=16)
    base = dict(horizon=8, num_envs=32, epochs=2, num_minibatches=2)
    runs = {}
    for ga in (1, 4):
        cfg = ppo_mod.PPOConfig(grad_accum=ga, **base)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_mod.init_runner(model, env, cfg, seed=0)
        step = jax.jit(ppo_mod.make_train_step(
            model.apply, opt, env.params, env.statics, cfg))
        runner, m = step(runner)
        runs[ga] = (runner.params, m)
    for a, b in zip(jax.tree_util.tree_leaves(runs[1][0]),
                    jax.tree_util.tree_leaves(runs[4][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(float(runs[1][1]["loss"]),
                               float(runs[4][1]["loss"]), rtol=1e-5,
                               atol=1e-6)


def test_cnn_overlap_trains_with_grad_accum():
    """The overlapping-conv pixel policy LEARNS through the scan trainer
    with grad_accum active (the production-64k configuration, scaled down):
    value loss improves and params stay finite."""
    env = drone_tpu.DroneEnv()
    model = PixelActorCritic()
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=64, epochs=2,
                            num_minibatches=2, lr=1e-3, grad_accum=4)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)
    step = jax.jit(ppo_mod.make_train_step(
        model.apply, opt, env.params, env.statics, cfg))
    vloss = []
    for _ in range(20):
        runner, m = step(runner)
        assert np.isfinite(float(m["loss"]))
        vloss.append(float(m["v_loss"]))
    assert np.mean(vloss[-5:]) < np.mean(vloss[1:6]), vloss
    for leaf in jax.tree_util.tree_leaves(runner.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_cnn_policy_via_train_build(tmp_path):
    """run.policy='cnn' wires through the standard train() driver."""
    from drone_tpu.train import train
    from drone_tpu.utils.config import Config

    cfg = Config.default().with_overrides([
        "train.num_envs=32", "train.horizon=4", "train.epochs=1",
        "train.num_minibatches=1", "run.mesh=false", "run.total_updates=2",
        "run.log_interval=1", "run.checkpoint_interval=100",
        "run.policy=cnn", "run.save_final=false",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    runner, last = train(cfg)
    assert np.isfinite(last["loss"])
    # the params really are the CNN's (PatchCNNActorCritic — the
    # megakernel-trainable pixel policy run.policy=cnn selects)
    names = set(runner.params["params"])
    assert "conv0" in names and "conv1" in names and "actor_mean" in names
