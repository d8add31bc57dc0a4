"""Config-4 tier (BASELINE.json:10): on-device PPO — loss/GAE unit tests
against NumPy oracles + a short learning-curve gate on hover (SURVEY.md §4.2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu.models import ActorCritic


def test_gaussian_logp_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.randn(32, 4).astype(np.float32)
    mean = rng.randn(32, 4).astype(np.float32)
    log_std = rng.randn(4).astype(np.float32) * 0.1
    got = np.asarray(ppo_mod.gaussian_logp(jnp.asarray(a), jnp.asarray(mean),
                                           jnp.asarray(np.broadcast_to(log_std, a.shape))))
    std = np.exp(log_std)
    want = (-0.5 * ((a - mean) / std) ** 2 - np.log(std)
            - 0.5 * np.log(2 * np.pi)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gaussian_entropy_matches_numpy():
    log_std = np.float32([0.1, -0.3, 0.0, 0.5])
    got = float(ppo_mod.gaussian_entropy(jnp.asarray(log_std)))
    want = (log_std + 0.5 * (1 + np.log(2 * np.pi))).sum()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gae_matches_numpy_oracle():
    rng = np.random.RandomState(1)
    T, B = 40, 7
    rewards = rng.randn(T, B).astype(np.float32)
    values = rng.randn(T, B).astype(np.float32)
    dones = (rng.rand(T, B) < 0.1)
    last_value = rng.randn(B).astype(np.float32)
    gamma, lam = 0.99, 0.95

    adv_j, ret_j = ppo_mod.compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_value), gamma, lam,
    )

    adv = np.zeros((T, B), np.float64)
    next_adv = np.zeros(B)
    next_val = last_value.astype(np.float64)
    for t in reversed(range(T)):
        nt = 1.0 - dones[t]
        delta = rewards[t] + gamma * next_val * nt - values[t]
        next_adv = delta + gamma * lam * nt * next_adv
        adv[t] = next_adv
        next_val = values[t]
    np.testing.assert_allclose(np.asarray(adv_j), adv, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret_j), adv + values, rtol=1e-4, atol=1e-5)


def test_gae_done_blocks_bootstrap():
    # with done=1 everywhere, advantage is just r - v
    T, B = 5, 3
    rewards = np.ones((T, B), np.float32)
    values = np.full((T, B), 0.25, np.float32)
    dones = np.ones((T, B), bool)
    adv, ret = ppo_mod.compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.ones(B, jnp.float32) * 99.0, 0.99, 0.95,
    )
    np.testing.assert_allclose(np.asarray(adv), 0.75, rtol=1e-6)


@pytest.fixture(scope="module")
def trained():
    env = drone_tpu.DroneEnv(task="hover")
    cfg = ppo_mod.PPOConfig(horizon=32, num_envs=512, epochs=4,
                            num_minibatches=4, lr=3e-3, ent_coef=0.0)
    model = ActorCritic(hidden=(32, 32))
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)
    step = jax.jit(ppo_mod.make_train_step(model.apply, opt, env.params,
                                           env.statics, cfg))
    metrics = []
    for _ in range(80):
        runner, m = step(runner)
        metrics.append({k: float(v) for k, v in m.items()})
    return env, model, runner, metrics


def test_train_step_runs_and_is_finite(trained):
    _, _, runner, metrics = trained
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert all(np.isfinite(m["ep_return_mean"]) for m in metrics)
    for leaf in jax.tree_util.tree_leaves(runner.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_learning_curve_improves(trained):
    """Mean reward over the last 5 updates must beat the first 5 — the
    learning-curve regression gate (BASELINE.json:10), sized for CPU CI."""
    _, _, _, metrics = trained
    first = np.mean([m["reward_mean"] for m in metrics[:5]])
    last = np.mean([m["reward_mean"] for m in metrics[-5:]])
    assert last > first + 0.2, (first, last)
    assert last > 0.3, last  # absolute hover-quality threshold


def test_policy_update_changes_params(trained):
    env, model, runner, _ = trained
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=64, epochs=1, num_minibatches=1)
    fresh = ppo_mod.init_runner(model, env, cfg, seed=0)
    before = jax.tree_util.tree_leaves(fresh.params)
    after = jax.tree_util.tree_leaves(runner.params)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(after, before)]
    assert max(diffs) > 1e-4


def test_lstm_policy_forward():
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.types import OBS_DIM

    model = LSTMActorCritic(hidden=32, encoder=(32,))
    carry = model.initial_carry((5,))
    obs = jnp.zeros((5, OBS_DIM))
    params = model.init(jax.random.PRNGKey(0), obs, carry)
    mean, log_std, value, carry2 = model.apply(params, obs, carry)
    assert mean.shape == (5, 4) and value.shape == (5,)
    # carry actually updates
    assert float(jnp.abs(carry2[1]).max()) >= 0.0
