"""Recurrent PPO (LSTM + truncated BPTT) tests — the reference trainer's
LSTM path (SURVEY.md §2.2 #9-#10). Covers: carry masking on auto-reset,
gradient flow through time (BPTT), a full train step on CPU, the sharded
recurrent step on the 8-device virtual mesh, and the train.py wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu import ppo_rnn
from drone_tpu.models import LSTMActorCritic
from drone_tpu.parallel import make_mesh, make_sharded_train_step
from drone_tpu.parallel.mesh import place_runner


def tiny_cfg(num_envs=32):
    return ppo_mod.PPOConfig(horizon=8, num_envs=num_envs, epochs=2,
                             num_minibatches=2)


def tiny_setup(num_envs=32, task="hover"):
    env = drone_tpu.DroneEnv(task=task)
    cfg = tiny_cfg(num_envs)
    model = LSTMActorCritic(hidden=16, encoder=(16,))
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    return env, cfg, model, opt, runner


def test_mask_carry_zeroes_done_lanes():
    h = jnp.ones((4, 3))
    done = jnp.asarray([True, False, True, False])
    out = ppo_rnn._mask_carry((h, 2 * h), done)
    np.testing.assert_array_equal(np.asarray(out[0][:, 0]), [0, 1, 0, 1])
    np.testing.assert_array_equal(np.asarray(out[1][:, 0]), [0, 2, 0, 2])


def test_recurrent_train_step_runs_and_learns_params():
    env, cfg, model, opt, runner = tiny_setup()
    step = jax.jit(ppo_rnn.make_recurrent_train_step(
        model.apply, opt, env.params, env.statics, cfg))
    p0 = jax.tree_util.tree_leaves(runner.params)
    for _ in range(3):
        runner, m = step(runner)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["approx_kl"]))
    p1 = jax.tree_util.tree_leaves(runner.params)
    # every parameter leaf (incl. the LSTM kernels) must have moved
    moved = [not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p0, p1)]
    assert all(moved), f"stale leaves: {[i for i, m_ in enumerate(moved) if not m_]}"
    assert int(runner.update_idx) == 3


def test_bptt_gradients_flow_through_time():
    """The loss at late timesteps must produce gradients on the recurrent
    kernel via the scan — i.e. BPTT is actually wired, not per-step."""
    env, cfg, model, opt, runner = tiny_setup(num_envs=8)

    T, B = 6, 8
    obs = jax.random.normal(jax.random.PRNGKey(0), (T, B, env.obs_dim))
    done = jnp.zeros((T, B), bool)
    carry0 = model.initial_carry((B,))

    def last_step_value(params):
        def fwd(lstm, xs):
            obs_t, done_t = xs
            mean, log_std, value, lstm2 = model.apply(params, obs_t, lstm)
            return ppo_rnn._mask_carry(lstm2, done_t), value

        _, values = jax.lax.scan(fwd, carry0, (obs, done))
        return jnp.sum(values[-1])  # only the LAST timestep contributes

    grads = jax.grad(last_step_value)(runner.params)
    lstm_grads = [g for p, g in jax.tree_util.tree_flatten_with_path(grads)[0]
                  if "lstm" in str(p)]
    assert lstm_grads and all(
        np.abs(np.asarray(g)).max() > 0 for g in lstm_grads
    )


def test_carry_resets_in_rollout():
    """Lanes that crash mid-rollout must restart with zero hidden state."""
    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=8, encoder=(8,))
    n = 16
    state = env.init_batch(3, n)
    carry = jax.tree_util.tree_map(
        lambda c: c + 1.0, model.initial_carry((n,))
    )  # nonzero everywhere
    params = model.init(jax.random.PRNGKey(0),
                        env.observe_batch(state)[:1],
                        model.initial_carry((1,)))
    # zero-thrust -> all lanes crash within ~200 steps
    p = env.params.replace(horizon=jnp.int32(10))
    env2 = drone_tpu.DroneEnv(params=p)
    _, final_carry, outs = jax.jit(
        lambda s, c, pp: ppo_rnn.rollout_recurrent(model, params, env2, s, c,
                                                   12, env_params=pp)
    )(state, carry, p)
    done_any = np.asarray(outs.terminated | outs.truncated).any(axis=0)
    assert done_any.all()  # horizon=10 < 12 steps: every lane reset
    # after a reset the carry was zeroed then updated once or twice — it must
    # differ from what un-reset propagation would give; cheap invariant:
    # the final carry is finite and not the initial all-ones
    h = np.asarray(final_carry[0])
    assert np.isfinite(h).all() and not np.allclose(h, 1.0)


def test_sharded_recurrent_step_matches_sharding_invariants():
    env, cfg, model, opt, runner = tiny_setup(num_envs=64)
    mesh = make_mesh()
    runner = place_runner(mesh, runner)
    step = make_sharded_train_step(
        model.apply, opt, env.params, env.statics, cfg, mesh,
        example_runner=runner, recurrent=True,
    )
    for _ in range(2):
        runner, m = step(runner)
    assert np.isfinite(float(m["loss"]))
    # params replicated across devices
    leaf = jax.tree_util.tree_leaves(runner.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # carry sharded over lanes
    from jax.sharding import PartitionSpec as P

    assert runner.carry[0].sharding.spec == P("data")


def test_train_py_lstm_wiring(tmp_path):
    from drone_tpu.train import evaluate, train
    from drone_tpu.utils.config import Config

    cfg = Config.default().with_overrides([
        "run.policy=lstm", "run.lstm_hidden=8", "run.total_updates=2",
        "run.log_interval=1", "run.checkpoint_interval=100",
        "train.num_envs=32", "train.horizon=8", "train.epochs=1",
        "train.num_minibatches=1", "run.mesh=false",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.run.hidden = (8,)
    runner, last = train(cfg)
    assert np.isfinite(last["loss"])
    cfg.env.params["horizon"] = 50
    stats = evaluate(cfg, runner=runner, episodes=4)  # scan path (4 % 128)
    assert stats["episodes"] >= 4
    fast = evaluate(cfg, runner=runner, episodes=128)  # recurrent kernel path
    assert fast["episodes"] >= 128
    assert np.isfinite(fast["ep_return_mean"]) and fast["ep_return_std"] >= 0


def test_train_py_lstm_megakernel_dispatch(tmp_path):
    """run.rollout=pallas routes the LSTM policy to the fully-fused
    recurrent megakernel trainer when the batch shape supports the update
    kernel's minibatch tiling (fused-adam opt state), and to the hybrid
    rollout-kernel + XLA-update tier otherwise (optax opt state)."""
    from drone_tpu import ppo_pallas
    from drone_tpu.train import train
    from drone_tpu.utils.config import Config

    base = [
        "run.policy=lstm", "run.lstm_hidden=8", "run.total_updates=2",
        "run.log_interval=1", "run.checkpoint_interval=100",
        "train.horizon=8", "train.epochs=1", "train.num_minibatches=2",
        "run.mesh=false", "run.rollout=pallas", "run.save_final=false",
    ]
    cfg = Config.default().with_overrides(base + ["train.num_envs=256"])
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.run.hidden = (8,)
    cfg.run.run_name = "full"
    runner, last = train(cfg)
    assert np.isfinite(last["loss"])
    assert ppo_pallas.is_fused_opt_state(runner.opt_state)
    assert float(runner.opt_state[0]) == 2 * 1 * 2  # updates*epochs*mb

    # 128 envs = 1 lane row: minibatches can't tile the env axis for the
    # update kernel -> the hybrid tier (rollout kernel, optax update)
    cfg2 = Config.default().with_overrides(base + ["train.num_envs=128"])
    cfg2.run.checkpoint_dir = str(tmp_path)
    cfg2.run.hidden = (8,)
    cfg2.run.run_name = "hybrid"
    runner2, last2 = train(cfg2)
    assert np.isfinite(last2["loss"])
    assert not ppo_pallas.is_fused_opt_state(runner2.opt_state)


def test_bad_policy_rejected():
    from drone_tpu.train import build
    from drone_tpu.utils.config import Config

    cfg = Config.default()
    cfg.run.policy = "transformer"
    with pytest.raises(ValueError):
        build(cfg)


def test_segmented_forward_equals_full_when_bptt_is_horizon():
    """bptt == T reproduces the unsegmented forward exactly."""
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.ppo_rnn import _mask_carry, segmented_forward

    model = LSTMActorCritic(hidden=16, encoder=(16,))
    T, L = 8, 6
    key = jax.random.PRNGKey(0)
    carry = model.initial_carry((L,))
    params = model.init(key, jnp.zeros((1, 13)), model.initial_carry((1,)))
    obs = jax.random.normal(key, (T, L, 13))
    done = jax.random.bernoulli(jax.random.PRNGKey(1), 0.2, (T, L))

    def full(lstm, xs):
        o, d = xs
        mean, ls, v, lstm2 = model.apply(params, o, lstm)
        return _mask_carry(lstm2, d), (mean, ls, v)

    _, (m_ref, ls_ref, v_ref) = jax.lax.scan(full, carry, (obs, done))
    c0 = jax.tree_util.tree_map(lambda c: c[None], carry)  # (S=1, L, H)
    m, ls, v = segmented_forward(model.apply, params, obs, done, c0, T)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))


def test_segmented_forward_truncates_gradients():
    """With bptt < T, d(loss over late segment)/d(obs in earlier segment)
    is exactly zero; with full BPTT it is not."""
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.ppo_rnn import _mask_carry, segmented_forward

    model = LSTMActorCritic(hidden=8, encoder=(8,))
    T, L, bptt = 8, 4, 4
    key = jax.random.PRNGKey(0)
    carry = model.initial_carry((L,))
    params = model.init(key, jnp.zeros((1, 13)), model.initial_carry((1,)))
    obs = jax.random.normal(key, (T, L, 13))
    done = jnp.zeros((T, L), bool)

    # segment anchors from an actual rollout of the carries
    def roll(lstm, xs):
        o, d = xs
        _, _, _, lstm2 = model.apply(params, o, lstm)
        return _mask_carry(lstm2, d), lstm
    _, carries = jax.lax.scan(roll, carry, (obs, done))
    anchors = jax.tree_util.tree_map(
        lambda c: c[jnp.asarray([0, bptt])], carries)  # (S=2, L, H)

    def late_loss(obs_in, c0, b):
        _, _, v = segmented_forward(model.apply, params, obs_in, done, c0, b)
        return jnp.sum(v[bptt:])  # only the SECOND segment's values

    g_trunc = jax.grad(late_loss)(obs, anchors, bptt)
    g_full = jax.grad(late_loss)(
        obs, jax.tree_util.tree_map(lambda c: c[:1], anchors), T)
    early_trunc = float(jnp.abs(g_trunc[:bptt]).max())
    early_full = float(jnp.abs(g_full[:bptt]).max())
    assert early_trunc == 0.0, "gradient leaked across the segment boundary"
    assert early_full > 1e-6, "full BPTT should propagate into early steps"


def test_recurrent_training_with_bptt_horizon():
    """The trainer runs with bptt_horizon < horizon, stays finite, and
    matches the bptt==horizon build when the knob equals the horizon."""
    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=16, encoder=(16,))
    base = dict(horizon=8, num_envs=32, epochs=2, num_minibatches=2)
    cfgs = {
        "full": ppo_mod.PPOConfig(**base),
        "explicit-full": ppo_mod.PPOConfig(**base, bptt_horizon=8),
        "trunc": ppo_mod.PPOConfig(**base, bptt_horizon=4),
    }
    outs = {}
    for name, cfg in cfgs.items():
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=3)
        step = jax.jit(ppo_rnn.make_recurrent_train_step(
            model.apply, opt, env.params, env.statics, cfg))
        for _ in range(2):
            runner, m = step(runner)
        assert np.isfinite(float(m["loss"])), name
        outs[name] = (runner, m)
    # bptt_horizon == horizon is exactly the default behavior
    for (a, b) in zip(
            jax.tree_util.tree_leaves(outs["full"][0].params),
            jax.tree_util.tree_leaves(outs["explicit-full"][0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # truncation changes the update (same data, different gradient depth)
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(outs["full"][0].params),
        jax.tree_util.tree_leaves(outs["trunc"][0].params))]
    assert max(diffs) > 0
