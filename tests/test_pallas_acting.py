"""Fused policy+env acting megakernel tests (drone_tpu/ops/pallas_acting.py).

Unlike the env-only megakernel, the acting kernel computes the policy as
(W^T @ obs) on the MXU while the scan path computes (obs @ W); float matmul
reduction order differs, so bitwise equality is NOT the contract here (the
policy is a learned function — the env parity gate is untouched). The
contract is: short-horizon states within tight tolerance, identical episode
accounting, and long-horizon statistics in agreement."""

import numpy as np
import jax
import jax.numpy as jnp

import drone_tpu
from drone_tpu import env as env_mod
from drone_tpu.models import ActorCritic
from drone_tpu.ops import act_rollout_pallas
from tests.helpers import pack_fstate_batch


def _setup(task="hover", integrator="euler", hidden=(64, 64)):
    env = drone_tpu.DroneEnv(task=task, integrator=integrator)
    model = ActorCritic(hidden=hidden)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13), jnp.float32))
    return env, model, params


def _scan(env, model, state, p, params, T):
    def run(s, pp, prm):
        def body(ss, _):
            obs = jax.vmap(env_mod.observe)(ss)
            mean, _, _ = model.apply(prm, obs)
            s2, out = jax.vmap(
                lambda x, y: env_mod.step(x, y, pp, env.statics)
            )(ss, mean)
            return s2, (out.reward, out.terminated | out.truncated)
        return jax.lax.scan(body, s, None, length=T)

    return jax.jit(run)(state, p, params)


def test_acting_kernel_short_horizon_tolerance():
    env, model, params = _setup()
    N, T = 256, 3
    state = env.init_batch(2, N)
    ref, (r, d) = _scan(env, model, state, env.params, params, T)
    pal, stats = act_rollout_pallas(state, params, env.params, env.statics,
                                    T, lanes_per_block=N, interpret=True)
    np.testing.assert_allclose(pack_fstate_batch(pal), pack_fstate_batch(ref),
                               rtol=2e-5, atol=2e-6)
    assert int(stats["episodes"]) == int(jnp.sum(d))
    np.testing.assert_allclose(float(stats["reward_sum"]), float(jnp.sum(r)),
                               rtol=1e-4)


def test_acting_kernel_long_horizon_statistics():
    """Over many episodes the two implementations of the same policy must
    agree statistically even though individual chaotic trajectories drift."""
    env, model, params = _setup()
    N, T = 512, 400
    p = env.params.replace(horizon=jnp.int32(60))
    ref, (r, d) = _scan(env, model, env.init_batch(2, N), p, params, T)
    pal, stats = act_rollout_pallas(env.init_batch(2, N), params, p,
                                    env.statics, T, lanes_per_block=N,
                                    interpret=True)
    n_ref = int(jnp.sum(d))
    n_pal = int(stats["episodes"])
    assert n_ref > 1000
    assert abs(n_pal - n_ref) / n_ref < 0.02
    mean_r_ref = float(jnp.sum(r)) / (N * T)
    mean_r_pal = float(stats["reward_sum"]) / (N * T)
    assert abs(mean_r_pal - mean_r_ref) < 0.01
    # invariants on the final state
    fs = np.asarray(pack_fstate_batch(pal))
    assert np.isfinite(fs).all()
    qn = (fs[:, 6:10] ** 2).sum(axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-5)


def test_evaluate_uses_acting_kernel(tmp_path):
    """train.evaluate's MLP/deterministic fast path (episodes % 128 == 0)
    returns sane stats from the on-chip accumulators, incl. the std from the
    sum-of-squares plane."""
    from drone_tpu.train import evaluate, train
    from drone_tpu.utils.config import Config

    cfg = Config.default().with_overrides([
        "train.num_envs=64", "train.horizon=8", "train.epochs=1",
        "train.num_minibatches=1", "run.mesh=false", "run.total_updates=1",
        "run.log_interval=10", "run.checkpoint_interval=100",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.run.hidden = (16, 16)
    cfg.env.params["horizon"] = 60
    runner, _ = train(cfg)
    stats = evaluate(cfg, runner=runner, episodes=128)
    assert stats["episodes"] >= 128
    assert np.isfinite(stats["ep_return_mean"])
    assert stats["ep_return_std"] >= 0.0
    assert 1.0 <= stats["ep_length_mean"] <= 61.0


def test_acting_kernel_stochastic_mode():
    """stochastic=True adds exp(log_std) * N(0,1) exploration noise from the
    in-kernel counter stream: reproducible, lane-independent, and
    statistically sane (std of effective noise ~= exp(log_std))."""
    env, model, params = _setup()
    # widen the exploration noise so the effect is unmistakable
    params = jax.tree_util.tree_map(lambda x: x, params)
    N, T = 512, 50
    state = env.init_batch(4, N)
    det, sdet = act_rollout_pallas(env.init_batch(4, N), params, env.params,
                                   env.statics, T, lanes_per_block=N,
                                   interpret=True)
    sto1, s1 = act_rollout_pallas(env.init_batch(4, N), params, env.params,
                                  env.statics, T, lanes_per_block=N,
                                  interpret=True, stochastic=True)
    sto2, s2 = act_rollout_pallas(env.init_batch(4, N), params, env.params,
                                  env.statics, T, lanes_per_block=N,
                                  interpret=True, stochastic=True)
    # reproducible (pure counter streams)
    np.testing.assert_array_equal(pack_fstate_batch(sto1),
                                  pack_fstate_batch(sto2))
    # actually different from deterministic
    assert not np.array_equal(pack_fstate_batch(sto1), pack_fstate_batch(det))
    assert float(s1["reward_sum"]) != float(sdet["reward_sum"])
    # noise sanity: numpy mirror of the kernel's Box-Muller over the same
    # threefry blocks gives ~N(0,1) (pltpu.bitcast only exists in-kernel)
    from drone_tpu import prng as prng_mod
    from drone_tpu.ops.pallas_acting import NOISE_BLOCK0

    lanes = np.arange(4096, dtype=np.uint32)
    k0, k1 = prng_mod.threefry2x32_np(np.uint32(0),
                                      np.uint32(prng_mod.GOLDEN),
                                      lanes, np.uint32(0))
    b0, b1 = prng_mod.threefry2x32_np(k0, k1, np.uint32(0),
                                      np.uint32(NOISE_BLOCK0))
    u1 = prng_mod.bits_to_uniform_np(b0)
    u2 = prng_mod.bits_to_uniform_np(b1)
    r = np.sqrt(-2.0 * np.log1p(-u1.astype(np.float64)))
    z = np.concatenate([r * np.cos(2 * np.pi * u2), r * np.sin(2 * np.pi * u2)])
    assert abs(z.mean()) < 0.05 and abs(z.std() - 1.0) < 0.05


def test_acting_kernel_deep_tower_and_tasks():
    """Arbitrary actor depth + non-hover task wire through correctly."""
    env, model, params = _setup(task="waypoint", integrator="rk4",
                                hidden=(32, 32, 32))
    N, T = 256, 3
    state = env.init_batch(7, N)
    ref, (r, d) = _scan(env, model, state, env.params, params, T)
    pal, _ = act_rollout_pallas(state, params, env.params, env.statics, T,
                                lanes_per_block=N, interpret=True)
    np.testing.assert_allclose(pack_fstate_batch(pal), pack_fstate_batch(ref),
                               rtol=2e-5, atol=2e-6)


def test_sharded_acting_kernel_over_mesh():
    """shard_map'd fused policy+env kernel == single-device run (same matmul
    formulation both sides; params ride as traced args)."""
    from drone_tpu.ops import sharded_act_rollout_pallas
    from drone_tpu.parallel import make_mesh

    env, model, params = _setup()
    n = 8 * 256
    p = env.params.replace(horizon=jnp.int32(60))
    final, stats = sharded_act_rollout_pallas(
        make_mesh(), env.init_batch(6, n), params, p, env.statics, 50,
        lanes_per_block=256, interpret=True)
    ref, ref_stats = act_rollout_pallas(
        env.init_batch(6, n), params, p, env.statics, 50,
        lanes_per_block=256, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(final)).view(np.uint32),
        np.asarray(pack_fstate_batch(ref)).view(np.uint32))
    assert float(stats["episodes"]) == float(ref_stats["episodes"])


def test_lstm_acting_kernel_matches_scan():
    """Recurrent acting kernel vs ppo_rnn.rollout_recurrent (deterministic):
    short-horizon tolerance + carry round-trip + long-run episode stats."""
    from drone_tpu import ppo_rnn
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.ops import lstm_act_rollout_pallas

    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=16, encoder=(16,))
    carry = model.initial_carry((256,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                        model.initial_carry((1,)))

    # short horizon: states within tolerance, carries close
    N, T = 256, 3
    state = env.init_batch(2, N)
    ref_s, ref_c, _ = jax.jit(
        lambda s, c, p: ppo_rnn.rollout_recurrent(model, params, env, s, c, T,
                                                  env_params=p)
    )(state, carry, env.params)
    pal_s, pal_c, _ = lstm_act_rollout_pallas(
        env.init_batch(2, N), params, carry, env.params, env.statics, T,
        lanes_per_block=N, interpret=True)
    np.testing.assert_allclose(pack_fstate_batch(pal_s),
                               pack_fstate_batch(ref_s), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pal_c[0]), np.asarray(ref_c[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal_c[1]), np.asarray(ref_c[1]),
                               rtol=1e-4, atol=1e-5)

    # long horizon with resets: episode counts agree statistically and the
    # carry keeps being zeroed on done lanes (finite, bounded)
    T2 = 300
    p = env.params.replace(horizon=jnp.int32(50))
    env2 = drone_tpu.DroneEnv(params=p)
    _, _, outs = jax.jit(
        lambda s, c, pp: ppo_rnn.rollout_recurrent(model, params, env2, s, c,
                                                   T2, env_params=pp)
    )(env.init_batch(2, N), carry, p)
    n_ref = int(jnp.sum(outs.terminated | outs.truncated))
    pal_s2, pal_c2, stats = lstm_act_rollout_pallas(
        env.init_batch(2, N), params, carry, p, env.statics, T2,
        lanes_per_block=N, interpret=True)
    n_pal = int(stats["episodes"])
    assert n_ref > 500
    assert abs(n_pal - n_ref) / n_ref < 0.02
    assert np.isfinite(np.asarray(pal_c2[0])).all()
    assert np.abs(np.asarray(pal_c2[0])).max() <= 1.0  # h = o*tanh(c) bound


def test_block_autosize_on_awkward_batch():
    """Regression: n=8320 (a multiple of 128 but not of 8192) used to crash
    the kernel entry points via lanes_per_block=min(8192, n)."""
    from drone_tpu.ops.pallas_rollout import pick_lanes_per_block

    # exact contract: largest 128-multiple divisor of n that is <= cap
    assert pick_lanes_per_block(8320, 8192) == 1664  # 8320 = 128 * 5 * 13
    assert pick_lanes_per_block(8192, 8192) == 8192
    assert pick_lanes_per_block(1280, 1024) == 640
    assert pick_lanes_per_block(128, 8192) == 128

    env, model, params = _setup(hidden=(16,))
    state = env.init_batch(1, 8320)
    final, stats = act_rollout_pallas(state, params, env.params, env.statics,
                                      3, interpret=True)
    assert final.pos.shape[0] == 8320
    assert np.isfinite(float(stats["reward_sum"]))
