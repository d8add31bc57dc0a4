"""Trajectory-emitting acting megakernel tests (ops/pallas_acting_traj.py).

Contract (the pallas_rollout pattern): in interpret mode on the CPU backend
the kernel is BITWISE-equal to its pure-jnp mirror `traj_act_rollout_reference`
— same matmul formulation, same counter-RNG noise stream, same expression
order. On top of that, the full PPO train step consuming kernel rollouts
(rollout="pallas") must bitwise-match the one consuming reference rollouts
(rollout="pallas_ref"), and training through the kernel path must learn.
"""

import numpy as np
import jax
import jax.numpy as jnp

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu.models import ActorCritic
from drone_tpu.ops import traj_act_rollout_pallas, traj_act_rollout_reference
from tests.helpers import pack_fstate_batch


def _setup(task="hover", integrator="euler", hidden=(32, 32), seed=0):
    env = drone_tpu.DroneEnv(task=task, integrator=integrator)
    model = ActorCritic(hidden=hidden)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 13), jnp.float32))
    return env, model, params


def _assert_traj_bitwise(a, b):
    for name in a._fields:
        xa, xb = getattr(a, name), getattr(b, name)
        if xa.dtype == jnp.bool_:
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                          err_msg=name)
        else:
            np.testing.assert_array_equal(
                np.asarray(xa).view(np.uint32), np.asarray(xb).view(np.uint32),
                err_msg=name)


def test_traj_kernel_bitwise_vs_reference():
    """Single lane block: kernel (interpret) == jnp mirror, bit for bit —
    trajectory planes, final state, and stats."""
    env, model, params = _setup()
    N, T = 256, 12
    p = env.params.replace(horizon=jnp.int32(8))  # truncations inside T
    ref_s, ref_traj, ref_stats = jax.jit(
        lambda s, pp, prm: traj_act_rollout_reference(
            s, prm, pp, env.statics, T)
    )(env.init_batch(5, N), p, params)
    pal_s, pal_traj, pal_stats = traj_act_rollout_pallas(
        env.init_batch(5, N), params, p, env.statics, T,
        lanes_per_block=N, time_chunk=4, interpret=True)
    _assert_traj_bitwise(pal_traj, ref_traj)
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(pal_s)).view(np.uint32),
        np.asarray(pack_fstate_batch(ref_s)).view(np.uint32))
    # counts are integer-valued sums (commute exactly); float sums differ
    # only in reduction order (per-lane-over-T then lanes, vs flat sum)
    for k in ("episodes", "ep_length_sum"):
        assert float(pal_stats[k]) == float(ref_stats[k]), k
    for k in ("reward_sum", "ep_return_sum", "ep_return_sq_sum"):
        np.testing.assert_allclose(float(pal_stats[k]), float(ref_stats[k]),
                                   rtol=1e-6, err_msg=k)
    # episodes actually ended inside the window (auto-reset exercised)
    assert float(pal_stats["episodes"]) > 0


def test_traj_kernel_multiblock_and_tasks():
    """Multiple lane blocks + waypoint/rk4: same bitwise contract (the
    per-column matmul reduction order is block-size independent)."""
    env, model, params = _setup(task="waypoint", integrator="rk4",
                                hidden=(16,))
    N, T = 512, 8
    ref_s, ref_traj, _ = jax.jit(
        lambda s, pp, prm: traj_act_rollout_reference(
            s, prm, pp, env.statics, T)
    )(env.init_batch(9, N), env.params, params)
    pal_s, pal_traj, _ = traj_act_rollout_pallas(
        env.init_batch(9, N), params, env.params, env.statics, T,
        lanes_per_block=256, time_chunk=2, interpret=True)
    _assert_traj_bitwise(pal_traj, ref_traj)
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(pal_s)).view(np.uint32),
        np.asarray(pack_fstate_batch(ref_s)).view(np.uint32))


def test_traj_logp_consistent_with_loss_recomputation():
    """The stored logp equals gaussian_logp(action, mean, log_std) with the
    policy evaluated the kernel's way — so PPO's ratio is exp(0)=1 on the
    first minibatch (logp reconstructed from the stored action, not the raw
    noise)."""
    env, model, params = _setup()
    N, T = 128, 4
    _, traj, _ = traj_act_rollout_pallas(
        env.init_batch(3, N), params, env.params, env.statics, T,
        lanes_per_block=N, interpret=True)
    from drone_tpu.ops.pallas_acting_traj import _log_std, _tower
    from drone_tpu.ops.pallas_acting import actor_weights

    X = traj.obs.reshape(T * N, 13).T
    mean = _tower(X, actor_weights(params)).T.reshape(T, N, 4)
    ls = jnp.broadcast_to(_log_std(params)[0], mean.shape)
    logp = ppo_mod.gaussian_logp(traj.action, mean, ls)
    np.testing.assert_allclose(np.asarray(traj.logp), np.asarray(logp),
                               rtol=1e-5, atol=1e-6)


def test_train_step_pallas_vs_reference_bitwise():
    """Full fused train step: rollout='pallas' (interpret) vs
    rollout='pallas_ref' after 2 updates.

    The trajectory/env-state path is exact (bitwise — elementwise chains
    only). Params carry the update's matmul/sum reductions, whose order
    XLA:CPU re-fuses differently across surrounding graphs, so the gate
    there is tight allclose; the per-call bitwise update gate lives in
    tests/test_pallas_update.py (isolated compilation contexts)."""
    env, model, params = _setup()
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=256, epochs=2,
                            num_minibatches=2)
    opt = ppo_mod.make_optimizer(cfg)
    r0 = ppo_mod.init_runner(model, env, cfg, seed=1)

    step_pal = jax.jit(ppo_mod.make_train_step(
        model.apply, opt, env.params, env.statics, cfg,
        rollout="pallas", rollout_interpret=True))
    step_ref = jax.jit(ppo_mod.make_train_step(
        model.apply, opt, env.params, env.statics, cfg,
        rollout="pallas_ref"))

    ra, rb = r0, r0
    for _ in range(2):
        ra, ma = step_pal(ra)
        rb, mb = step_ref(rb)
    for (pa, pb) in zip(jax.tree_util.tree_leaves(ra.params),
                        jax.tree_util.tree_leaves(rb.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-3, atol=1e-6)
    # ulp-level param differences can flip env trajectories only through
    # the policy mean; after 2 tiny updates states must still agree tightly
    np.testing.assert_allclose(
        np.asarray(pack_fstate_batch(ra.env_state)),
        np.asarray(pack_fstate_batch(rb.env_state)), rtol=1e-4, atol=1e-5)
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=1e-3, atol=1e-6, err_msg=k)


def test_train_step_pallas_learns():
    """Per-step reward improves over a short kernel-rollout training run —
    the learning gate of tests/test_ppo.py::test_learning_curve_improves,
    through the megakernel path (reward_mean, not ep_return_mean: returns
    fall as the policy survives longer under the shaping penalties)."""
    env, model, params = _setup(hidden=(32, 32))
    # test_ppo.py's trained-fixture hyperparameters (lr/ent_coef matter:
    # the defaults don't crest within 80 updates at this scale)
    # num_envs: the megakernel trainer minibatches 128-lane rows, so
    # num_envs/128 must divide num_minibatches
    cfg = ppo_mod.PPOConfig(horizon=32, num_envs=512, epochs=4,
                            num_minibatches=4, lr=3e-3, ent_coef=0.0)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)
    step = jax.jit(ppo_mod.make_train_step(
        model.apply, opt, env.params, env.statics, cfg,
        rollout="pallas", rollout_interpret=True))
    rewards = []
    for _ in range(80):
        runner, m = step(runner)
        rewards.append(float(m["reward_mean"]))
    first = np.mean(rewards[:5])
    last = np.mean(rewards[-5:])
    assert np.isfinite(last)
    assert last > first + 0.2, (first, last)
    assert last > 0.3, last


def test_traj_rollout_chained_calls_consume_fresh_noise():
    """Chained kernel calls (T < horizon) continue the episode-step-keyed
    noise stream: two T-step calls == one 2T-step call, bit for bit."""
    env, model, params = _setup(hidden=(16,))
    N, T = 128, 6
    s0 = env.init_batch(11, N)
    mid, tr1, _ = traj_act_rollout_pallas(
        s0, params, env.params, env.statics, T, lanes_per_block=N,
        interpret=True)
    fin, tr2, _ = traj_act_rollout_pallas(
        mid, params, env.params, env.statics, T, lanes_per_block=N,
        interpret=True)
    full, trf, _ = traj_act_rollout_pallas(
        env.init_batch(11, N), params, env.params, env.statics, 2 * T,
        lanes_per_block=N, interpret=True)
    both = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), tr1, tr2)
    _assert_traj_bitwise(both, trf)
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(fin)).view(np.uint32),
        np.asarray(pack_fstate_batch(full)).view(np.uint32))


def test_chunk_pickers_mosaic_legality():
    """The rollout time-chunk picker returns Mosaic-legal TRAILING block
    dims (multiple of 8, or the whole horizon); the update pickers tile
    leading/second-minor dims with their own rules."""
    from drone_tpu.ops.pallas_acting_traj import pick_time_chunk
    from drone_tpu.ops.pallas_update import pick_row_block, pick_update_chunk

    for T in (4, 8, 12, 16, 20, 24, 32, 64, 128, 100):
        tc = pick_time_chunk(T)
        assert T % tc == 0, (T, tc)
        assert tc % 8 == 0 or tc == T, (T, tc)
        assert tc <= max(16, T)
    assert pick_time_chunk(128) == 16
    assert pick_time_chunk(12) == 12   # no 8-multiple divisor <= cap
    assert pick_time_chunk(24) == 8
    # update time chunk: any divisor <= cap (leading block dim, no 8-rule)
    for T in (4, 8, 12, 16, 24, 128, 100):
        for cap in (1, 2, 16):
            tc = pick_update_chunk(T, cap=cap)
            assert T % tc == 0 and tc <= max(cap, 1)
    assert pick_update_chunk(128) == 16
    assert pick_update_chunk(128, cap=2) == 2
    assert pick_update_chunk(12) == 12
    # row block: largest power-of-two divisor <= 8 (compiled tile = 8 rows)
    assert pick_row_block(128) == 8
    assert pick_row_block(12) == 4
    assert pick_row_block(2) == 2
    assert pick_row_block(1) == 1
    assert pick_row_block(3) == 1


def test_lane_block_picker_prefers_1024():
    from drone_tpu.ops.pallas_rollout import pick_lanes_per_block

    assert pick_lanes_per_block(65536) == 8192
    assert pick_lanes_per_block(4096) == 4096
    assert pick_lanes_per_block(1024 * 5, 4096) == 1024  # 5120: 1024 | it
    assert pick_lanes_per_block(8320, 8192) == 1664      # no 1024-divisor
    assert pick_lanes_per_block(256, 8192) == 256        # interpret-only


def test_compiled_lane_alignment_guard():
    """Misaligned lane blocks raise a descriptive error BEFORE Mosaic
    compilation when interpret=False (the guard precedes any device work,
    so it is testable on CPU)."""
    import pytest

    env, model, params = _setup(hidden=(16,))
    state = env.init_batch(0, 256)  # 2 rows: fine interpreted, not compiled
    with pytest.raises(ValueError, match="1024-aligned"):
        traj_act_rollout_pallas(state, params, env.params, env.statics, 8,
                                lanes_per_block=256, interpret=False)
    from drone_tpu.ops import act_rollout_pallas

    with pytest.raises(ValueError, match="1024-aligned"):
        act_rollout_pallas(state, params, env.params, env.statics, 8,
                           lanes_per_block=256, interpret=False)

    # the recurrent serving kernel applies the same guard (it has the same
    # (L,)->(rb,128) reshapes; an unguarded call would die inside Mosaic)
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.ops import lstm_act_rollout_pallas

    lmodel = LSTMActorCritic(hidden=16, encoder=(16,))
    lcarry = lmodel.initial_carry((256,))
    lparams = lmodel.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 13), jnp.float32),
                          jax.tree_util.tree_map(lambda c: c[:1], lcarry))
    with pytest.raises(ValueError, match="1024-aligned"):
        lstm_act_rollout_pallas(state, lparams, lcarry, env.params,
                                env.statics, 8, interpret=False)
