"""Trajectory-emitting LSTM megakernel tests (ops/pallas_acting_lstm.py).

The recurrent analogue of tests/test_pallas_traj.py: in interpret mode on
the CPU backend the kernel is BITWISE-equal to its jnp mirror
`traj_lstm_rollout_reference` (trajectory planes, BPTT carry anchors,
final state, final carry), the mirror's deterministic actions match the
flax scan path, truncation works through the kernel anchors, and the
recurrent trainer consuming kernel rollouts learns.
"""

import numpy as np
import jax
import jax.numpy as jnp

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu import ppo_rnn
from drone_tpu.models import LSTMActorCritic
from drone_tpu.ops import pallas_acting_lstm as PAL
from drone_tpu.ops.pallas_acting_traj import _planes_to_traj
from tests.helpers import pack_fstate_batch


def _setup(hidden=16, encoder=(16,), seed=0, task="hover",
           integrator="euler"):
    env = drone_tpu.DroneEnv(task=task, integrator=integrator)
    model = LSTMActorCritic(hidden=hidden, encoder=encoder)
    carry1 = model.initial_carry((1,))
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 13), jnp.float32), carry1)
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


def test_lstm_traj_kernel_bitwise_vs_reference():
    """Kernel (interpret) == jnp mirror bit for bit: planes, anchors, final
    env state, final carry, stats — across multiple BPTT segments with
    auto-resets inside the window."""
    env, model, params = _setup()
    N, T, bptt = 256, 12, 4
    p = env.params.replace(horizon=jnp.int32(8))
    carry = model.initial_carry((N,))
    ref_s, ref_c, ref_traj, ref_seg, ref_stats = jax.jit(
        lambda s, c, pp, prm: PAL.traj_lstm_rollout_reference(
            s, prm, c, pp, env.statics, T, bptt=bptt)
    )(env.init_batch(5, N), carry, p, params)
    pal_s, pal_c, planes, pal_seg, pal_stats = PAL.traj_lstm_rollout_pallas(
        env.init_batch(5, N), params, carry, p, env.statics, T, bptt=bptt,
        lanes_per_block=N, time_chunk=4, interpret=True)
    pal_traj = _planes_to_traj(planes, N)
    _assert_traj_bitwise(pal_traj, ref_traj)
    for k in range(2):  # (c, h) anchors, one per segment
        assert pal_seg[k].shape == (T // bptt, N, 16)
        np.testing.assert_array_equal(
            np.asarray(pal_seg[k]).view(np.uint32),
            np.asarray(ref_seg[k]).view(np.uint32), err_msg=f"seg[{k}]")
        np.testing.assert_array_equal(
            np.asarray(pal_c[k]).view(np.uint32),
            np.asarray(ref_c[k]).view(np.uint32), err_msg=f"carry[{k}]")
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(pal_s)).view(np.uint32),
        np.asarray(pack_fstate_batch(ref_s)).view(np.uint32))
    for k in ("episodes", "ep_length_sum"):
        assert float(pal_stats[k]) == float(ref_stats[k]), k
    assert float(pal_stats["episodes"]) > 0  # auto-reset exercised


def test_lstm_traj_multiblock():
    """Multiple lane blocks: same bitwise contract (block-size independent
    per-column matmuls)."""
    env, model, params = _setup(hidden=8, encoder=(8,))
    N, T = 512, 8
    carry = model.initial_carry((N,))
    ref_s, _, ref_traj, ref_seg, _ = jax.jit(
        lambda s, c, pp, prm: PAL.traj_lstm_rollout_reference(
            s, prm, c, pp, env.statics, T, bptt=8)
    )(env.init_batch(9, N), carry, env.params, params)
    pal_s, _, planes, pal_seg, _ = PAL.traj_lstm_rollout_pallas(
        env.init_batch(9, N), params, carry, env.params, env.statics, T,
        bptt=8, lanes_per_block=256, time_chunk=8, interpret=True)
    _assert_traj_bitwise(_planes_to_traj(planes, N), ref_traj)
    np.testing.assert_array_equal(
        np.asarray(pal_seg[1]).view(np.uint32),
        np.asarray(ref_seg[1]).view(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(pal_s)).view(np.uint32),
        np.asarray(pack_fstate_batch(ref_s)).view(np.uint32))


def test_lstm_traj_mirror_matches_flax_deterministic():
    """stochastic=False mirror == the flax scan rollout (model.apply in the
    loop): same actions/trajectory within matmul-association tolerance —
    ties the plane-space math to the canonical model."""
    env, model, params = _setup()
    N, T = 64, 6
    carry = model.initial_carry((N,))
    state = env.init_batch(3, N)
    _, _, traj, _, _ = jax.jit(
        lambda s, c, pp, prm: PAL.traj_lstm_rollout_reference(
            s, prm, c, pp, env.statics, T, stochastic=False)
    )(state, carry, env.params, params)
    _, _, outs = ppo_rnn.rollout_recurrent(
        model, params, env, state, carry, T, deterministic=True)
    # rollout_recurrent emits post-step obs; compare the action stream and
    # rewards instead (both fully determine the trajectory)
    np.testing.assert_allclose(np.asarray(traj.reward), np.asarray(outs.reward),
                               rtol=1e-5, atol=1e-6)


def test_lstm_traj_anchor_semantics_and_truncation():
    """The stored anchors reproduce segmented_forward's values: re-running
    the policy from anchor (s) over segment s equals the rollout's stored
    values (deterministic-mode identity), and gradients stop at segment
    boundaries (truncation proof through the kernel path)."""
    env, model, params = _setup()
    N, T, bptt = 128, 8, 4
    carry = model.initial_carry((N,))
    final, _, traj, seg, _ = jax.jit(
        lambda s, c, pp, prm: PAL.traj_lstm_rollout_reference(
            s, prm, c, pp, env.statics, T, bptt=bptt)
    )(env.init_batch(7, N), carry, env.params, params)

    def apply_fn(prm, obs, lstm):
        return model.apply(prm, obs, lstm)

    mean, log_std, value = ppo_rnn.segmented_forward(
        apply_fn, params, traj.obs, traj.done, seg, bptt)
    # the re-run reproduces the rollout's stored values (flax vs plane math:
    # tight tolerance, not bitwise)
    np.testing.assert_allclose(np.asarray(value), np.asarray(traj.value),
                               rtol=1e-4, atol=1e-5)

    # truncation: d value[t<bptt] / d obs[t>=bptt] == 0 and cross-segment
    # gradient of the FIRST segment's loss w.r.t. params ignores later obs
    def seg0_loss(obs):
        m, _, v = ppo_rnn.segmented_forward(
            apply_fn, params, obs, traj.done, seg, bptt)
        return jnp.sum(v[:bptt])

    g = jax.grad(seg0_loss)(traj.obs)
    assert float(jnp.abs(g[:bptt]).max()) > 0
    np.testing.assert_array_equal(np.asarray(g[bptt:]),
                                  np.zeros_like(np.asarray(g[bptt:])))


def test_recurrent_train_step_pallas_vs_reference():
    """Full recurrent train step: rollout='pallas' (interpret) vs
    'pallas_ref' — tight agreement after 2 updates (the update phase is
    shared flax; only the rollout engine differs)."""
    env, model, params = _setup(hidden=16)
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=256, epochs=2,
                            num_minibatches=2, bptt_horizon=4)
    opt = ppo_mod.make_optimizer(cfg)
    r0 = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=1)

    step_pal = jax.jit(ppo_rnn.make_recurrent_train_step(
        model.apply, opt, env.params, env.statics, cfg,
        rollout="pallas", rollout_interpret=True))
    step_ref = jax.jit(ppo_rnn.make_recurrent_train_step(
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
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=1e-3, atol=1e-6, err_msg=k)


def test_recurrent_train_step_pallas_learns():
    """Per-step reward improves over a short kernel-rollout recurrent
    training run — the recurrent analogue of test_train_step_pallas_learns."""
    env, model, params = _setup(hidden=32, encoder=(32,))
    cfg = ppo_mod.PPOConfig(horizon=32, num_envs=256, epochs=4,
                            num_minibatches=4, lr=3e-3, ent_coef=0.0,
                            bptt_horizon=16)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    step = jax.jit(ppo_rnn.make_recurrent_train_step(
        model.apply, opt, env.params, env.statics, cfg,
        rollout="pallas", rollout_interpret=True))
    rewards = []
    for _ in range(60):
        runner, m = step(runner)
        rewards.append(float(m["reward_mean"]))
    first = np.mean(rewards[:5])
    last = np.mean(rewards[-5:])
    assert np.isfinite(last)
    assert last > first + 0.15, (first, last)


def test_lstm_traj_chained_calls_consume_fresh_noise():
    """Two chained T-step kernel calls == one 2T-step call, bit for bit
    (episode-step-keyed noise stream + carried recurrent state)."""
    env, model, params = _setup(hidden=8, encoder=(8,))
    N, T = 128, 4
    carry0 = model.initial_carry((N,))
    s0 = env.init_batch(11, N)
    mid, c_mid, pl1, _, _ = PAL.traj_lstm_rollout_pallas(
        s0, params, carry0, env.params, env.statics, T, bptt=T,
        lanes_per_block=N, time_chunk=T, interpret=True)
    fin, c_fin, pl2, _, _ = PAL.traj_lstm_rollout_pallas(
        mid, params, c_mid, env.params, env.statics, T, bptt=T,
        lanes_per_block=N, time_chunk=T, interpret=True)
    full, c_full, plf, _, _ = PAL.traj_lstm_rollout_pallas(
        env.init_batch(11, N), params, carry0, env.params, env.statics,
        2 * T, bptt=2 * T, lanes_per_block=N, time_chunk=T, interpret=True)
    both = jnp.concatenate([pl1, pl2], axis=0)
    np.testing.assert_array_equal(np.asarray(both).view(np.uint32),
                                  np.asarray(plf).view(np.uint32))
    for k in range(2):
        np.testing.assert_array_equal(
            np.asarray(c_fin[k]).view(np.uint32),
            np.asarray(c_full[k]).view(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(fin)).view(np.uint32),
        np.asarray(pack_fstate_batch(full)).view(np.uint32))


def test_compiled_bptt_chunk_guard():
    """Compiled mode refuses a bptt_horizon whose time chunk can't satisfy
    the Mosaic trailing-block rule (multiple of 8, or the whole horizon)
    with an actionable error; interpret mode accepts any divisor (see
    tests above). bptt == T stays legal at any value (the chunk spans the
    whole axis)."""
    import pytest

    env, model, params = _setup(hidden=8, encoder=(8,))
    N = 1024  # past the lane-alignment guard, into the chunk guard
    carry = model.initial_carry((N,))
    state = env.init_batch(0, N)
    with pytest.raises(ValueError, match="multiple of 8"):
        PAL.traj_lstm_rollout_pallas(state, params, carry, env.params,
                                     env.statics, 32, bptt=4,
                                     interpret=False)


def _setup_cnn_lstm(seed=0):
    from drone_tpu.models import CNNLSTMActorCritic

    env = drone_tpu.DroneEnv()
    model = CNNLSTMActorCritic(res=8, patch0=2, patch1=2, channels=(8, 8),
                               trunk_hidden=16, hidden=16)
    carry1 = model.initial_carry((1,))
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 13), jnp.float32), carry1)
    return env, model, params


def test_cnn_lstm_traj_kernel_bitwise_vs_reference():
    """Pixel-recurrent rollout kernel (CNN encoder hook, interpret) == jnp
    mirror bit for bit: planes, anchors, final state, final carry — the
    same contract as the dense-encoder kernel, with the patchify-CNN trunk
    (pallas_acting_cnn.cnn_encode) in front of the gates."""
    env, model, params = _setup_cnn_lstm()
    N, T, bptt = 256, 8, 4
    p = env.params.replace(horizon=jnp.int32(6))
    carry = model.initial_carry((N,))
    ref_s, ref_c, ref_traj, ref_seg, ref_stats = jax.jit(
        lambda s, c, pp, prm: PAL.traj_lstm_rollout_reference(
            s, prm, c, pp, env.statics, T, bptt=bptt)
    )(env.init_batch(5, N), carry, p, params)
    pal_s, pal_c, planes, pal_seg, pal_stats = PAL.traj_lstm_rollout_pallas(
        env.init_batch(5, N), params, carry, p, env.statics, T, bptt=bptt,
        lanes_per_block=N, time_chunk=4, interpret=True)
    _assert_traj_bitwise(_planes_to_traj(planes, N), ref_traj)
    for k in range(2):
        np.testing.assert_array_equal(
            np.asarray(pal_seg[k]).view(np.uint32),
            np.asarray(ref_seg[k]).view(np.uint32), err_msg=f"seg[{k}]")
        np.testing.assert_array_equal(
            np.asarray(pal_c[k]).view(np.uint32),
            np.asarray(ref_c[k]).view(np.uint32), err_msg=f"carry[{k}]")
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(pal_s)).view(np.uint32),
        np.asarray(pack_fstate_batch(ref_s)).view(np.uint32))
    for k in ("episodes", "ep_length_sum"):
        assert float(pal_stats[k]) == float(ref_stats[k]), k
    assert float(pal_stats["episodes"]) > 0


def test_cnn_lstm_mirror_matches_flax_deterministic():
    """Deterministic pixel-recurrent mirror == the flax scan rollout
    (CNNLSTMActorCritic.apply in the loop) — ties the plane-space
    render+conv+LSTM math to the canonical model."""
    env, model, params = _setup_cnn_lstm()
    N, T = 64, 6
    carry = model.initial_carry((N,))
    state = env.init_batch(3, N)
    _, _, traj, _, _ = jax.jit(
        lambda s, c, pp, prm: PAL.traj_lstm_rollout_reference(
            s, prm, c, pp, env.statics, T, stochastic=False)
    )(state, carry, env.params, params)
    _, _, outs = ppo_rnn.rollout_recurrent(
        model, params, env, state, carry, T, deterministic=True)
    np.testing.assert_allclose(np.asarray(traj.reward),
                               np.asarray(outs.reward),
                               rtol=1e-5, atol=1e-6)


def test_cnn_lstm_acting_kernel_matches_mirror():
    """Pixel-recurrent ACTING kernel (stats-only serving path, interpret)
    == the deterministic mirror: final env state and carry bitwise."""
    env, model, params = _setup_cnn_lstm(seed=2)
    N, T = 256, 8
    p = env.params.replace(horizon=jnp.int32(6))
    carry = model.initial_carry((N,))
    fk, ck, stats_k = PAL.lstm_act_rollout_pallas(
        env.init_batch(7, N), params, carry, p, env.statics, T,
        lanes_per_block=N, interpret=True)
    fr, cr, _, _, stats_r = jax.jit(
        lambda s, c, pp, prm: PAL.traj_lstm_rollout_reference(
            s, prm, c, pp, env.statics, T, stochastic=False)
    )(env.init_batch(7, N), carry, p, params)
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(fk)).view(np.uint32),
        np.asarray(pack_fstate_batch(fr)).view(np.uint32))
    for k in range(2):
        np.testing.assert_array_equal(
            np.asarray(ck[k]).view(np.uint32),
            np.asarray(cr[k]).view(np.uint32), err_msg=f"carry[{k}]")
    assert float(stats_k["episodes"]) == float(stats_r["episodes"])


def test_cnn_lstm_hybrid_trainer_pallas_vs_reference():
    """ppo_rnn with rollout='pallas' (CNN-encoder kernel, interpret) vs
    'pallas_ref' for the pixel-recurrent policy: tight agreement after one
    update (the update phase is shared flax segmented_forward)."""
    env, model, params = _setup_cnn_lstm(seed=1)
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=256, epochs=1,
                            num_minibatches=2, bptt_horizon=4)
    opt = ppo_mod.make_optimizer(cfg)
    r0 = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=1)
    step_pal = jax.jit(ppo_rnn.make_recurrent_train_step(
        model.apply, opt, env.params, env.statics, cfg,
        rollout="pallas", rollout_interpret=True))
    step_ref = jax.jit(ppo_rnn.make_recurrent_train_step(
        model.apply, opt, env.params, env.statics, cfg,
        rollout="pallas_ref"))
    ra, ma = step_pal(r0)
    rb, mb = step_ref(r0)
    for (pa, pb) in zip(jax.tree_util.tree_leaves(ra.params),
                        jax.tree_util.tree_leaves(rb.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-3, atol=1e-6)
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=1e-3, atol=1e-6, err_msg=k)


def test_lstm_traj_multi_chunk_segments_bitwise():
    """BPTT segments spanning several time chunks (tc < bptt): the snap
    anchor block is written only on the segment's first chunk and must
    survive later chunks' revisits unwritten. Kernel (interpret, tc=2)
    == mirror bit for bit on anchors, planes, and carry.
    (tests_tpu has the compiled analogue at tc=8 < bptt=16.)"""
    env, model, params = _setup()
    N, T, bptt = 256, 16, 8
    p = env.params.replace(horizon=jnp.int32(6))
    carry = model.initial_carry((N,))
    ref_s, ref_c, ref_traj, ref_seg, ref_stats = jax.jit(
        lambda s, c, pp, prm: PAL.traj_lstm_rollout_reference(
            s, prm, c, pp, env.statics, T, bptt=bptt)
    )(env.init_batch(11, N), carry, p, params)
    pal_s, pal_c, planes, pal_seg, pal_stats = PAL.traj_lstm_rollout_pallas(
        env.init_batch(11, N), params, carry, p, env.statics, T, bptt=bptt,
        lanes_per_block=N, time_chunk=2, interpret=True)
    pal_traj = _planes_to_traj(planes, N)
    _assert_traj_bitwise(pal_traj, ref_traj)
    for k in range(2):
        np.testing.assert_array_equal(
            np.asarray(pal_seg[k]).view(np.uint32),
            np.asarray(ref_seg[k]).view(np.uint32), err_msg=f"seg[{k}]")
        np.testing.assert_array_equal(
            np.asarray(pal_c[k]).view(np.uint32),
            np.asarray(ref_c[k]).view(np.uint32), err_msg=f"carry[{k}]")
