"""Compiled-kernel assertions on the real chip.

Turns the numerics prose of ops/pallas_rollout.py (_normalize_quat NOTE:
Mosaic's rsqrt strength-reduction drifts the quaternion a few ulp from the
XLA path) into asserted bounds, and pins the rest of the Mosaic surface:
threefry bit-exactness, acting-kernel vs flax forward, trajectory-plane
consistency, update-kernel gradients, fused adam.

Tolerance doctrine: integer/uint state is BITWISE on silicon; float state
is ulp-bounded over short horizons (the dynamics are chaotic — a 2-ulp
quat difference doubles every few steps, so long-horizon comparisons are
statistical, covered by tests/test_pallas_acting.py in interpret mode).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import drone_tpu
from drone_tpu import env as env_mod
from drone_tpu import prng
from drone_tpu.models import ActorCritic
from drone_tpu.ops import (
    act_rollout_pallas,
    rollout_pallas,
    traj_act_rollout_pallas,
)
from drone_tpu.ops import pallas_acting_traj as PAT
from drone_tpu.ops import pallas_update as PU
from drone_tpu.ops.pallas_acting import actor_weights
from drone_tpu.ops.pallas_acting_traj import critic_weights, _log_std


def _ulp_diff(a, b):
    """Max distance in representable-float steps between two f32 arrays."""
    ai = np.asarray(a).view(np.int32).astype(np.int64)
    bi = np.asarray(b).view(np.int32).astype(np.int64)
    # map the sign-magnitude int pattern to a monotonic lattice
    ai = np.where(ai < 0, -2147483648 - ai, ai)
    bi = np.where(bi < 0, -2147483648 - bi, bi)
    return int(np.abs(ai - bi).max())


def test_threefry_bitwise_on_tpu():
    """Counter RNG on silicon == the NumPy mirror, bit for bit (KAT plus a
    spread of keys/counters)."""
    lanes = np.arange(4096, dtype=np.uint32)
    for seed in (0, 123456789):
        k0_np, k1_np = prng.threefry2x32_np(
            np.uint32(seed), np.uint32(prng.GOLDEN), lanes, np.uint32(0))
        k0, k1 = jax.jit(prng.lane_key)(jnp.uint32(seed), jnp.asarray(lanes))
        np.testing.assert_array_equal(np.asarray(k0), k0_np)
        np.testing.assert_array_equal(np.asarray(k1), k1_np)
        b0, b1 = jax.jit(prng.threefry2x32)(k0, k1, jnp.uint32(7),
                                            jnp.uint32(0x40000000))
        b0_np, b1_np = prng.threefry2x32_np(k0_np, k1_np, np.uint32(7),
                                            np.uint32(0x40000000))
        np.testing.assert_array_equal(np.asarray(b0), b0_np)
        np.testing.assert_array_equal(np.asarray(b1), b1_np)
    # Random123 known-answer
    x0, x1 = jax.jit(prng.threefry2x32)(jnp.uint32(0), jnp.uint32(0),
                                        jnp.uint32(0), jnp.uint32(0))
    assert int(x0) == 0x6B200159 and int(x1) == 0x99BA4EFE


def test_env_megakernel_vs_scan_on_tpu():
    """Compiled env megakernel vs the jitted scan path ON THE CHIP, same
    provided action stream: integer state bitwise, float state ulp-bounded
    over a short horizon (quat <= 16 ulp, all floats allclose 1e-5)."""
    env = drone_tpu.DroneEnv()
    N, T = 512, 4
    acts = jax.random.uniform(jax.random.PRNGKey(1), (T, N, 4), jnp.float32,
                              -1.0, 1.0)
    state = env.init_batch(3, N)

    def scan(s, a, p):
        def body(ss, at):
            s2, _ = jax.vmap(
                lambda x, y: env_mod.step(x, y, p, env.statics))(ss, at)
            return s2, None
        return jax.lax.scan(body, s, a)[0]

    ref = jax.jit(scan)(state, acts, env.params)
    pal, _ = rollout_pallas(env.init_batch(3, N), env.params, env.statics, T,
                            actions=acts, lanes_per_block=N)
    # integer/uint lanes: silicon-exact
    for f in ("step", "reset_count", "wp_count", "gate_idx", "key0", "key1"):
        np.testing.assert_array_equal(np.asarray(getattr(pal, f)),
                                      np.asarray(getattr(ref, f)), err_msg=f)
    # quaternion: the Mosaic rsqrt drift, asserted not described
    q_ulp = max(_ulp_diff(pal.quat[:, i], ref.quat[:, i]) for i in range(4))
    assert q_ulp <= 16, f"quat drift {q_ulp} ulp exceeds bound"
    for f in ("pos", "vel", "omega", "target", "dr_mass", "dr_thrust",
              "ep_return"):
        np.testing.assert_allclose(np.asarray(getattr(pal, f)),
                                   np.asarray(getattr(ref, f)),
                                   rtol=1e-5, atol=1e-6, err_msg=f)


def test_acting_kernel_vs_flax_forward_on_tpu():
    """One fused acting step vs model.apply on the chip: the kernel's
    (W^T @ obs) policy equals flax's (obs @ W) within matmul tolerance."""
    env = drone_tpu.DroneEnv()
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    N = 1024  # compiled kernels need 1024-aligned lane blocks
    state = env.init_batch(5, N)
    obs = env.observe_batch(state)
    mean, _, value = jax.jit(model.apply)(params, obs)

    # trajectory kernel stores the pre-step obs, policy mean action
    # (stochastic=False), and the critic value — compare step 0
    _, traj, _ = traj_act_rollout_pallas(
        state, params, env.params, env.statics, 8, lanes_per_block=N,
        stochastic=False)
    np.testing.assert_allclose(np.asarray(traj.obs[0]), np.asarray(obs),
                               rtol=1e-6, atol=1e-7)
    # XLA:TPU evaluates "f32" matmuls through bf16 MXU passes at default
    # precision (and Mosaic schedules its own pass structure), so the two
    # f32 towers agree at bf16 granularity on silicon — the exact-f32
    # contract between kernel and mirror lives in tests/ (CPU backend)
    np.testing.assert_allclose(np.asarray(traj.action[0]), np.asarray(mean),
                               rtol=1e-2, atol=4e-3)
    np.testing.assert_allclose(np.asarray(traj.value[0]), np.asarray(value),
                               rtol=1e-2, atol=8e-3)


def test_acting_kernel_episode_accounting_on_tpu():
    """Compiled acting kernel over many episodes: finite stats, every lane
    terminates, quat norm preserved."""
    env = drone_tpu.DroneEnv()
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    p = env.params.replace(horizon=jnp.int32(60))
    final, stats = act_rollout_pallas(env.init_batch(2, 1024), params, p,
                                      env.statics, 200, lanes_per_block=1024)
    assert float(stats["episodes"]) >= 1024
    assert np.isfinite(float(stats["reward_sum"]))
    qn = np.asarray(jnp.sum(final.quat ** 2, axis=1))
    np.testing.assert_allclose(qn, 1.0, atol=1e-5)


def test_update_kernel_grads_on_tpu():
    """Compiled update megakernel vs the jnp mirror on the chip (matmul
    reduction orders differ between Mosaic and XLA:TPU -> tolerance)."""
    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=(16, 16))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    rows, T = 16, 16
    state = env.init_batch(1, rows * 128)
    _, planes, _ = PAT.traj_act_rollout_pallas_planes(
        state, params, env.params, env.statics, T,
        lanes_per_block=rows * 128)
    adv = jax.random.normal(jax.random.PRNGKey(2), (T, rows, 128))
    advret = jnp.stack([adv, planes[:, PAT.TP_VAL] + 0.5 * adv])
    co = PU.UpdateConsts(0.2, 10.0, 0.5, 1.0 / (rows * 128 * T))
    aw = tuple(actor_weights(params))
    cw = tuple(critic_weights(params))
    ls = _log_std(params)
    # the production tile: 8-row (1024-lane) blocks gathered out of order
    # by the prefetched permutation; tc=2 keeps the 2048-sample compute tile
    perm = jnp.asarray([1, 0], jnp.int32)
    gk, sk = PU.ppo_update(planes, advret, perm, aw, cw, ls, tc=2, rbu=8,
                           co=co, mode="kernel")
    gr, sr = PU.ppo_update(planes, advret, perm, aw, cw, ls, tc=2, rbu=8,
                           co=co, mode="reference")
    # bf16-pass granularity on silicon (same rationale as the flax-forward
    # test): gradients go through 2x the matmul depth, so the bound is
    # looser; the exact-f32 kernel-vs-mirror gate runs on the CPU backend
    for (wk, bk), (wr, br) in zip((*gk[0], *gk[1]), (*gr[0], *gr[1])):
        np.testing.assert_allclose(np.asarray(wk), np.asarray(wr),
                                   rtol=5e-2, atol=1e-3)
        np.testing.assert_allclose(np.asarray(bk), np.asarray(br),
                                   rtol=5e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sr),
                               rtol=5e-2, atol=1e-2)


def test_fused_adam_on_tpu():
    """Compiled fused clip+adam vs its mirror on the chip."""
    model = ActorCritic(hidden=(32, 32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    from drone_tpu import ppo_pallas

    tensors, _, _ = ppo_pallas._kernel_tensors(params)
    key = jax.random.PRNGKey(4)
    grads = [0.05 * jax.random.normal(jax.random.fold_in(key, i), t.shape)
             for i, t in enumerate(tensors)]
    mus = [0.1 * jnp.ones_like(t) for t in tensors]
    nus = [0.01 * jnp.ones_like(t) for t in tensors]
    ac = PU.AdamConsts(clip_norm=0.5)
    outk = PU.fused_adam(grads, tensors, mus, nus, 3e-4, 7.0, ac=ac,
                         mode="kernel")
    outr = PU.fused_adam(grads, tensors, mus, nus, 3e-4, 7.0, ac=ac,
                         mode="reference")
    for lk, lr_ in zip(outk, outr):
        for a, b in zip(lk, lr_):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_train_step_on_tpu_is_finite_and_learns_direction():
    """Two compiled megakernel train steps on the chip: finite metrics,
    params move, episode accounting sane."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_pallas

    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=(32, 32))
    # 2048 envs / 2 minibatches -> 8-row (1024-lane) update tiles, the
    # compiled minimum (rbu % 8 rule)
    cfg = ppo_mod.PPOConfig(horizon=32, num_envs=2048, epochs=2,
                            num_minibatches=2)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)
    runner = runner.replace(
        opt_state=ppo_pallas.init_fused_opt_state(runner.params))
    step = jax.jit(ppo_pallas.make_pallas_train_step(
        opt, env.params, env.statics, cfg, fused_optimizer=True))
    before = jax.tree_util.tree_leaves(runner.params)
    for _ in range(2):
        runner, m = step(runner)
    assert all(np.isfinite(float(v)) for v in m.values())
    after = jax.tree_util.tree_leaves(runner.params)
    assert max(float(jnp.abs(a - b).max()) for a, b in zip(after, before)) > 0
    assert float(runner.opt_state[0]) == 8.0  # 2 updates * 2 epochs * 2 mb


def test_lstm_acting_kernel_vs_flax_on_tpu():
    """Compiled LSTM acting kernel vs the flax recurrent forward on the
    chip: one block of deterministic steps tracks model.apply within
    silicon matmul tolerance, and the returned carry matches."""
    from drone_tpu import ppo_rnn
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.ops import lstm_act_rollout_pallas

    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=128, encoder=(64,))
    carry = model.initial_carry((1024,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                        jax.tree_util.tree_map(lambda c: c[:1], carry))
    T = 8
    # init_batch twice: the kernel donates its input state buffers
    final_k, carry_k, stats = lstm_act_rollout_pallas(
        env.init_batch(5, 1024), params, carry, env.params, env.statics, T)
    final_r, carry_r, outs = jax.jit(
        lambda s, c: ppo_rnn.rollout_recurrent(
            model, params, env, s, c, T, deterministic=True)
    )(env.init_batch(5, 1024), carry)
    np.testing.assert_allclose(float(stats["reward_sum"]),
                               float(jnp.sum(outs.reward)),
                               rtol=1e-3)
    for k in range(2):
        np.testing.assert_allclose(np.asarray(carry_k[k]),
                                   np.asarray(carry_r[k]),
                                   rtol=1e-2, atol=2e-3)


def test_lstm_traj_kernel_compiled_on_tpu():
    """Compiled trajectory-emitting LSTM kernel: planes finite and
    consistent (stored value equals the critic head re-run), BPTT anchors
    shaped/seeded right (segment 0 anchor == the initial carry)."""
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.ops import traj_lstm_rollout_pallas
    from drone_tpu.ops.pallas_acting_traj import _planes_to_traj

    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=128, encoder=(64,))
    N, T, bptt = 1024, 16, 8
    carry = model.initial_carry((N,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                        jax.tree_util.tree_map(lambda c: c[:1], carry))
    final, carry2, planes, seg, stats = traj_lstm_rollout_pallas(
        env.init_batch(3, N), params, carry, env.params, env.statics, T,
        bptt=bptt, lanes_per_block=N)
    traj = _planes_to_traj(planes, N)
    assert np.isfinite(np.asarray(traj.obs)).all()
    assert np.isfinite(np.asarray(traj.logp)).all()
    assert seg[0].shape == (T // bptt, N, 128)
    # segment-0 anchor is the zero initial carry
    np.testing.assert_array_equal(np.asarray(seg[0][0]),
                                  np.zeros((N, 128), np.float32))
    # the second anchor is the (masked) carry after bptt steps: nonzero
    assert float(jnp.abs(seg[1][1]).max()) > 0
    assert np.isfinite(float(stats["reward_sum"]))


def test_lstm_traj_kernel_multi_chunk_segments_on_tpu():
    """BPTT segments spanning several time chunks (tc < bptt): the snap
    anchor block is written only on the segment's FIRST chunk and must
    survive the later chunks' revisits unwritten (Mosaic preserves a
    revisited output block until its index advances). A tc=8 run must
    reproduce the tc=16 (= bptt, write-every-chunk) run bit for bit."""
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.ops import traj_lstm_rollout_pallas

    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=128, encoder=(64,))
    N, T, bptt = 1024, 32, 16
    carry = model.initial_carry((N,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                        jax.tree_util.tree_map(lambda c: c[:1], carry))
    outs = []
    for tc in (8, 16):
        _, carry2, planes, seg, stats = traj_lstm_rollout_pallas(
            env.init_batch(7, N), params, carry, env.params, env.statics, T,
            bptt=bptt, lanes_per_block=N, time_chunk=tc)
        outs.append((carry2, planes, seg, stats))
    (c_a, p_a, s_a, st_a), (c_b, p_b, s_b, st_b) = outs
    for a, b in zip(jax.tree_util.tree_leaves((c_a, p_a, s_a)),
                    jax.tree_util.tree_leaves((c_b, p_b, s_b))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(st_a["reward_sum"]) == float(st_b["reward_sum"])
    # anchors: segment 0 is the zero carry; segment 1 is nonzero
    np.testing.assert_array_equal(np.asarray(s_a[0][0]),
                                  np.zeros_like(np.asarray(s_a[0][0])))
    assert float(jnp.abs(s_a[1][1]).max()) > 0


def test_sharded_wrappers_compile_on_tpu():
    """ops/sharded.py shard_map wrappers reach Mosaic on a single-device
    mesh (the kernel compiles under shard_map exactly as it would per
    device on a slice)."""
    from jax.sharding import Mesh

    from drone_tpu.ops import (
        sharded_act_rollout_pallas,
        sharded_rollout_pallas,
    )
    from drone_tpu.models import ActorCritic

    env = drone_tpu.DroneEnv()
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    _, stats = sharded_rollout_pallas(
        mesh, env.init_batch(1, 1024), env.params, env.statics, 8,
        lanes_per_block=1024)
    assert np.isfinite(float(stats["reward_sum"]))
    _, stats2 = sharded_act_rollout_pallas(
        mesh, env.init_batch(2, 1024), params, env.params, env.statics, 8,
        lanes_per_block=1024)
    assert np.isfinite(float(stats2["reward_sum"]))


def test_megakernel_learning_gate_on_tpu():
    """END-TO-END learning on silicon: 80 compiled megakernel updates of
    hover at 2048 lanes — per-step reward must improve (the on-chip
    analogue of tests/test_pallas_traj.py::test_train_step_pallas_learns;
    30 updates is inside the initial exploration dip at 2 minibatches,
    measured -0.07 -> -0.18 before the curve turns)."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_pallas

    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=(32, 32))
    cfg = ppo_mod.PPOConfig(horizon=32, num_envs=2048, epochs=4,
                            num_minibatches=2, lr=3e-3, ent_coef=0.0)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)
    runner = runner.replace(
        opt_state=ppo_pallas.init_fused_opt_state(runner.params))
    step = jax.jit(ppo_pallas.make_pallas_train_step(
        opt, env.params, env.statics, cfg, fused_optimizer=True))
    rewards = []
    for _ in range(80):
        runner, m = step(runner)
        rewards.append(float(m["reward_mean"]))
    first = np.mean(rewards[:5])
    last = np.mean(rewards[-5:])
    assert np.isfinite(last)
    assert last > first + 0.1, (first, last)


def test_lstm_update_kernel_grads_on_tpu():
    """Compiled truncated-BPTT LSTM update megakernel vs its jnp mirror on
    the chip, production tile (rbu=8, hidden=128) — silicon matmul
    tolerance, same doctrine as test_update_kernel_grads_on_tpu (the
    exact-f32 kernel-vs-mirror gate runs on the CPU backend)."""
    from drone_tpu import ppo_rnn_pallas as PRP
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.ops import pallas_update_lstm as PUL
    from drone_tpu.ops import traj_lstm_rollout_pallas

    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=128, encoder=(64,))
    N, T, bptt = 1024, 16, 8
    carry = model.initial_carry((N,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                        jax.tree_util.tree_map(lambda c: c[:1], carry))
    _, _, planes, snap, _ = traj_lstm_rollout_pallas(
        env.init_batch(7, N), params, carry, env.params, env.statics, T,
        bptt=bptt, lanes_per_block=N, seg_layout="planes")
    rows = N // 128
    adv = jax.random.normal(jax.random.PRNGKey(2), (T, rows, 128))
    advret = jnp.stack([adv, planes[:, PAT.TP_VAL] + 0.5 * adv])
    tensors, _ = PRP.lstm_kernel_tensors(params)
    co = PU.UpdateConsts(0.2, 10.0, 0.5, 1.0 / (N * T))
    perm = jnp.asarray([0], jnp.int32)
    gk, sk = PUL.ppo_lstm_update(planes, advret, snap, perm, tensors[:-1],
                                 tensors[-1], bptt=bptt, co=co, rbu=8,
                                 mode="kernel")
    gr, sr = PUL.ppo_lstm_update(planes, advret, snap, perm, tensors[:-1],
                                 tensors[-1], bptt=bptt, co=co, rbu=8,
                                 mode="reference")
    # BPTT gradients traverse up to 8 chained matmul steps -> the bound is
    # looser than the one-step forward test, same shape of reasoning
    for i, (a, b) in enumerate(zip(gk, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=8e-2, atol=2e-3,
                                   err_msg=f"grad[{i}]")
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sr),
                               rtol=5e-2, atol=1e-2)


def test_rnn_megakernel_train_step_on_tpu():
    """Two compiled recurrent megakernel train steps on the chip (LSTM
    rollout kernel + BPTT update kernel + fused adam): finite metrics,
    params move, fused-adam step count right."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_rnn, ppo_rnn_pallas
    from drone_tpu.models import LSTMActorCritic

    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=128, encoder=(64,))
    cfg = ppo_mod.PPOConfig(horizon=16, num_envs=2048, epochs=2,
                            num_minibatches=2, bptt_horizon=8)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    runner = runner.replace(
        opt_state=ppo_rnn_pallas.init_fused_opt_state(runner.params))
    step = jax.jit(ppo_rnn_pallas.make_pallas_rnn_train_step(
        opt, env.params, env.statics, cfg, fused_optimizer=True))
    before = jax.tree_util.tree_leaves(runner.params)
    for _ in range(2):
        runner, m = step(runner)
    assert all(np.isfinite(float(v)) for v in m.values())
    after = jax.tree_util.tree_leaves(runner.params)
    assert max(float(jnp.abs(a - b).max()) for a, b in zip(after, before)) > 0
    assert float(runner.opt_state[0]) == 8.0  # 2 updates * 2 epochs * 2 mb


def test_traj_chained_calls_on_tpu():
    """Compiled trajectory kernel: two chained T-step calls equal one
    2T-step call on silicon (the episode-step-keyed noise stream continues
    across kernel launches) — float tolerance per the silicon doctrine,
    integer state exact."""
    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    N, T = 1024, 8
    mid, tr1, _ = traj_act_rollout_pallas(
        env.init_batch(11, N), params, env.params, env.statics, T,
        lanes_per_block=N)
    fin, tr2, _ = traj_act_rollout_pallas(
        mid, params, env.params, env.statics, T, lanes_per_block=N)
    full, trf, _ = traj_act_rollout_pallas(
        env.init_batch(11, N), params, env.params, env.statics, 2 * T,
        lanes_per_block=N)
    both_act = np.concatenate([np.asarray(tr1.action), np.asarray(tr2.action)])
    np.testing.assert_allclose(both_act, np.asarray(trf.action),
                               rtol=1e-4, atol=1e-5)
    for f in ("step", "reset_count", "key0", "key1"):
        np.testing.assert_array_equal(np.asarray(getattr(fin, f)),
                                      np.asarray(getattr(full, f)), err_msg=f)


def test_cnn_traj_kernel_vs_flax_on_tpu():
    """Compiled CNN trajectory kernel vs PatchCNNActorCritic.apply on the
    chip: step-0 stored obs exact-ish, policy mean / value at bf16-matmul
    tolerance (the render is elementwise and agrees much tighter; the conv
    towers run as MXU passes)."""
    from drone_tpu.models import PatchCNNActorCritic
    from drone_tpu.ops import traj_cnn_rollout_pallas
    from drone_tpu.ops.pallas_acting_traj import (
        TP_ACT0, TP_OBS0, TP_VAL,
    )

    env = drone_tpu.DroneEnv()
    model = PatchCNNActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    N = 1024
    state = env.init_batch(7, N)
    obs = env.observe_batch(state)
    mean, _, value = jax.jit(model.apply)(params, obs)

    _, planes, stats = traj_cnn_rollout_pallas(
        state, params, env.params, env.statics, 8, lanes_per_block=N,
        stochastic=False)
    obs_k = planes[0, TP_OBS0:TP_OBS0 + 13].reshape(13, N).T
    np.testing.assert_allclose(np.asarray(obs_k), np.asarray(obs),
                               rtol=1e-6, atol=1e-7)
    act_k = planes[0, TP_ACT0:TP_ACT0 + 4].reshape(4, N).T
    np.testing.assert_allclose(np.asarray(act_k), np.asarray(mean),
                               rtol=1e-2, atol=4e-3)
    np.testing.assert_allclose(np.asarray(planes[0, TP_VAL].reshape(N)),
                               np.asarray(value), rtol=1e-2, atol=8e-3)
    assert np.isfinite(float(stats["reward_sum"]))


def test_cnn_acting_kernel_compiled_on_tpu():
    """Compiled stats-only CNN acting kernel (serving/eval path): runs on
    silicon, episode accounting sane, and agrees with the deterministic
    trajectory kernel's stats at the same seed (same tower, same env step —
    only the plane outputs differ)."""
    from drone_tpu.models import PatchCNNActorCritic
    from drone_tpu.ops import cnn_act_rollout_pallas, traj_cnn_rollout_pallas

    env = drone_tpu.DroneEnv()
    model = PatchCNNActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    N, T = 1024, 64
    p = env.params.replace(horizon=jnp.int32(20))
    fk, stats_a = cnn_act_rollout_pallas(
        env.init_batch(9, N), params, p, env.statics, T)
    _, _, stats_t = traj_cnn_rollout_pallas(
        env.init_batch(9, N), params, p, env.statics, T, lanes_per_block=N,
        stochastic=False)
    assert float(stats_a["episodes"]) == float(stats_t["episodes"])
    np.testing.assert_allclose(float(stats_a["reward_sum"]),
                               float(stats_t["reward_sum"]),
                               rtol=1e-4)
    assert float(stats_a["episodes"]) >= N  # horizon 20, T=64: >= 2 per lane
    assert np.isfinite(np.asarray(fk.pos)).all()


def test_cnn_lstm_rollout_kernels_compiled_on_tpu():
    """Compiled pixel-recurrent (CNN-encoder LSTM) rollout kernels on
    silicon: the trajectory kernel emits sane planes + anchors and the
    acting kernel's step-0 policy mean tracks CNNLSTMActorCritic.apply at
    bf16-matmul tolerance."""
    from drone_tpu.models import CNNLSTMActorCritic
    from drone_tpu.ops import pallas_acting_lstm as PAL
    from drone_tpu.ops.pallas_acting_traj import TP_ACT0, TP_VAL

    env = drone_tpu.DroneEnv()
    model = CNNLSTMActorCritic()
    N, T, bptt = 1024, 16, 8
    carry = model.initial_carry((N,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)),
                        jax.tree_util.tree_map(lambda c: c[:1], carry))
    state = env.init_batch(7, N)
    obs = env.observe_batch(state)
    mean, _, value, _ = jax.jit(model.apply)(params, obs, carry)

    _, _, planes, seg, stats = PAL.traj_lstm_rollout_pallas(
        state, params, carry, env.params, env.statics, T, bptt=bptt,
        lanes_per_block=N, stochastic=False)
    act_k = planes[0, TP_ACT0:TP_ACT0 + 4].reshape(4, N).T
    np.testing.assert_allclose(np.asarray(act_k), np.asarray(mean),
                               rtol=1e-2, atol=4e-3)
    np.testing.assert_allclose(np.asarray(planes[0, TP_VAL].reshape(N)),
                               np.asarray(value), rtol=1e-2, atol=8e-3)
    assert seg[0].shape == (T // bptt, N, model.hidden)
    assert np.isfinite(float(stats["reward_sum"]))

    fk, ck, stats_a = PAL.lstm_act_rollout_pallas(
        env.init_batch(7, N), params, carry, env.params, env.statics, T)
    assert np.isfinite(np.asarray(fk.pos)).all()
    assert np.isfinite(np.asarray(ck[0])).all()
    assert np.isfinite(float(stats_a["reward_sum"]))


def test_cnn_lstm_megakernel_train_step_on_tpu():
    """Full compiled pixel-recurrent megakernel train step on silicon
    (CNN-encoder rollout kernel + BPTT update kernel with the conv
    fwd/bwd hook + fused adam): a few updates, finite loss, finite params —
    the compile-and-run gate for the fourth policy family's flagship path."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_rnn
    from drone_tpu import ppo_rnn_pallas as PRP
    from drone_tpu.models import CNNLSTMActorCritic

    env = drone_tpu.DroneEnv()
    model = CNNLSTMActorCritic()
    cfg = ppo_mod.PPOConfig(horizon=16, num_envs=2048, epochs=2,
                            num_minibatches=2, bptt_horizon=8)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    runner = runner.replace(opt_state=PRP.init_fused_opt_state(runner.params))
    step = jax.jit(PRP.make_pallas_rnn_train_step(
        opt, env.params, env.statics, cfg, fused_optimizer=True))
    for _ in range(3):
        runner, m = step(runner)
        assert np.isfinite(float(m["loss"])), m
    for leaf in jax.tree_util.tree_leaves(runner.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_cnn_update_kernel_grads_on_tpu():
    """Compiled CNN update megakernel vs the jnp mirror on the chip
    (Mosaic vs XLA:TPU matmul pass structures -> bf16-scale tolerance)."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_cnn_pallas as PCP
    from drone_tpu.models import PatchCNNActorCritic
    from drone_tpu.ops import pallas_update_cnn as PUC
    from drone_tpu.ops import traj_cnn_rollout_pallas
    from drone_tpu.ops.pallas_acting_traj import TP_DONE, TP_REW, TP_VAL
    from drone_tpu.pixels import patch_grid

    env = drone_tpu.DroneEnv()
    model = PatchCNNActorCritic()
    geom = PCP.cnn_geom(model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    N, T = 1024, 8
    p = env.params.replace(horizon=jnp.int32(6))
    _, planes, _ = traj_cnn_rollout_pallas(
        env.init_batch(3, N), params, p, env.statics, T, lanes_per_block=N)
    rows = N // 128
    adv, ret = ppo_mod.compute_gae(
        planes[:, TP_REW], planes[:, TP_VAL], planes[:, TP_DONE],
        jnp.zeros((rows, 128)), 0.99, 0.95)
    adv = (adv - jnp.mean(adv)) / jnp.sqrt(jnp.var(adv) + 1e-8)
    advret = jnp.stack([adv, ret])
    gx, gy = patch_grid(geom.res, geom.p0)
    tensors = PCP.cnn_kernel_tensors(params, geom)
    co = PU.UpdateConsts(clip_eps=0.2, vf_clip=10.0, vf_coef=0.5,
                         inv_m=1.0 / (N * T))
    perm = jnp.arange(rows // 8, dtype=jnp.int32)
    gk, sk = PUC.ppo_cnn_update(planes, advret, perm, tensors[:-1],
                                tensors[-1], gx, gy, tc=1, geom=geom, co=co,
                                rbu=8, mode="kernel")
    gr, sr = PUC.ppo_cnn_update(planes, advret, perm, tensors[:-1],
                                tensors[-1], gx, gy, tc=1, geom=geom, co=co,
                                rbu=8, mode="reference")
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sr), rtol=2e-3,
                               atol=1e-3)


def test_cnn_megakernel_train_step_on_tpu():
    """Full compiled CNN megakernel train step on silicon: a few updates,
    finite loss/metrics, params stay finite (the compile-and-run gate for
    the third policy family's flagship path)."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_cnn_pallas as PCP
    from drone_tpu.models import PatchCNNActorCritic

    env = drone_tpu.DroneEnv()
    model = PatchCNNActorCritic()
    geom = PCP.cnn_geom(model)
    cfg = ppo_mod.PPOConfig(horizon=16, num_envs=2048, epochs=2,
                            num_minibatches=2)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)
    runner = runner.replace(
        opt_state=PCP.init_fused_opt_state(runner.params, geom))
    step = jax.jit(PCP.make_pallas_cnn_train_step(
        opt, env.params, env.statics, cfg, geom=geom, fused_optimizer=True))
    for _ in range(3):
        runner, m = step(runner)
        assert np.isfinite(float(m["loss"])), m
    for leaf in jax.tree_util.tree_leaves(runner.params):
        assert np.isfinite(np.asarray(leaf)).all()


# --- On-silicon learning gates beyond hover: 2 tasks x 3 trainer families
# (plus a racing smoke). Budgets calibrated on the chip 2026-08-20
# (_gates_calib.py sweep, 120-update curves at these exact configs):
#   mlp/waypoint   first5=-0.363 last5=+0.044  (improvement +0.41)
#   mlp/racing(60) first5=-0.319 last5=+0.046  (improvement +0.37)
#   lstm/hover     first5=-0.098 last5=+0.459  (improvement +0.56)
#   lstm/waypoint  first5=-0.378 last5=+0.157  (improvement +0.54)
#   cnn/hover      first5=-0.088 last5=+0.214  (improvement +0.30; lr=3e-3
#                  peaks +0.43 then collapses — the pixel policy needs the
#                  smaller step, so its row runs lr=1e-3)
# Thresholds sit at ~half the measured improvement. Updates are cheap on
# chip (~0.1 s incl. the value-fetch); Mosaic compile dominates each row.
_GATE_ROWS = [
    ("mlp", "waypoint", 120, 3e-3, 0.20),
    ("mlp", "racing", 60, 3e-3, 0.15),
    ("lstm", "hover", 120, 5e-3, 0.25),
    ("lstm", "waypoint", 120, 5e-3, 0.25),
    ("cnn", "hover", 120, 1e-3, 0.15),
]


@pytest.mark.parametrize("family,task,n,lr,margin", _GATE_ROWS,
                         ids=[f"{f}-{t}" for f, t, *_ in _GATE_ROWS])
def test_megakernel_learning_matrix_on_tpu(family, task, n, lr, margin):
    """END-TO-END learning on silicon beyond the hover/MLP gate
    (test_megakernel_learning_gate_on_tpu): compiled megakernel updates of
    waypoint/racing through the MLP trainer, hover/waypoint through the
    recurrent (truncated-BPTT) trainer, and hover through the pixel/CNN
    trainer must improve per-step reward by the calibrated margin (the
    on-chip analogue of the CPU-tier test_pallas_traj/test_pallas_rnn/
    test_pallas_cnn learning gates; VERDICT r4 item #7)."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_pallas, ppo_rnn, ppo_rnn_pallas
    from drone_tpu import ppo_cnn_pallas
    from drone_tpu.models import LSTMActorCritic, PatchCNNActorCritic

    env = drone_tpu.DroneEnv(task=task)
    if family == "mlp":
        model = ActorCritic(hidden=(32, 32))
        cfg = ppo_mod.PPOConfig(horizon=32, num_envs=2048, epochs=4,
                                num_minibatches=2, lr=lr, ent_coef=0.0)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_mod.init_runner(model, env, cfg, seed=0)
        runner = runner.replace(
            opt_state=ppo_pallas.init_fused_opt_state(runner.params))
        step = jax.jit(ppo_pallas.make_pallas_train_step(
            opt, env.params, env.statics, cfg, fused_optimizer=True))
    elif family == "cnn":
        model = PatchCNNActorCritic()
        geom = ppo_cnn_pallas.cnn_geom(model)
        cfg = ppo_mod.PPOConfig(horizon=32, num_envs=2048, epochs=4,
                                num_minibatches=2, lr=lr, ent_coef=0.0)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_mod.init_runner(model, env, cfg, seed=0)
        runner = runner.replace(
            opt_state=ppo_cnn_pallas.init_fused_opt_state(
                runner.params, geom))
        step = jax.jit(ppo_cnn_pallas.make_pallas_cnn_train_step(
            opt, env.params, env.statics, cfg, geom=geom,
            fused_optimizer=True))
    else:
        model = LSTMActorCritic(hidden=32, encoder=(32,))
        cfg = ppo_mod.PPOConfig(horizon=32, num_envs=2048, epochs=4,
                                num_minibatches=2, lr=lr, ent_coef=0.0,
                                bptt_horizon=16)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
        runner = runner.replace(
            opt_state=ppo_rnn_pallas.init_fused_opt_state(runner.params))
        step = jax.jit(ppo_rnn_pallas.make_pallas_rnn_train_step(
            opt, env.params, env.statics, cfg, fused_optimizer=True))
    rewards = []
    for _ in range(n):
        runner, m = step(runner)
        rewards.append(float(m["reward_mean"]))
    first = np.mean(rewards[:5])
    last = np.mean(rewards[-5:])
    assert np.isfinite(last)
    assert last > first + margin, (task, family, first, last)
