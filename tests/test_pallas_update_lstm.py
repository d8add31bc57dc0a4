"""BPTT LSTM update megakernel tests (ops/pallas_update_lstm.py) and the
recurrent megakernel trainer (ppo_rnn_pallas.py).

Contract mirrors tests/test_pallas_update.py: in interpret mode on the CPU
backend the kernel is BITWISE-equal to its jnp mirror
`ppo_lstm_update_reference` (gradients and stat sums, shuffled row-block
minibatches, multiple BPTT segments, any checkpoint chunking sc); the
hand-written backprop-through-time matches jax.grad of the equivalent
segmented_forward PPO loss; and the full recurrent megakernel train step
(rollout kernel + BPTT update kernel + fused adam) is bitwise-equal to its
reference mode and learns.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu import ppo_rnn
from drone_tpu import ppo_rnn_pallas as PRP
from drone_tpu.models import LSTMActorCritic
from drone_tpu.ops import pallas_acting_lstm as PAL
from drone_tpu.ops import pallas_acting_traj as PAT
from drone_tpu.ops import pallas_update as PU
from drone_tpu.ops import pallas_update_lstm as PUL
from drone_tpu.ops.pallas_acting_traj import TP_DONE, TP_REW, TP_VAL


def _setup(hidden=16, encoder=(16,), seed=0):
    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=hidden, encoder=encoder)
    carry1 = model.initial_carry((1,))
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 13), jnp.float32), carry1)
    return env, model, params


def _rollout_data(env, model, params, N, T, bptt, seed=3, ep_horizon=6):
    """Reference-rollout training data in BOTH layouts: kernel planes +
    snap, and scan-style Traj + batch-layout anchors (for jax.grad
    cross-checks). Episode horizon is short so done-masking is exercised
    inside the BPTT window."""
    carry = model.initial_carry((N,))
    p = env.params.replace(horizon=jnp.int32(ep_horizon))
    state = env.init_batch(seed, N)
    final, out_carry, traj, snap, _ = jax.jit(
        lambda s, c, pp, prm: PAL.traj_lstm_rollout_reference(
            s, prm, c, pp, env.statics, T, bptt=bptt, seg_layout="planes")
    )(state, carry, p, params)
    rows = N // 128
    planes = PAT.pack_traj_planes(traj, rows)
    last_obs = env.observe_batch(final)
    last_value = PRP._lstm_value(last_obs, out_carry, params).reshape(
        rows, 128)
    adv, ret = ppo_mod.compute_gae(
        planes[:, TP_REW], planes[:, TP_VAL], planes[:, TP_DONE],
        last_value, 0.99, 0.95)
    adv = (adv - jnp.mean(adv)) / jnp.sqrt(jnp.var(adv) + 1e-8)
    advret = jnp.stack([adv, ret])
    seg_batch = (snap[:, 0].transpose(0, 2, 1), snap[:, 1].transpose(0, 2, 1))
    return planes, advret, snap, traj, seg_batch


def test_lstm_update_kernel_bitwise_vs_mirror():
    """Kernel (interpret) == jnp mirror bit for bit: every weight gradient
    and the stat sums, with a shuffled multi-block minibatch, 2 BPTT
    segments, and done events inside the window."""
    env, model, params = _setup()
    N, T, bptt = 256, 8, 4
    planes, advret, snap, _, _ = _rollout_data(env, model, params, N, T, bptt)
    tensors, n_enc = PRP.lstm_kernel_tensors(params)
    co = PU.UpdateConsts(clip_eps=0.2, vf_clip=10.0, vf_coef=0.5,
                         inv_m=1.0 / (N * T))
    perm = jnp.array([1, 0], jnp.int32)      # both row blocks, shuffled
    for sc in (1, 2, 4):
        gk, stk = PUL.ppo_lstm_update(
            planes, advret, snap, perm, tensors[:-1], tensors[-1],
            bptt=bptt, co=co, rbu=1, sc=sc, mode="kernel", interpret=True)
        gr, str_ = PUL.ppo_lstm_update(
            planes, advret, snap, perm, tensors[:-1], tensors[-1],
            bptt=bptt, co=co, rbu=1, sc=sc, mode="reference")
        for i, (a, b) in enumerate(zip(gk, gr)):
            np.testing.assert_array_equal(
                np.asarray(a).view(np.uint32), np.asarray(b).view(np.uint32),
                err_msg=f"grad[{i}] sc={sc}")
        np.testing.assert_array_equal(
            np.asarray(stk).view(np.uint32), np.asarray(str_).view(np.uint32),
            err_msg=f"stats sc={sc}")


def test_lstm_update_sc_invariance():
    """The checkpoint chunk length sc is a pure memory-plan knob: the same
    expressions in the same accumulation order for any sc. Agreement is
    ulp-level, not bitwise: the per-step loops are lax.fori_loops (the VMEM
    memory plan), and XLA may lower the tiny (1, L) head matvec's reduction
    differently across the sc variants' loop structures (observed: sc=1's
    statically-zero-trip prefix loop folds away, shifting the critic-head
    grad by ~4 ulp). The bitwise contract that matters — kernel == mirror
    at each sc — is test_lstm_update_kernel_bitwise_vs_mirror."""
    env, model, params = _setup(hidden=8, encoder=(8,))
    N, T, bptt = 128, 4, 4
    planes, advret, snap, _, _ = _rollout_data(env, model, params, N, T, bptt)
    tensors, _ = PRP.lstm_kernel_tensors(params)
    co = PU.UpdateConsts(clip_eps=0.2, vf_clip=10.0, vf_coef=0.5,
                         inv_m=1.0 / (N * T))
    perm = jnp.array([0], jnp.int32)
    g1, s1 = PUL.ppo_lstm_update(planes, advret, snap, perm, tensors[:-1],
                                 tensors[-1], bptt=bptt, co=co, rbu=1, sc=1,
                                 mode="reference")
    g4, s4 = PUL.ppo_lstm_update(planes, advret, snap, perm, tensors[:-1],
                                 tensors[-1], bptt=bptt, co=co, rbu=1, sc=4,
                                 mode="reference")
    for a, b in zip(g1, g4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s4),
                               rtol=1e-6, atol=0)


def test_lstm_update_grads_match_jax_grad():
    """The hand-written BPTT == jax.grad of the segmented_forward PPO loss
    (ppo_rnn.loss_fn math) on the same stored data — including the
    log_std gradient assembled from the stat planes, truncation at segment
    boundaries, and done-masked carries."""
    env, model, params = _setup()
    N, T, bptt = 256, 8, 4
    ent_coef, vf_coef, clip_eps, vf_clip = 0.01, 0.5, 0.2, 10.0
    planes, advret, snap, traj, seg_batch = _rollout_data(
        env, model, params, N, T, bptt)
    tensors, n_enc = PRP.lstm_kernel_tensors(params)
    co = PU.UpdateConsts(clip_eps=clip_eps, vf_clip=vf_clip, vf_coef=vf_coef,
                         inv_m=1.0 / (N * T))
    perm = jnp.array([0, 1], jnp.int32)
    grads, st = PUL.ppo_lstm_update(
        planes, advret, snap, perm, tensors[:-1], tensors[-1],
        bptt=bptt, co=co, rbu=1, sc=2, mode="reference")
    dls = st[PU.ST_DLS0:PU.ST_DLS0 + 4] - ent_coef
    gtree = PRP.lstm_grads_pytree(params, grads, dls, n_enc)

    # adv/ret in (T, N) batch layout, bitwise the same values the planes
    # carry (lane n = row * 128 + col)
    adv = advret[0].reshape(T, N)
    ret = advret[1].reshape(T, N)

    def loss_fn(prm):
        mean, log_std, value = ppo_rnn.segmented_forward(
            model.apply, prm, traj.obs, traj.done, seg_batch, bptt)
        logp = ppo_mod.gaussian_logp(traj.action, mean, log_std)
        ratio = jnp.exp(logp - traj.logp)
        pg1 = -adv * ratio
        pg2 = -adv * jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
        pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
        v_clipped = traj.value + jnp.clip(value - traj.value, -vf_clip,
                                          vf_clip)
        v_loss = 0.5 * jnp.mean(jnp.maximum((value - ret) ** 2,
                                            (v_clipped - ret) ** 2))
        ent = jnp.mean(ppo_mod.gaussian_entropy(log_std))
        return pg_loss + vf_coef * v_loss - ent_coef * ent

    gref = jax.grad(loss_fn)(params)
    flat_k, _ = jax.tree_util.tree_flatten(gtree)
    flat_r, _ = jax.tree_util.tree_flatten(gref)
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_rnn_pallas_train_step_kernel_vs_reference():
    """Full recurrent megakernel train step: mode='kernel' (interpret) ==
    mode='reference' bit for bit after 2 updates (params; metrics to
    reduction-order tolerance) — for both the optax and the fused-adam
    optimizer paths."""
    env, model, params = _setup()
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=256, epochs=2,
                            num_minibatches=2, bptt_horizon=4)
    opt = ppo_mod.make_optimizer(cfg)
    for fused in (False, True):
        r0 = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=1)
        if fused:
            r0 = r0.replace(opt_state=PRP.init_fused_opt_state(r0.params))
        step_k = jax.jit(PRP.make_pallas_rnn_train_step(
            opt, env.params, env.statics, cfg, mode="kernel",
            interpret=True, fused_optimizer=fused))
        step_r = jax.jit(PRP.make_pallas_rnn_train_step(
            opt, env.params, env.statics, cfg, mode="reference",
            fused_optimizer=fused))
        ra, rb = r0, r0
        for _ in range(2):
            ra, ma = step_k(ra)
            rb, mb = step_r(rb)
        for pa, pb in zip(jax.tree_util.tree_leaves(ra.params),
                          jax.tree_util.tree_leaves(rb.params)):
            np.testing.assert_array_equal(
                np.asarray(pa).view(np.uint32),
                np.asarray(pb).view(np.uint32), err_msg=f"fused={fused}")
        # episode counters commute exactly; float episode-stat sums differ
        # only in reduction order (kernel stat planes vs mirror flat sums —
        # same split as test_pallas_traj's stats comparison)
        for k in ma:
            if k == "episodes":
                assert float(ma[k]) == float(mb[k]), f"{k} fused={fused}"
            else:
                np.testing.assert_allclose(
                    float(ma[k]), float(mb[k]), rtol=1e-6, atol=1e-7,
                    err_msg=f"{k} fused={fused}")


def test_rnn_pallas_vs_ppo_rnn_segmented_update():
    """The recurrent megakernel trainer and ppo_rnn's rollout='pallas_ref'
    + segmented_forward flax update agree closely after an update under
    IDENTICAL rollout data and minibatch selection (1 minibatch = the whole
    batch, 1 epoch): same loss to fp tolerance — ties the kernel trainer's
    semantics to the canonical recurrent path."""
    env, model, params = _setup()
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=256, epochs=1,
                            num_minibatches=1, bptt_horizon=4)
    opt = ppo_mod.make_optimizer(cfg)
    r0 = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=2)
    step_mk = jax.jit(PRP.make_pallas_rnn_train_step(
        opt, env.params, env.statics, cfg, mode="reference"))
    step_sf = jax.jit(ppo_rnn.make_recurrent_train_step(
        model.apply, opt, env.params, env.statics, cfg,
        rollout="pallas_ref"))
    _, m_mk = step_mk(r0)
    _, m_sf = step_sf(r0)
    np.testing.assert_allclose(float(m_mk["loss"]), float(m_sf["loss"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_mk["v_loss"]), float(m_sf["v_loss"]),
                               rtol=1e-4, atol=1e-6)


def test_rnn_pallas_trainer_learns():
    """Per-step reward improves over a short recurrent megakernel training
    run (rollout kernel + BPTT update kernel + fused adam, interpret)."""
    env, model, params = _setup(hidden=32, encoder=(32,))
    # lr=5e-3: the recurrent policy needs a hotter step than the MLP gate's
    # 3e-3 to crest within the budget (measured: 3e-3 -> +0.10 at 80
    # updates; 5e-3 -> +0.38 at 100)
    cfg = ppo_mod.PPOConfig(horizon=32, num_envs=256, epochs=4,
                            num_minibatches=2, lr=5e-3, ent_coef=0.0,
                            bptt_horizon=16)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    runner = runner.replace(opt_state=PRP.init_fused_opt_state(runner.params))
    step = jax.jit(PRP.make_pallas_rnn_train_step(
        opt, env.params, env.statics, cfg, mode="kernel", interpret=True,
        fused_optimizer=True))
    rewards = []
    for _ in range(100):
        runner, m = step(runner)
        rewards.append(float(m["reward_mean"]))
    first = np.mean(rewards[:5])
    last = np.mean(rewards[-5:])
    assert np.isfinite(last)
    assert last > first + 0.15, (first, last)


def _setup_cnn_lstm(seed=0, hidden=16):
    from drone_tpu.models import CNNLSTMActorCritic

    env = drone_tpu.DroneEnv()
    model = CNNLSTMActorCritic(res=8, patch0=2, patch1=2, channels=(8, 8),
                               trunk_hidden=16, hidden=hidden)
    carry1 = model.initial_carry((1,))
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 13), jnp.float32), carry1)
    return env, model, params


def test_cnn_lstm_update_kernel_bitwise_vs_mirror():
    """Pixel-recurrent BPTT update kernel (CNN encoder fwd/bwd hook,
    interpret) == jnp mirror bit for bit — gradients (conv tower AND gates)
    and stat sums, shuffled row blocks, multiple segments."""
    env, model, params = _setup_cnn_lstm()
    N, T, bptt = 256, 8, 4
    planes, advret, snap, _, _ = _rollout_data(env, model, params, N, T, bptt)
    tensors, n_enc = PRP.lstm_kernel_tensors(params)
    assert n_enc == 3  # (W0, b0), (W1, b1), (Wt, bt)
    encoder, geom = PAL.lstm_encoder_kind(params)
    assert encoder == "cnn" and geom.key == (8, 2, 2)
    co = PU.UpdateConsts(clip_eps=0.2, vf_clip=10.0, vf_coef=0.5,
                         inv_m=1.0 / (N * T))
    perm = jnp.array([1, 0], jnp.int32)
    for sc in (2, 4):
        gk, stk = PUL.ppo_lstm_update(
            planes, advret, snap, perm, tensors[:-1], tensors[-1],
            bptt=bptt, co=co, rbu=1, sc=sc, mode="kernel", interpret=True,
            encoder=encoder, geom=geom)
        gr, str_ = PUL.ppo_lstm_update(
            planes, advret, snap, perm, tensors[:-1], tensors[-1],
            bptt=bptt, co=co, rbu=1, sc=sc, mode="reference",
            encoder=encoder, geom=geom)
        for i, (a, b) in enumerate(zip(gk, gr)):
            np.testing.assert_array_equal(
                np.asarray(a).view(np.uint32), np.asarray(b).view(np.uint32),
                err_msg=f"grad[{i}] sc={sc}")
        np.testing.assert_array_equal(
            np.asarray(stk).view(np.uint32), np.asarray(str_).view(np.uint32),
            err_msg=f"stats sc={sc}")
        assert any(float(jnp.linalg.norm(g)) > 0 for g in gk)


def test_cnn_lstm_update_grads_match_jax_grad():
    """The hand-written conv+BPTT backward == jax.grad of the
    segmented_forward PPO loss through CNNLSTMActorCritic.apply on the same
    stored data — truncation, done-masked carries, and the conv tower's
    gradient all included."""
    env, model, params = _setup_cnn_lstm()
    N, T, bptt = 256, 8, 4
    ent_coef, vf_coef, clip_eps, vf_clip = 0.01, 0.5, 0.2, 10.0
    planes, advret, snap, traj, seg_batch = _rollout_data(
        env, model, params, N, T, bptt)
    tensors, n_enc = PRP.lstm_kernel_tensors(params)
    encoder, geom = PAL.lstm_encoder_kind(params)
    co = PU.UpdateConsts(clip_eps=clip_eps, vf_clip=vf_clip, vf_coef=vf_coef,
                         inv_m=1.0 / (N * T))
    perm = jnp.array([0, 1], jnp.int32)
    grads, st = PUL.ppo_lstm_update(
        planes, advret, snap, perm, tensors[:-1], tensors[-1],
        bptt=bptt, co=co, rbu=1, sc=2, mode="reference", encoder=encoder,
        geom=geom)
    dls = st[PU.ST_DLS0:PU.ST_DLS0 + 4] - ent_coef
    gtree = PRP.lstm_grads_pytree(params, grads, dls, n_enc)

    adv = advret[0].reshape(T, N)
    ret = advret[1].reshape(T, N)

    def loss_fn(prm):
        mean, log_std, value = ppo_rnn.segmented_forward(
            model.apply, prm, traj.obs, traj.done, seg_batch, bptt)
        logp = ppo_mod.gaussian_logp(traj.action, mean, log_std)
        ratio = jnp.exp(logp - traj.logp)
        pg1 = -adv * ratio
        pg2 = -adv * jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
        pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
        v_clipped = traj.value + jnp.clip(value - traj.value, -vf_clip,
                                          vf_clip)
        v_loss = 0.5 * jnp.mean(jnp.maximum((value - ret) ** 2,
                                            (v_clipped - ret) ** 2))
        ent = jnp.mean(ppo_mod.gaussian_entropy(log_std))
        return pg_loss + vf_coef * v_loss - ent_coef * ent

    gref = jax.grad(loss_fn)(params)
    flat_k = jax.tree_util.tree_leaves(gtree)
    flat_r = jax.tree_util.tree_leaves(gref)
    assert len(flat_k) == len(flat_r)
    for a, b in zip(flat_k, flat_r):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6 + 3e-4 * scale, rtol=0)


def test_cnn_lstm_pallas_train_step_kernel_vs_reference():
    """Full pixel-recurrent megakernel train step (CNN-encoder rollout
    kernel + BPTT update kernel + fused adam): kernel (interpret) ==
    reference mode bitwise after 2 updates."""
    env, model, params = _setup_cnn_lstm(seed=1)
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=256, epochs=2,
                            num_minibatches=2, bptt_horizon=4)
    opt = ppo_mod.make_optimizer(cfg)
    r0 = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=1)
    r0 = r0.replace(opt_state=PRP.init_fused_opt_state(r0.params))
    step_k = jax.jit(PRP.make_pallas_rnn_train_step(
        opt, env.params, env.statics, cfg, mode="kernel",
        interpret=True, fused_optimizer=True))
    step_r = jax.jit(PRP.make_pallas_rnn_train_step(
        opt, env.params, env.statics, cfg, mode="reference",
        fused_optimizer=True))
    ra, rb = r0, r0
    for _ in range(2):
        ra, ma = step_k(ra)
        rb, mb = step_r(rb)
    for pa, pb in zip(jax.tree_util.tree_leaves(ra.params),
                      jax.tree_util.tree_leaves(rb.params)):
        np.testing.assert_array_equal(np.asarray(pa).view(np.uint32),
                                      np.asarray(pb).view(np.uint32))
    for k in ma:
        if k == "episodes":
            assert float(ma[k]) == float(mb[k]), k
        else:
            np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                       rtol=1e-6, atol=1e-7, err_msg=k)


def test_cnn_lstm_pallas_trainer_learns():
    """The pixel-recurrent megakernel trainer learns on hover: value loss
    drops over a short run, every param (convs and gates) stays finite."""
    env, model, params = _setup_cnn_lstm(seed=0, hidden=32)
    cfg = ppo_mod.PPOConfig(horizon=16, num_envs=256, epochs=2,
                            num_minibatches=2, lr=1e-3, bptt_horizon=8)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    runner = runner.replace(opt_state=PRP.init_fused_opt_state(runner.params))
    step = jax.jit(PRP.make_pallas_rnn_train_step(
        opt, env.params, env.statics, cfg, mode="reference",
        fused_optimizer=True))
    vloss = []
    for _ in range(20):
        runner, m = step(runner)
        assert np.isfinite(float(m["loss"]))
        vloss.append(float(m["v_loss"]))
    assert np.mean(vloss[-5:]) < np.mean(vloss[1:6]), vloss
    for leaf in jax.tree_util.tree_leaves(runner.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_lstm_opt_state_converters_roundtrip():
    """optax -> fused -> optax preserves the adam moments bitwise (the
    recurrent cross-trainer checkpoint portability contract)."""
    env, model, params = _setup()
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=256, epochs=1,
                            num_minibatches=1, bptt_horizon=4)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=4)
    step = jax.jit(ppo_rnn.make_recurrent_train_step(
        model.apply, opt, env.params, env.statics, cfg))
    runner, _ = step(runner)          # non-trivial moments
    fused = PRP.optax_to_fused_opt_state(runner.opt_state)
    back = PRP.fused_to_optax_opt_state(opt, runner.params, fused)
    la = jax.tree_util.tree_leaves(runner.opt_state)
    lb = jax.tree_util.tree_leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lstm_update_bptt_cap_guard():
    """Compiled mode refuses bptt beyond the VMEM-feasible cap with an
    actionable error (interpret mode has no cap)."""
    env, model, params = _setup(hidden=8, encoder=(8,))
    N, T, bptt = 128, 64, 64
    planes, advret, snap, _, _ = _rollout_data(env, model, params, N, T, bptt)
    tensors, _ = PRP.lstm_kernel_tensors(params)
    co = PU.UpdateConsts(clip_eps=0.2, vf_clip=10.0, vf_coef=0.5,
                         inv_m=1.0 / (N * T))
    with pytest.raises(ValueError, match="bptt_horizon"):
        PUL.ppo_lstm_update(planes, advret, snap,
                            jnp.array([0], jnp.int32), tensors[:-1],
                            tensors[-1], bptt=bptt, co=co, rbu=1,
                            mode="kernel", interpret=False)
