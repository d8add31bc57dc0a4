"""PPO update megakernel tests (ops/pallas_update.py + ppo_pallas.py).

Three gates:
  1. the hand-written backprop equals jax.grad of the same plane-space loss
     (tolerance — autodiff emits differently-ordered but equivalent ops);
  2. the Mosaic kernel (interpret mode) equals the jnp mirror bitwise —
     gradients and stat sums;
  3. the gradient pytree matches the ActorCritic param structure exactly.
The full train-step bitwise gate lives in tests/test_pallas_traj.py.
"""

import numpy as np
import jax
import jax.numpy as jnp

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu.models import ActorCritic
from drone_tpu.ops import pallas_update as PU
from drone_tpu.ops import pallas_acting_traj as PAT
from drone_tpu.ops.pallas_acting import actor_weights
from drone_tpu.ops.pallas_acting_traj import N_TRAJ, _log_std, critic_weights
from drone_tpu import ppo_pallas


def _fixture(T=8, rows=4, hidden=(16, 16), seed=0):
    """Random-but-plausible trajectory planes + params."""
    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=hidden)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 13), jnp.float32))
    # a real rollout gives planes with consistent (obs, action, logp, value)
    state = env.init_batch(seed + 1, rows * 128)
    _, planes, _ = PAT.traj_act_rollout_pallas_planes(
        state, params, env.params, env.statics, T, lanes_per_block=rows * 128,
        interpret=True)
    k = jax.random.PRNGKey(seed + 2)
    # planes: (T, N_TRAJ, rows, 128); advret: (2, T, rows, 128)
    adv = jax.random.normal(k, (T, rows, 128), jnp.float32)
    ret = planes[:, PAT.TP_VAL] + 0.5 * adv
    advret = jnp.stack([adv, ret])
    co = PU.UpdateConsts(clip_eps=0.2, vf_clip=10.0, vf_coef=0.5,
                         inv_m=1.0 / (rows * 128 * T))
    return params, planes, advret, co


def _loss_jnp(params, planes, advret, co):
    """Plane-space PPO loss with the SAME formulation the kernel
    differentiates by hand — autodiff ground truth for gate 1 (full batch:
    perm = identity)."""
    aw = actor_weights(params)
    cw = critic_weights(params)
    ls_row = _log_std(params)
    T, rows = planes.shape[0], planes.shape[2]
    S = T * rows * 128
    flat = planes.transpose(1, 0, 2, 3).reshape(N_TRAJ, S)
    X = flat[PAT.TP_OBS0:PAT.TP_OBS0 + 13]
    a = [flat[PAT.TP_ACT0 + k] for k in range(4)]
    logp_old = flat[PAT.TP_LOGP]
    v_old = flat[PAT.TP_VAL]
    adv = advret[0].reshape(S)
    ret = advret[1].reshape(S)

    mx = PAT._tower(X, aw)
    vx = PAT._tower(X, cw)
    v = vx[0]
    lp = None
    for k in range(4):
        std_k = jnp.exp(ls_row[0, k])
        zk = (a[k] - mx[k]) / std_k
        term = jnp.float32(-0.5) * (zk * zk) - ls_row[0, k] - jnp.float32(
            PAT._HALF_LOG_2PI)
        lp = term if lp is None else lp + term
    ratio = jnp.exp(lp - logp_old)
    pg1 = -adv * ratio
    pg2 = -adv * jnp.clip(ratio, 1.0 - co.clip_eps, 1.0 + co.clip_eps)
    pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
    v_clipped = v_old + jnp.clip(v - v_old, -co.vf_clip, co.vf_clip)
    v_loss = 0.5 * jnp.mean(jnp.maximum((v - ret) ** 2,
                                        (v_clipped - ret) ** 2))
    return pg_loss + co.vf_coef * v_loss


def test_handwritten_backprop_matches_autodiff():
    params, planes, advret, co = _fixture()
    rows = planes.shape[2]
    perm = jnp.arange(rows, dtype=jnp.int32)
    (ga, gc), st = PU.ppo_update(
        planes, advret, perm, actor_weights(params), critic_weights(params),
        _log_std(params), tc=4, co=co, mode="reference")
    dls = st[PU.ST_DLS0:PU.ST_DLS0 + 4]  # entropy term excluded (added by
    grads = ppo_pallas._grads_pytree(params, ga, gc, dls)  # the trainer)

    auto = jax.grad(_loss_jnp)(params, planes, advret, co)
    for path_a, path_b in zip(
            jax.tree_util.tree_leaves_with_path(grads),
            jax.tree_util.tree_leaves_with_path(auto)):
        assert path_a[0] == path_b[0]
        np.testing.assert_allclose(
            np.asarray(path_a[1]), np.asarray(path_b[1]),
            rtol=2e-4, atol=1e-7,
            err_msg=jax.tree_util.keystr(path_a[0]))


def test_update_kernel_bitwise_vs_reference():
    params, planes, advret, co = _fixture(T=8, rows=8)
    perm = jnp.asarray([5, 2, 7, 0], jnp.int32)  # a strided minibatch
    aw, cw, ls = actor_weights(params), critic_weights(params), _log_std(params)
    (ga_k, gc_k), st_k = PU.ppo_update(planes, advret, perm, aw, cw, ls,
                                       tc=4, co=co, mode="kernel",
                                       interpret=True)
    (ga_r, gc_r), st_r = PU.ppo_update(planes, advret, perm, aw, cw, ls,
                                       tc=4, co=co, mode="reference")
    for (wk, bk), (wr, br) in zip((*ga_k, *gc_k), (*ga_r, *gc_r)):
        np.testing.assert_array_equal(np.asarray(wk).view(np.uint32),
                                      np.asarray(wr).view(np.uint32))
        np.testing.assert_array_equal(np.asarray(bk).view(np.uint32),
                                      np.asarray(br).view(np.uint32))
    np.testing.assert_array_equal(np.asarray(st_k).view(np.uint32),
                                  np.asarray(st_r).view(np.uint32))


def test_grads_pytree_matches_params_structure():
    params, planes, advret, co = _fixture(hidden=(8, 8, 8))
    rows = planes.shape[2]
    perm = jnp.arange(rows, dtype=jnp.int32)
    (ga, gc), st = PU.ppo_update(
        planes, advret, perm, actor_weights(params), critic_weights(params),
        _log_std(params), tc=4, co=co, mode="reference")
    grads = ppo_pallas._grads_pytree(params, ga, gc,
                                     st[PU.ST_DLS0:PU.ST_DLS0 + 4])
    assert (jax.tree_util.tree_structure(grads)
            == jax.tree_util.tree_structure(params))
    for g, p in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(params)):
        assert g.shape == p.shape and g.dtype == p.dtype


def test_update_minibatch_rows_actually_select():
    """Different row subsets give different gradients; the same subset in a
    different order gives the same SUMS up to order (here: exactly, because
    accumulation follows perm order — so permuted perm changes bits only
    through order; check values-close instead)."""
    params, planes, advret, co = _fixture(T=8, rows=8)
    aw, cw, ls = actor_weights(params), critic_weights(params), _log_std(params)
    g1, _ = PU.ppo_update(planes, advret, jnp.asarray([0, 1], jnp.int32),
                          aw, cw, ls, tc=4, co=co, mode="reference")
    g2, _ = PU.ppo_update(planes, advret, jnp.asarray([6, 7], jnp.int32),
                          aw, cw, ls, tc=4, co=co, mode="reference")
    d = max(float(jnp.abs(a[0] - b[0]).max())
            for a, b in zip(g1[0], g2[0]))
    assert d > 1e-8  # different data -> different grads
    g3, _ = PU.ppo_update(planes, advret, jnp.asarray([1, 0], jnp.int32),
                          aw, cw, ls, tc=4, co=co, mode="reference")
    for (wa, ba), (wb, bb) in zip(g1[0], g3[0]):
        np.testing.assert_allclose(np.asarray(wa), np.asarray(wb),
                                   rtol=1e-5, atol=1e-8)


def test_update_kernel_bf16_bitwise_and_sane():
    """compute_dtype='bfloat16' holds the same kernel-vs-mirror bitwise
    contract (bf16 operands, f32 accumulators on both sides) and stays close
    to the f32 gradients."""
    params, planes, advret, co = _fixture()
    rows = planes.shape[2]
    perm = jnp.arange(rows, dtype=jnp.int32)
    aw, cw, ls = actor_weights(params), critic_weights(params), _log_std(params)
    gk, sk = PU.ppo_update(planes, advret, perm, aw, cw, ls, tc=4, co=co,
                           mode="kernel", interpret=True,
                           compute_dtype="bfloat16")
    gr, sr = PU.ppo_update(planes, advret, perm, aw, cw, ls, tc=4, co=co,
                           mode="reference", compute_dtype="bfloat16")
    for (wk, bk), (wr, br) in zip((*gk[0], *gk[1]), (*gr[0], *gr[1])):
        np.testing.assert_array_equal(np.asarray(wk).view(np.uint32),
                                      np.asarray(wr).view(np.uint32))
    g32, _ = PU.ppo_update(planes, advret, perm, aw, cw, ls, tc=4, co=co,
                           mode="reference", compute_dtype="float32")
    for (wk, _), (w3, _) in zip(gk[0], g32[0]):
        np.testing.assert_allclose(np.asarray(wk), np.asarray(w3),
                                   rtol=0.1, atol=2e-4)


def _fused_runner(model, env, cfg, seed=1):
    r = ppo_mod.init_runner(model, env, cfg, seed=seed)
    return r.replace(opt_state=ppo_pallas.init_fused_opt_state(r.params))


def test_fused_adam_matches_optax():
    """The fused clip+adam (reference mode) reproduces the optax chain
    (clip_by_global_norm -> adam(eps=1e-5)) through 3 full train steps."""
    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=(16, 16))
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=256, epochs=2,
                            num_minibatches=2)
    opt = ppo_mod.make_optimizer(cfg)
    ra = ppo_mod.init_runner(model, env, cfg, seed=1)
    rb = _fused_runner(model, env, cfg, seed=1)

    step_opx = jax.jit(ppo_pallas.make_pallas_train_step(
        opt, env.params, env.statics, cfg, mode="reference"))
    step_fus = jax.jit(ppo_pallas.make_pallas_train_step(
        opt, env.params, env.statics, cfg, mode="reference",
        fused_optimizer=True))
    for _ in range(3):
        ra, ma = step_opx(ra)
        rb, mb = step_fus(rb)
    for (pa, pb) in zip(jax.tree_util.tree_leaves(ra.params),
                        jax.tree_util.tree_leaves(rb.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-7)
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]), rtol=1e-4,
                                   atol=1e-7, err_msg=k)


def test_fused_adam_kernel_bitwise_vs_mirror():
    """fused_adam kernel (interpret) == _adam_math mirror, bit for bit."""
    params, planes, advret, co = _fixture()
    tensors, na, nc = ppo_pallas._kernel_tensors(params)
    key = jax.random.PRNGKey(3)
    grads = [0.01 * jax.random.normal(jax.random.fold_in(key, i), t.shape)
             for i, t in enumerate(tensors)]
    mus = [0.1 * jnp.ones_like(t) for t in tensors]
    nus = [0.01 * jnp.ones_like(t) for t in tensors]
    ac = PU.AdamConsts(clip_norm=0.5)
    outk = PU.fused_adam(grads, tensors, mus, nus, 3e-4, 5.0, ac=ac,
                         mode="kernel", interpret=True)
    outr = PU.fused_adam(grads, tensors, mus, nus, 3e-4, 5.0, ac=ac,
                         mode="reference")
    for lk, lr_ in zip(outk, outr):
        for a, b in zip(lk, lr_):
            np.testing.assert_array_equal(np.asarray(a).view(np.uint32),
                                          np.asarray(b).view(np.uint32))


def test_fused_trainer_learns():
    """Learning gate through kernel rollout + kernel update + fused adam."""
    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=(32, 32))
    cfg = ppo_mod.PPOConfig(horizon=32, num_envs=512, epochs=4,
                            num_minibatches=4, lr=3e-3, ent_coef=0.0)
    opt = ppo_mod.make_optimizer(cfg)
    runner = _fused_runner(model, env, cfg, seed=0)
    step = jax.jit(ppo_pallas.make_pallas_train_step(
        opt, env.params, env.statics, cfg, interpret=True,
        fused_optimizer=True))
    rewards = []
    for _ in range(80):
        runner, m = step(runner)
        rewards.append(float(m["reward_mean"]))
    assert np.mean(rewards[-5:]) > np.mean(rewards[:5]) + 0.2
    assert np.mean(rewards[-5:]) > 0.3


def test_train_build_selects_pallas_trainer(tmp_path):
    """run.rollout='pallas' routes training through the megakernel trainer
    (interpret mode on CPU) end to end via the standard train() driver."""
    from drone_tpu.train import train
    from drone_tpu.utils.config import Config

    cfg = Config.default().with_overrides([
        "train.num_envs=256", "train.horizon=8", "train.epochs=1",
        "train.num_minibatches=2", "run.mesh=false", "run.total_updates=2",
        "run.log_interval=1", "run.checkpoint_interval=100",
        "run.rollout=pallas", "run.save_final=false",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.run.hidden = (16, 16)
    runner, last = train(cfg)
    assert np.isfinite(last["loss"])
    assert np.isfinite(last["reward_mean"])
    # the fused opt state (count, mu, nu) proves the megakernel path ran
    assert isinstance(runner.opt_state, tuple) and len(runner.opt_state) == 3
    assert float(runner.opt_state[0]) == 2 * 1 * 2  # updates*epochs*mb
