"""Megakernel PPO: rollout AND update phases on Pallas, plane-major end to end.

The scan-path trainer (drone_tpu.ppo) is the CleanRL-shaped baseline; this
module is the TPU speed-of-light configuration:

  rollout  — ops/pallas_acting_traj.py streams (obs, action, logp, value,
             reward, done) planes to HBM at kernel speed (policy+env fused
             in VMEM, counter-RNG exploration noise).
  GAE      — XLA reverse scan directly on the (T, rows, 128) value/reward/
             done planes (bandwidth-trivial; layout is already time-major).
  update   — ops/pallas_update.py runs each SGD minibatch fwd+bwd in VMEM
             with hand-written backprop; minibatch shuffling is a
             scalar-prefetched row-block permutation (no gather of the
             batch).
  optimizer— optax (adam + global-norm clip) on the tiny param pytree.

Training data never changes layout: the trajectory planes the rollout
kernel writes are the exact buffers the update kernel streams back in.

mode="reference" swaps BOTH kernels for their pure-jnp mirrors (same noise
streams, same matmul formulation, same accumulation order): the full train
step matches the kernel path bitwise in interpret mode on CPU — that
equivalence is the test gate (tests/test_pallas_traj.py,
tests/test_pallas_update.py).

Semantic deltas vs the scan trainer (documented, both intentional):
  - exploration noise comes from the env's counter streams, not the host
    PRNG key (reproducible per (lane, episode, step), key only drives
    minibatch permutations);
  - minibatch shuffling decorrelates at row-block granularity (1024 lanes
    compiled, fewer for tiny interpret runs) instead of single lanes (lanes
    are iid; at fleet scale row blocks mix episodes equally well, and
    single-lane gathers are the only thing the TPU layout would pay for).

Reference: SURVEY.md §3.1 (both hot loops of `[U] pufferlib/pufferl.py`,
here two Pallas kernels sharing one HBM buffer); BASELINE.json:10.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from drone_tpu import env as env_mod
from drone_tpu import ppo as ppo_mod
from drone_tpu.ops import pallas_acting_traj as PAT
from drone_tpu.ops import pallas_update as PU
from drone_tpu.ops.pallas_acting import actor_weights
from drone_tpu.ops.pallas_acting_traj import (
    TP_DONE,
    TP_REW,
    TP_VAL,
    _log_std,
    _tower,
    critic_weights,
)
from drone_tpu.types import EnvParams, EnvStatics


def _grads_pytree(params, ga, gc, dls):
    """Kernel-layout gradients -> a pytree matching the ActorCritic params
    (W^T back to flax (in, out); (out, 1) biases to (out,))."""
    out = {}
    for i in range(len(ga) - 1):
        out[f"actor_h{i}"] = {"kernel": ga[i][0].T, "bias": ga[i][1][:, 0]}
    out["actor_mean"] = {"kernel": ga[-1][0].T, "bias": ga[-1][1][:, 0]}
    for i in range(len(gc) - 1):
        out[f"critic_h{i}"] = {"kernel": gc[i][0].T, "bias": gc[i][1][:, 0]}
    out["critic_value"] = {"kernel": gc[-1][0].T, "bias": gc[-1][1][:, 0]}
    out["log_std"] = dls
    return {"params": out} if "params" in params else out


def _kernel_tensors(params):
    """params -> (flat kernel-layout tensor list [W, b(out,1), ..., ls(1,4)],
    n_actor, n_critic). The fused-optimizer carry format: every parameter,
    gradient, and adam-moment tensor shares these shapes."""
    aw = actor_weights(params)
    cw = critic_weights(params)
    t = []
    for w, b in (*aw, *cw):
        t.append(w)
        t.append(b.reshape(-1, 1))
    t.append(_log_std(params))
    return t, len(aw), len(cw)


def _tensors_to_params(template, tensors, n_actor, n_critic):
    pairs = [(tensors[2 * i], tensors[2 * i + 1])
             for i in range(n_actor + n_critic)]
    return _grads_pytree(template, pairs[:n_actor], pairs[n_actor:],
                         tensors[-1].reshape(4))


def init_fused_opt_state(params):
    """Fused-optimizer state: (count, mu, nu) with mu/nu in kernel tensor
    layout. Use as RunnerState.opt_state when fused_optimizer=True (it is a
    plain pytree — orbax checkpointing works unchanged)."""
    tensors, _, _ = _kernel_tensors(params)
    return (jnp.float32(0.0),
            [jnp.zeros_like(t) for t in tensors],
            [jnp.zeros_like(t) for t in tensors])


# ---------------------------------------------------------------------------
# Cross-trainer checkpoint portability: the fused (count, mu, nu) state and
# optax's chain(clip_by_global_norm, adam) state hold the SAME adam moments
# (mu/nu are elementwise tensors; the kernel layout is the params layout
# transposed), so a checkpoint written by one trainer resumes under the
# other with momentum intact. SURVEY.md §5 checkpoint/resume (the
# reference's *.pt resume is trainer-agnostic).
# ---------------------------------------------------------------------------

def is_fused_opt_state(opt_state) -> bool:
    """True for the (count, mu-list, nu-list) fused-adam state."""
    return (isinstance(opt_state, (tuple, list)) and len(opt_state) == 3
            and not hasattr(opt_state, "_fields")
            and isinstance(opt_state[1], (tuple, list))
            and isinstance(opt_state[2], (tuple, list))
            and not hasattr(opt_state[1], "_fields"))


def _find_state(opt_state, kind):
    """Depth-first search for a named-tuple state (e.g. ScaleByAdamState)
    inside an optax chain state."""
    if isinstance(opt_state, kind):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for x in opt_state:
            r = _find_state(x, kind)
            if r is not None:
                return r
    return None


def adam_state_to_fused(opt_state, params_to_tensors):
    """optax chain state -> fused (count, mu, nu), moments mapped through
    `params_to_tensors` (a params-pytree -> kernel-tensor-list layout fn).
    THE cross-trainer conversion core, shared by the MLP and recurrent
    trainers — the moments map 1:1 (bitwise: transposes/reshapes only)."""
    adam = _find_state(opt_state, optax.ScaleByAdamState)
    if adam is None:
        raise ValueError(
            "cannot convert optimizer state: no ScaleByAdamState found "
            f"(structure: {jax.tree_util.tree_structure(opt_state)})")
    return (jnp.asarray(adam.count, jnp.float32),
            params_to_tensors(adam.mu), params_to_tensors(adam.nu))


def fused_to_adam_state(optimizer, params, fused_state, tensors_to_params):
    """Fused (count, mu, nu) -> the optax state `optimizer.init(params)`
    would carry after the same number of steps: adam count/moments filled
    in (bitwise: layout only via `tensors_to_params`), schedule counts
    synced so lr annealing resumes where it left off. Shared by the MLP
    and recurrent trainers (the inverse of adam_state_to_fused)."""
    count, mu_t, nu_t = fused_state
    mu = tensors_to_params(list(mu_t))
    nu = tensors_to_params(list(nu_t))
    ci = jnp.asarray(count, jnp.int32)

    def repl(x):
        if isinstance(x, optax.ScaleByAdamState):
            return x._replace(count=ci, mu=mu, nu=nu)
        if isinstance(x, optax.ScaleByScheduleState):
            return x._replace(count=ci)
        return x

    is_leaf = lambda x: isinstance(
        x, (optax.ScaleByAdamState, optax.ScaleByScheduleState))
    return jax.tree_util.tree_map(repl, optimizer.init(params),
                                  is_leaf=is_leaf)


def optax_to_fused_opt_state(opt_state):
    """MLP trainer: optax state -> fused (count, mu, nu) in kernel layout."""
    return adam_state_to_fused(opt_state, lambda p: _kernel_tensors(p)[0])


def fused_to_optax_opt_state(optimizer, params, fused_state):
    """MLP trainer: fused (count, mu, nu) -> the matching optax state."""
    _, na, nc = _kernel_tensors(params)
    return fused_to_adam_state(
        optimizer, params, fused_state,
        lambda t: _tensors_to_params(params, t, na, nc))


# ---------------------------------------------------------------------------
# Shared megakernel-trainer scaffolding. The MLP (this module) and recurrent
# (ppo_rnn_pallas) trainers differ ONLY in their rollout and update kernels;
# the geometry planning, GAE/advantage normalization, loss bookkeeping,
# epoch/minibatch scan structure, and metrics reduction are one copy here —
# edit these, never fork per-trainer variants (same discipline as the
# kernel/mirror shared math functions).
# ---------------------------------------------------------------------------

def plan_minibatch_geometry(cfg, local_envs, mode, interpret):
    """Lane-row / row-block tiling shared by both megakernel trainers.

    Returns (rows, mb_rows, rbu, n_rb, mb_rb, co). Raises the compiled-mode
    alignment error when the minibatch tile cannot meet Mosaic's 8-row rule.
    """
    assert local_envs % 128 == 0, (
        f"the megakernel trainer needs num_envs % 128 == 0, got {local_envs}")
    rows = local_envs // 128
    assert rows % cfg.num_minibatches == 0, (
        f"lane rows ({rows} = {local_envs}/128) must divide into "
        f"{cfg.num_minibatches} minibatches")
    mb_rows = rows // cfg.num_minibatches
    m_samples = mb_rows * 128 * cfg.horizon
    co = PU.UpdateConsts(clip_eps=cfg.clip_eps, vf_clip=cfg.vf_clip,
                         vf_coef=cfg.vf_coef, inv_m=1.0 / m_samples)
    rbu = PU.pick_row_block(mb_rows)
    if mode == "kernel" and not interpret and rbu % 8:
        # Mosaic rejects the in-kernel (S,) -> (tc, rbu, 128) reshape
        # unless rbu % 8 == 0 (measured on v5e: rbu=4 fails
        # `infer-vector-layout: unsupported shape cast`, rbu=8 compiles)
        raise ValueError(
            f"compiled update kernels need 8-row (1024-lane) minibatch "
            f"tiles: num_envs/device ({local_envs}) gives {mb_rows} rows "
            f"per minibatch ({cfg.num_minibatches} minibatches), not a "
            f"multiple of 8. Use num_envs divisible by "
            f"{1024 * cfg.num_minibatches}, or interpret=True on CPU.")
    return rows, mb_rows, rbu, rows // rbu, mb_rows // rbu, co


def make_fused_lr(cfg):
    """lr schedule for the fused-adam kernel; matches ppo.make_optimizer's
    linear anneal over total optimizer steps."""
    total_opt_steps = cfg.total_updates * cfg.epochs * cfg.num_minibatches

    def _fused_lr(count):
        if not cfg.anneal_lr:
            return jnp.float32(cfg.lr)
        frac = jnp.minimum(count / jnp.float32(total_opt_steps), 1.0)
        return jnp.float32(cfg.lr) * (1.0 - frac)

    return _fused_lr


def normalized_advret(planes, last_value, cfg, axis_name):
    """GAE on the time-major planes + (cross-device) advantage
    normalization -> stacked (2, T, rows, 128) [adv, ret]."""
    adv, ret = ppo_mod.compute_gae(
        planes[:, TP_REW], planes[:, TP_VAL], planes[:, TP_DONE],
        last_value, cfg.gamma, cfg.gae_lambda)
    if axis_name is not None:
        g_mean = jax.lax.pmean(jnp.mean(adv), axis_name)
        g_var = jax.lax.pmean(jnp.mean((adv - g_mean) ** 2), axis_name)
    else:
        g_mean = jnp.mean(adv)
        g_var = jnp.var(adv)
    adv = (adv - g_mean) / jnp.sqrt(g_var + 1e-8)
    return jnp.stack([adv, ret])


def make_losses(cfg, co):
    """Loss/aux bookkeeping from the update kernel's stats vector."""

    def _losses(st, ent):
        pg_loss = st[PU.ST_PG] * co.inv_m
        v_loss = 0.5 * st[PU.ST_VL] * co.inv_m
        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
        aux = dict(pg_loss=pg_loss, v_loss=v_loss, entropy=ent,
                   approx_kl=st[PU.ST_KL] * co.inv_m,
                   clipfrac=st[PU.ST_CF] * co.inv_m)
        return loss, aux

    return _losses


def run_epoch_scans(step_fn, carry0, kperm, cfg, n_rb, mb_rb):
    """epochs x minibatches: row-block permutation per epoch, step_fn per
    minibatch slice. Returns (final carry, (losses, auxes))."""

    def epoch_body(carry, ekey):
        perm = jax.random.permutation(ekey, n_rb)

        def mb_body(carry, mb_idx):
            perm_mb = jax.lax.dynamic_slice(
                perm, (mb_idx * mb_rb,), (mb_rb,))
            return step_fn(carry, perm_mb)

        return jax.lax.scan(mb_body, carry,
                            jnp.arange(cfg.num_minibatches))

    epoch_keys = jax.random.split(kperm, cfg.epochs)
    return jax.lax.scan(epoch_body, carry0, epoch_keys)


def trainer_metrics(stats, losses, auxes, cfg, local_envs, axis_name):
    """Metrics reduction shared by both megakernel trainers (keys match the
    scan trainers')."""
    n_done = stats["episodes"]
    ep_ret_sum = stats["ep_return_sum"]
    ep_len_sum = stats["ep_length_sum"]
    reward_sum = stats["reward_sum"]
    if axis_name is not None:
        n_done = jax.lax.psum(n_done, axis_name)
        ep_ret_sum = jax.lax.psum(ep_ret_sum, axis_name)
        ep_len_sum = jax.lax.psum(ep_len_sum, axis_name)
        reward_sum = jax.lax.psum(reward_sum, axis_name)
        denom = jnp.float32(cfg.horizon * local_envs) * jax.lax.psum(
            jnp.float32(1.0), axis_name)
    else:
        denom = jnp.float32(cfg.horizon * local_envs)
    metrics = dict(
        loss=jnp.mean(losses),
        reward_mean=reward_sum / denom,
        episodes=n_done,
        ep_return_mean=ep_ret_sum / jnp.maximum(n_done, 1.0),
        ep_length_mean=ep_len_sum / jnp.maximum(n_done, 1.0),
        **{k: jnp.mean(v) for k, v in auxes.items()},
    )
    if axis_name is not None:
        # loss/aux are per-device means over DIFFERENT data shards; average
        # them across the axis like the scan trainer does
        for k in ("loss", "pg_loss", "v_loss", "entropy", "approx_kl",
                  "clipfrac"):
            metrics[k] = jax.lax.pmean(metrics[k], axis_name)
    return metrics


def make_pallas_train_step(
    optimizer: optax.GradientTransformation,
    env_params: EnvParams,
    statics: EnvStatics,
    cfg: ppo_mod.PPOConfig,
    axis_name: str | None = None,
    envs_per_device: int | None = None,
    mode: str = "kernel",
    interpret: bool = False,
    update_tc: int = 16,
    compute_dtype: str = "float32",
    fused_optimizer: bool = False,
):
    """Build the megakernel train step: RunnerState -> (RunnerState, metrics).

    mode: "kernel" (Mosaic kernels; interpret=True routes them through the
    Pallas interpreter for CPU testing) or "reference" (pure-jnp mirrors,
    bitwise-equal math). Metrics keys match drone_tpu.ppo.make_train_step.
    compute_dtype: "float32" or "bfloat16" — operand precision of the tower
    matmuls in BOTH kernels (f32 accumulation either way; the kernel/mirror
    bitwise contract holds per dtype). bfloat16 trades ulp-level policy
    precision for ~3x the MXU matmul rate, the same trade the scan trainer
    offers via ActorCritic(dtype=bfloat16).
    """
    if mode not in ("kernel", "reference"):
        raise ValueError(f"mode must be 'kernel' or 'reference', got {mode!r}")
    local_envs = envs_per_device if envs_per_device is not None else cfg.num_envs
    # update tiles: rbu rows x tc steps, shuffled at row-block granularity
    # (the update kernel gathers (tc, N_TRAJ, rbu, 128) tiles straight from
    # the rollout kernel's natural layout; cap keeps tc*rbu*128 at the
    # ~2048-sample compute tile)
    rows, mb_rows, rbu, n_rb, mb_rb, co = plan_minibatch_geometry(
        cfg, local_envs, mode, interpret)
    tc = PU.pick_update_chunk(cfg.horizon, cap=max(1, update_tc // rbu))
    # fused optimizer: clip+adam as ONE kernel launch per SGD step, weights
    # carried in kernel layout across the whole update phase (the optax path
    # costs ~0.9 ms of tiny-op glue per step). Semantics match
    # ppo.make_optimizer: clip_by_global_norm(max_grad_norm) -> adam(lr,
    # eps=1e-5), with the same linear lr anneal.
    ac = PU.AdamConsts(clip_norm=cfg.max_grad_norm)
    _fused_lr = make_fused_lr(cfg)

    def rollout(runner):
        if mode == "kernel":
            return PAT.traj_act_rollout_pallas_planes(
                runner.env_state, runner.params, env_params, statics,
                cfg.horizon, interpret=interpret,
                compute_dtype=compute_dtype)
        final, traj, stats = PAT.traj_act_rollout_reference(
            runner.env_state, runner.params, env_params, statics, cfg.horizon,
            compute_dtype=compute_dtype)
        return final, PAT.pack_traj_planes(traj, rows), stats

    def train_step(runner: ppo_mod.RunnerState):
        key, kperm = jax.random.split(runner.key)

        # --- rollout: trajectory planes straight to HBM --------------------
        final_state, planes, stats = rollout(runner)
        last_obs = jax.vmap(env_mod.observe)(final_state)

        # --- GAE on the planes (shared jnp: identical in both modes) -------
        # planes are (T, N_TRAJ, rows, 128) — already time-major, exactly
        # what the reverse scan walks; plane selection is a free slice
        critic_w = critic_weights(runner.params)
        cdt = jnp.dtype(compute_dtype).type
        last_value = _tower(last_obs.T, critic_w, cdt)[0].reshape(rows, 128)
        advret = normalized_advret(planes, last_value, cfg, axis_name)

        # --- epochs x minibatches through the update megakernel ------------
        _losses = make_losses(cfg, co)

        def sgd_step(carry, perm_mb):
            params, opt_state = carry
            aw = actor_weights(params)
            cw = critic_weights(params)
            ls = _log_std(params)
            # state-independent Gaussian entropy at the pre-update params
            # (what loss_fn's mean over the minibatch evaluates to)
            ent = jnp.sum(ls[0] + 0.5 * (1.0 + 2.0 * PAT._HALF_LOG_2PI))
            (ga, gc), st = PU.ppo_update(
                planes, advret, perm_mb, aw, cw, ls, tc=tc, rbu=rbu, co=co,
                mode=mode, interpret=interpret, compute_dtype=compute_dtype)
            dls = st[PU.ST_DLS0:PU.ST_DLS0 + 4] - cfg.ent_coef
            grads = _grads_pytree(params, ga, gc, dls)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), _losses(st, ent)

        def sgd_step_fused(carry, perm_mb):
            tensors, mu, nu, count = carry
            na = n_actor_layers
            aw = [(tensors[2 * i], tensors[2 * i + 1]) for i in range(na)]
            cw = [(tensors[2 * (na + i)], tensors[2 * (na + i) + 1])
                  for i in range(n_critic_layers)]
            ls = tensors[-1]
            ent = jnp.sum(ls[0] + 0.5 * (1.0 + 2.0 * PAT._HALF_LOG_2PI))
            (ga, gc), st = PU.ppo_update(
                planes, advret, perm_mb, aw, cw, ls, tc=tc, rbu=rbu, co=co,
                mode=mode, interpret=interpret, compute_dtype=compute_dtype)
            dls = (st[PU.ST_DLS0:PU.ST_DLS0 + 4]
                   - cfg.ent_coef).reshape(1, 4)
            grads = [m for wb in (*ga, *gc) for m in wb] + [dls]
            if axis_name is not None:
                grads = [jax.lax.pmean(g, axis_name) for g in grads]
            tensors2, mu2, nu2 = PU.fused_adam(
                grads, tensors, mu, nu, _fused_lr(count), count, ac=ac,
                mode=mode, interpret=interpret)
            return (tensors2, mu2, nu2, count + 1.0), _losses(st, ent)

        if fused_optimizer:
            tensors0, n_actor_layers, n_critic_layers = _kernel_tensors(
                runner.params)
            count0, mu0, nu0 = runner.opt_state
            carry0 = (tensors0, mu0, nu0, count0)
            step_fn = sgd_step_fused
        else:
            carry0 = (runner.params, runner.opt_state)
            step_fn = sgd_step

        carry, (losses, auxes) = run_epoch_scans(
            step_fn, carry0, kperm, cfg, n_rb, mb_rb)
        if fused_optimizer:
            tensors, mu, nu, count = carry
            params = _tensors_to_params(runner.params, tensors,
                                        n_actor_layers, n_critic_layers)
            opt_state = (count, mu, nu)
        else:
            params, opt_state = carry

        # --- metrics (keys match ppo.make_train_step) ----------------------
        metrics = trainer_metrics(stats, losses, auxes, cfg, local_envs,
                                  axis_name)

        runner2 = ppo_mod.RunnerState(
            params=params,
            opt_state=opt_state,
            env_state=final_state,
            last_obs=last_obs,
            key=key,
            update_idx=runner.update_idx + 1,
        )
        return runner2, metrics

    return train_step
