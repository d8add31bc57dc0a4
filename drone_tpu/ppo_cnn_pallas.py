"""CNN megakernel PPO: patch-conv rollout AND update phases on Pallas.

The third policy family trained fully in kernels (after the MLP —
drone_tpu.ppo_pallas — and the LSTM — drone_tpu.ppo_rnn_pallas): the
PatchCNNActorCritic pixel policy (models/cnn.py) with

  rollout  — ops/pallas_acting_cnn.traj_cnn_rollout_pallas: the on-device
             pixel render + patch convs + heads + env fused in VMEM,
             streaming the SAME 21-float/sample trajectory planes as the
             MLP trainer (pixels are rematerialized in-kernel from the
             observation — the 2304-float image never touches HBM).
  GAE      — XLA reverse scan on the time-major planes (shared
             ppo_pallas.normalized_advret — the layout is identical).
  update   — ops/pallas_update_cnn.py re-renders each minibatch tile's
             patches from the stored obs planes and runs the conv
             forward+backward in VMEM with hand-written backprop.
  optimizer— the shared fused clip+adam kernel (ops/pallas_update.py) over
             the CNN kernel-tensor list, or optax on the param pytree.

mode="reference" swaps every kernel for its pure-jnp mirror — the full
train step matches the kernel path bitwise in interpret mode on CPU
(tests/test_pallas_cnn.py). Semantic deltas vs the scan trainer are the
same two as the MLP megakernel trainer (counter-stream exploration noise;
row-block-granular minibatch shuffling — ppo_pallas.py's docstring).

Reference: SURVEY.md §2.2 #9-#10 (`[U] pufferlib/models.py` CNN policy
variants under the minibatch PPO trainer); BASELINE.json:10.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from drone_tpu import env as env_mod
from drone_tpu import ppo as ppo_mod
from drone_tpu import ppo_pallas as PPC  # shared trainer scaffolding
from drone_tpu.ops import pallas_acting_cnn as PAC
from drone_tpu.ops import pallas_acting_traj as PAT
from drone_tpu.ops import pallas_update as PU
from drone_tpu.ops import pallas_update_cnn as PUC
from drone_tpu.types import EnvParams, EnvStatics


def cnn_geom(model) -> PAC.CnnGeom:
    """PatchCNNActorCritic -> its static patch geometry."""
    return PAC.CnnGeom(model.res, model.patch0, model.patch1)


def cnn_kernel_tensors(params, geom: PAC.CnnGeom):
    """params -> flat kernel-layout tensor list [W0, b0, W1, b1, Wt, bt,
    head W/b, vhead W/b, ls (1, 4)]. The CNN fused-optimizer carry format:
    every parameter, gradient, and adam-moment tensor shares these shapes."""
    W0, b0, W1, b1, Wt, bt, head, vhead, ls = PAC.cnn_all_weights(params,
                                                                  geom)
    return [W0, b0, W1, b1, Wt, bt, head[0], head[1], vhead[0], vhead[1], ls]


def cnn_grads_pytree(params, grads, dls, geom: PAC.CnnGeom):
    """Kernel-layout gradient list (ppo_cnn_update order, no ls) + log_std
    grad -> a pytree matching PatchCNNActorCritic params (conv kernels back
    to flax (kh, kw, cin, cout); (out, 1) biases to (out,))."""
    p0, p1 = geom.p0, geom.p1
    c0 = grads[0].shape[0]
    c1 = grads[2].shape[0]
    out = {
        "conv0": {"kernel": grads[0].T.reshape(PAC.N_CHAN, p0, p0,
                                               c0).transpose(1, 2, 0, 3),
                  "bias": grads[1][:, 0]},
        "conv1": {"kernel": grads[2].T.reshape(p1, p1, c0, c1),
                  "bias": grads[3][:, 0]},
        "trunk": {"kernel": grads[4].T, "bias": grads[5][:, 0]},
        "actor_mean": {"kernel": grads[6].T, "bias": grads[7][:, 0]},
        "critic_value": {"kernel": grads[8].T, "bias": grads[9][:, 0]},
        "log_std": dls,
    }
    return {"params": out} if "params" in params else out


def cnn_tensors_to_params(template, tensors, geom: PAC.CnnGeom):
    """Flat kernel tensor list (incl. trailing ls) -> PatchCNNActorCritic
    param pytree shaped like `template`."""
    return cnn_grads_pytree(template, tensors[:-1], tensors[-1].reshape(4),
                            geom)


def init_fused_opt_state(params, geom: PAC.CnnGeom | None = None):
    """Fused-optimizer state for the CNN trainer: (count, mu, nu) with
    mu/nu in CNN kernel tensor layout (a plain pytree — orbax checkpointing
    works unchanged)."""
    geom = geom if geom is not None else PAC.CnnGeom(24, 4, 2)
    tensors = cnn_kernel_tensors(params, geom)
    return (jnp.float32(0.0),
            [jnp.zeros_like(t) for t in tensors],
            [jnp.zeros_like(t) for t in tensors])


def optax_to_fused_opt_state(opt_state, geom: PAC.CnnGeom | None = None):
    """optax chain(clip_by_global_norm, adam) state -> CNN fused
    (count, mu, nu) — ppo_pallas's shared conversion core over the CNN
    kernel-tensor layout."""
    geom = geom if geom is not None else PAC.CnnGeom(24, 4, 2)
    return PPC.adam_state_to_fused(opt_state,
                                   lambda p: cnn_kernel_tensors(p, geom))


def fused_to_optax_opt_state(optimizer, params, fused_state,
                             geom: PAC.CnnGeom | None = None):
    """CNN fused (count, mu, nu) -> the optax state `optimizer.init(params)`
    would carry after the same number of steps."""
    geom = geom if geom is not None else PAC.CnnGeom(24, 4, 2)
    return PPC.fused_to_adam_state(
        optimizer, params, fused_state,
        lambda t: cnn_tensors_to_params(params, t, geom))


def make_pallas_cnn_train_step(
    optimizer: optax.GradientTransformation,
    env_params: EnvParams,
    statics: EnvStatics,
    cfg: ppo_mod.PPOConfig,
    geom: PAC.CnnGeom | None = None,
    axis_name: str | None = None,
    envs_per_device: int | None = None,
    mode: str = "kernel",
    interpret: bool = False,
    update_tc: int = 8,
    compute_dtype: str = "float32",
    fused_optimizer: bool = False,
):
    """Build the CNN megakernel train step: RunnerState -> (RunnerState,
    metrics).

    mode: "kernel" (Mosaic kernels; interpret=True routes them through the
    Pallas interpreter for CPU testing) or "reference" (pure-jnp mirrors,
    bitwise-equal math). Metrics keys match drone_tpu.ppo.make_train_step.
    update_tc: target samples-per-update-tile in row units (the CNN fwd+bwd
    working set scales with tc*rbu*128 — the default keeps compiled tiles
    at 1024 samples).
    """
    if mode not in ("kernel", "reference"):
        raise ValueError(f"mode must be 'kernel' or 'reference', got {mode!r}")
    geom = geom if geom is not None else PAC.CnnGeom(24, 4, 2)
    from drone_tpu.pixels import patch_grid

    gx, gy = patch_grid(geom.res, geom.p0)
    local_envs = envs_per_device if envs_per_device is not None else cfg.num_envs
    rows, mb_rows, rbu, n_rb, mb_rb, co = PPC.plan_minibatch_geometry(
        cfg, local_envs, mode, interpret)
    tc = PU.pick_update_chunk(cfg.horizon, cap=max(1, update_tc // rbu))
    ac = PU.AdamConsts(clip_norm=cfg.max_grad_norm)
    _fused_lr = PPC.make_fused_lr(cfg)

    def rollout(runner):
        if mode == "kernel":
            return PAC.traj_cnn_rollout_pallas(
                runner.env_state, runner.params, env_params, statics,
                cfg.horizon, geom=geom, interpret=interpret,
                compute_dtype=compute_dtype)
        final, traj, stats = PAC.traj_cnn_rollout_reference(
            runner.env_state, runner.params, env_params, statics,
            cfg.horizon, geom=geom, compute_dtype=compute_dtype)
        return final, PAT.pack_traj_planes(traj, rows), stats

    def train_step(runner: ppo_mod.RunnerState):
        key, kperm = jax.random.split(runner.key)

        # --- rollout: trajectory planes straight to HBM --------------------
        final_state, planes, stats = rollout(runner)
        last_obs = jax.vmap(env_mod.observe)(final_state)

        # --- GAE on the planes (shared jnp: identical in both modes) -------
        cdt = jnp.dtype(compute_dtype).type
        w_now = PAC.cnn_all_weights(runner.params, geom)
        _, lv = PAC.cnn_forward(last_obs.T, w_now, gx, gy, geom, cdt)
        last_value = lv[0].reshape(rows, 128)
        advret = PPC.normalized_advret(planes, last_value, cfg, axis_name)

        # --- epochs x minibatches through the CNN update megakernel --------
        _losses = PPC.make_losses(cfg, co)

        def _minibatch_grads(tensors, perm_mb):
            ls = tensors[-1]
            ent = jnp.sum(ls[0] + 0.5 * (1.0 + 2.0 * PAT._HALF_LOG_2PI))
            grads, st = PUC.ppo_cnn_update(
                planes, advret, perm_mb, tensors[:-1], ls, gx, gy, tc=tc,
                geom=geom, co=co, rbu=rbu, mode=mode, interpret=interpret,
                compute_dtype=compute_dtype)
            dls = (st[PU.ST_DLS0:PU.ST_DLS0 + 4]
                   - cfg.ent_coef).reshape(1, 4)
            return grads, dls, st, ent

        def sgd_step(carry, perm_mb):
            params, opt_state = carry
            tensors = cnn_kernel_tensors(params, geom)
            grads, dls, st, ent = _minibatch_grads(tensors, perm_mb)
            gtree = cnn_grads_pytree(params, grads, dls.reshape(4), geom)
            if axis_name is not None:
                gtree = jax.lax.pmean(gtree, axis_name)
            updates, opt_state = optimizer.update(gtree, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), _losses(st, ent)

        def sgd_step_fused(carry, perm_mb):
            tensors, mu, nu, count = carry
            grads, dls, st, ent = _minibatch_grads(tensors, perm_mb)
            grads = grads + [dls]
            if axis_name is not None:
                grads = [jax.lax.pmean(g, axis_name) for g in grads]
            tensors2, mu2, nu2 = PU.fused_adam(
                grads, tensors, mu, nu, _fused_lr(count), count, ac=ac,
                mode=mode, interpret=interpret)
            return (tensors2, mu2, nu2, count + 1.0), _losses(st, ent)

        if fused_optimizer:
            tensors0 = cnn_kernel_tensors(runner.params, geom)
            count0, mu0, nu0 = runner.opt_state
            carry0 = (tensors0, mu0, nu0, count0)
            step_fn = sgd_step_fused
        else:
            carry0 = (runner.params, runner.opt_state)
            step_fn = sgd_step

        carry, (losses, auxes) = PPC.run_epoch_scans(
            step_fn, carry0, kperm, cfg, n_rb, mb_rb)
        if fused_optimizer:
            tensors, mu, nu, count = carry
            params = cnn_tensors_to_params(runner.params, tensors, geom)
            opt_state = (count, mu, nu)
        else:
            params, opt_state = carry

        # --- metrics (keys match ppo.make_train_step) ----------------------
        metrics = PPC.trainer_metrics(stats, losses, auxes, cfg, local_envs,
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
