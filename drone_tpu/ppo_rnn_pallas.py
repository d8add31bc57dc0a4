"""Recurrent megakernel PPO: LSTM rollout AND truncated-BPTT update on Pallas.

The recurrent analogue of drone_tpu.ppo_pallas — the second policy family
trained fully in kernels. The scan-path recurrent trainer (drone_tpu.ppo_rnn) is
the baseline; ppo_rnn's rollout="pallas" fuses data collection only; this
module fuses the whole step:

  rollout  — ops/pallas_acting_lstm.traj_lstm_rollout_pallas streams the
             (obs, action, logp, value, reward, done) planes AND the
             per-segment (c, h) carry anchors to HBM (encoder+LSTM+heads+
             env fused in VMEM, counter-RNG exploration noise).
  GAE      — XLA reverse scan directly on the time-major planes (exactly
             ppo_pallas's GAE — the layout is shared).
  update   — ops/pallas_update_lstm.py re-runs the policy over each BPTT
             segment from its stored anchor and walks the gates backward
             through time, entirely in VMEM (checkpointed re-forward, no
             activation traffic to HBM); recurrent minibatches split the
             env axis at row-block granularity via a scalar-prefetched
             permutation, sequences stay whole.
  optimizer— the shared fused clip+adam kernel (ops/pallas_update.py) over
             the LSTM kernel-tensor list, or optax on the param pytree.

Training data and carry anchors never change layout between the rollout
and update kernels. mode="reference" swaps every kernel for its pure-jnp
mirror — the full train step matches the kernel path bitwise in interpret
mode on CPU (tests/test_pallas_update_lstm.py).

Semantic deltas vs the scan recurrent trainer: the same two as the MLP
megakernel trainer (counter-stream exploration noise; row-block-granular
minibatch shuffling — see ppo_pallas.py's module docstring), plus none:
the BPTT truncation semantics are segmented_forward's exactly.

Reference: SURVEY.md §2.2 #9-#10 (`[U] pufferlib/pufferl.py` LSTM mode of
the minibatch PPO trainer; `[U] pufferlib/models.py` LSTMWrapper);
BASELINE.json:10.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from drone_tpu import env as env_mod
from drone_tpu import ppo as ppo_mod
from drone_tpu import ppo_pallas as PPC  # shared trainer scaffolding
from drone_tpu.ops import pallas_acting_lstm as PAL
from drone_tpu.ops import pallas_acting_traj as PAT
from drone_tpu.ops import pallas_update as PU
from drone_tpu.ops import pallas_update_lstm as PUL
from drone_tpu.ops.pallas_acting_traj import _dot32
from drone_tpu.ppo_rnn import RecurrentRunnerState
from drone_tpu.types import EnvParams, EnvStatics

_GATES = ("i", "f", "g", "o")


def lstm_kernel_tensors(params):
    """params -> (flat kernel-layout tensor list [enc W/b..., wi*4, wh*4,
    bh*4, head W/b, vhead W/b, ls (1,4)], n_enc). The recurrent
    fused-optimizer carry format: every parameter, gradient, and
    adam-moment tensor shares these shapes (biases as (out, 1) columns)."""
    enc, wi, wh, bh, head, vhead, ls = PAL.lstm_all_weights(params)
    t = []
    for w, b in enc:
        t += [w, b.reshape(-1, 1)]
    t += list(wi) + list(wh) + [b.reshape(-1, 1) for b in bh]
    t += [head[0], head[1].reshape(-1, 1), vhead[0], vhead[1].reshape(-1, 1)]
    t.append(ls)
    return t, len(enc)


def lstm_grads_pytree(params, grads, dls, n_enc):
    """Kernel-layout gradient list (ppo_lstm_update order, no ls) + log_std
    grad -> a pytree matching LSTMActorCritic params (W^T back to flax
    (in, out); (out, 1) biases to (out,); flax's input-gate denses have no
    bias, matching the kernel's gradient surface). For the pixel-recurrent
    CNNLSTMActorCritic, the 3 encoder pairs map back to conv0/conv1/trunk
    (the same inverse layout transforms as ppo_cnn_pallas.cnn_grads_pytree)."""
    p = params["params"] if "params" in params else params
    o = 2 * n_enc
    out = {}
    if "conv0" in p:
        from drone_tpu.ops.pallas_acting_cnn import N_CHAN, infer_cnn_geom

        geom = infer_cnn_geom(p)
        c0 = grads[0].shape[0]
        c1 = grads[2].shape[0]
        out["conv0"] = {
            "kernel": grads[0].T.reshape(N_CHAN, geom.p0, geom.p0,
                                         c0).transpose(1, 2, 0, 3),
            "bias": grads[1][:, 0]}
        out["conv1"] = {"kernel": grads[2].T.reshape(geom.p1, geom.p1,
                                                     c0, c1),
                        "bias": grads[3][:, 0]}
        out["trunk"] = {"kernel": grads[4].T, "bias": grads[5][:, 0]}
    else:
        for i in range(n_enc):
            out[f"enc_h{i}"] = {"kernel": grads[2 * i].T,
                                "bias": grads[2 * i + 1][:, 0]}
    lstm = {}
    for gi, g in enumerate(_GATES):
        lstm[f"i{g}"] = {"kernel": grads[o + gi].T}
        lstm[f"h{g}"] = {"kernel": grads[o + 4 + gi].T,
                         "bias": grads[o + 8 + gi][:, 0]}
    out["lstm"] = lstm
    out["actor_mean"] = {"kernel": grads[o + 12].T,
                         "bias": grads[o + 13][:, 0]}
    out["critic_value"] = {"kernel": grads[o + 14].T,
                           "bias": grads[o + 15][:, 0]}
    out["log_std"] = dls
    return {"params": out} if "params" in params else out


def lstm_tensors_to_params(template, tensors, n_enc):
    """Flat kernel tensor list (incl. trailing ls) -> LSTMActorCritic
    param pytree shaped like `template`."""
    return lstm_grads_pytree(template, tensors[:-1],
                             tensors[-1].reshape(4), n_enc)


def init_fused_opt_state(params):
    """Fused-optimizer state for the recurrent trainer: (count, mu, nu)
    with mu/nu in LSTM kernel tensor layout (a plain pytree — orbax
    checkpointing works unchanged)."""
    tensors, _ = lstm_kernel_tensors(params)
    return (jnp.float32(0.0),
            [jnp.zeros_like(t) for t in tensors],
            [jnp.zeros_like(t) for t in tensors])


def optax_to_fused_opt_state(opt_state):
    """optax chain(clip_by_global_norm, adam) state -> recurrent fused
    (count, mu, nu) — ppo_pallas's shared conversion core over the LSTM
    kernel-tensor layout."""
    return PPC.adam_state_to_fused(opt_state,
                                   lambda p: lstm_kernel_tensors(p)[0])


def fused_to_optax_opt_state(optimizer, params, fused_state):
    """Recurrent fused (count, mu, nu) -> the optax state
    `optimizer.init(params)` would carry after the same number of steps."""
    _, n_enc = lstm_kernel_tensors(params)
    return PPC.fused_to_adam_state(
        optimizer, params, fused_state,
        lambda t: lstm_tensors_to_params(params, t, n_enc))


def _lstm_value(obs, carry, params, dtype=jnp.float32):
    """Critic value at `obs` given the flax carry (c, h), in the kernels'
    plane-space matmul formulation (built on the shared
    encode_features/lstm_gates blocks — identical in kernel and reference
    trainer modes, for both the dense and CNN encoders). Returns (N,)
    values."""
    enc, wi, wh, bh, head, vhead, _ = PAL.lstm_all_weights(params)
    encoder, geom = PAL.lstm_encoder_kind(params)
    if encoder == "cnn":
        from drone_tpu.pixels import patch_grid

        gx, gy = patch_grid(geom.res, geom.p0)
    else:
        gx = gy = None
    dot = lambda a, b: _dot32(a, b, dtype)
    enc_c = [(w, b[:, None]) for w, b in enc]
    bh_c = [b[:, None] for b in bh]
    x = PAL.encode_features(obs.T, enc_c, dtype, encoder, geom, gx, gy)
    c = jnp.asarray(carry[0], jnp.float32).T
    h = jnp.asarray(carry[1], jnp.float32).T
    *_, h2 = PAL.lstm_gates(x, h, c, wi, wh, bh_c, dot)
    return (dot(vhead[0], h2) + vhead[1][:, None])[0]


def make_pallas_rnn_train_step(
    optimizer: optax.GradientTransformation,
    env_params: EnvParams,
    statics: EnvStatics,
    cfg: ppo_mod.PPOConfig,
    axis_name: str | None = None,
    envs_per_device: int | None = None,
    mode: str = "kernel",
    interpret: bool = False,
    compute_dtype: str = "float32",
    fused_optimizer: bool = False,
    sc: int | None = None,
):
    """Build the recurrent megakernel train step:
    RecurrentRunnerState -> (RecurrentRunnerState, metrics).

    mode: "kernel" (Mosaic kernels; interpret=True routes them through the
    Pallas interpreter for CPU testing) or "reference" (pure-jnp mirrors,
    bitwise-equal math). compute_dtype applies to the UPDATE kernel's
    matmuls (the LSTM rollout kernel is f32 — measured bf16-neutral, see
    ops/pallas_acting_lstm.py). sc: BPTT checkpoint chunk override.
    Metrics keys match ppo_rnn.make_recurrent_train_step.
    """
    if mode not in ("kernel", "reference"):
        raise ValueError(f"mode must be 'kernel' or 'reference', got {mode!r}")
    local_envs = envs_per_device if envs_per_device is not None else cfg.num_envs
    bptt = cfg.bptt_horizon if cfg.bptt_horizon else cfg.horizon
    assert cfg.horizon % bptt == 0, (cfg.horizon, bptt)
    rows, mb_rows, rbu, n_rb, mb_rb, co = PPC.plan_minibatch_geometry(
        cfg, local_envs, mode, interpret)
    ac = PU.AdamConsts(clip_norm=cfg.max_grad_norm)
    _fused_lr = PPC.make_fused_lr(cfg)

    def rollout(runner):
        if mode == "kernel":
            return PAL.traj_lstm_rollout_pallas(
                runner.env_state, runner.params, runner.carry, env_params,
                statics, cfg.horizon, bptt=bptt, interpret=interpret,
                seg_layout="planes")
        final, out_carry, traj, snap, stats = PAL.traj_lstm_rollout_reference(
            runner.env_state, runner.params, runner.carry, env_params,
            statics, cfg.horizon, bptt=bptt, seg_layout="planes")
        return final, out_carry, PAT.pack_traj_planes(traj, rows), snap, stats

    def train_step(runner: RecurrentRunnerState):
        key, kperm = jax.random.split(runner.key)

        # --- rollout: planes + carry anchors straight to HBM ---------------
        final_state, last_carry, planes, snap, stats = rollout(runner)
        last_obs = jax.vmap(env_mod.observe)(final_state)

        # --- GAE on the planes (shared jnp: identical in both modes) -------
        last_value = _lstm_value(last_obs, last_carry, runner.params).reshape(
            rows, 128)
        advret = PPC.normalized_advret(planes, last_value, cfg, axis_name)

        # --- epochs x minibatches through the BPTT update kernel -----------
        _losses = PPC.make_losses(cfg, co)

        # the encoder kind is static at trace time (param-dict structure);
        # "cnn" routes the update kernel's encoder fwd/bwd through the
        # shared patchify-conv blocks (pixel-recurrent family)
        encoder, geom = PAL.lstm_encoder_kind(runner.params)

        def _minibatch_grads(tensors, perm_mb):
            ls = tensors[-1]
            ent = jnp.sum(ls[0] + 0.5 * (1.0 + 2.0 * PAT._HALF_LOG_2PI))
            grads, st = PUL.ppo_lstm_update(
                planes, advret, snap, perm_mb, tensors[:-1], ls, bptt=bptt,
                co=co, rbu=rbu, sc=sc, mode=mode, interpret=interpret,
                compute_dtype=compute_dtype, encoder=encoder, geom=geom)
            dls = (st[PU.ST_DLS0:PU.ST_DLS0 + 4]
                   - cfg.ent_coef).reshape(1, 4)
            return grads, dls, st, ent

        def sgd_step(carry, perm_mb):
            params, opt_state = carry
            tensors, n_enc = lstm_kernel_tensors(params)
            grads, dls, st, ent = _minibatch_grads(tensors, perm_mb)
            gtree = lstm_grads_pytree(params, grads, dls.reshape(4), n_enc)
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
            tensors0, n_enc0 = lstm_kernel_tensors(runner.params)
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
            params = lstm_tensors_to_params(runner.params, tensors, n_enc0)
            opt_state = (count, mu, nu)
        else:
            params, opt_state = carry

        # --- metrics (keys match ppo_rnn.make_recurrent_train_step) --------
        metrics = PPC.trainer_metrics(stats, losses, auxes, cfg, local_envs,
                                      axis_name)

        runner2 = RecurrentRunnerState(
            params=params,
            opt_state=opt_state,
            env_state=final_state,
            last_obs=last_obs,
            carry=last_carry,
            key=key,
            update_idx=runner.update_idx + 1,
        )
        return runner2, metrics

    return train_step
