"""Clipped PPO with GAE, fused rollout+learn in one XLA program.

Rebuild of the reference trainer (SURVEY.md §2.2 #9: `[U]
pufferlib/pufferl.py` — CleanRL-descended PPO: rollout collection, GAE,
minibatched clipped update, checkpointing). The reference splits rollout (C
envs in worker processes) from learning (torch on GPU) across a process and
PCIe boundary (SURVEY.md §3.1); here both are one jitted function — obs never
leave HBM (BASELINE.json:5).

Conventions (matching the reference's CleanRL lineage):
  - done = terminated | truncated ends bootstrapping (auto-reset env).
  - advantages normalized over the full batch.
  - Gaussian policy, state-independent log_std; raw (unsquashed) log-prob.
  - optional `axis_name` pmeans gradients/metrics for multi-chip DP
    (SURVEY.md §2.5: psum over the ICI mesh replaces DDP/NCCL).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from drone_tpu import env as env_mod
from drone_tpu.types import EnvParams, EnvState, EnvStatics


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Static training hyperparameters (hashable; changing them recompiles)."""

    horizon: int = 128          # rollout length T per update
    num_envs: int = 4096        # lanes B (global, across all devices)
    epochs: int = 4
    num_minibatches: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_clip: float = 10.0
    vf_coef: float = 0.5
    ent_coef: float = 0.001
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    anneal_lr: bool = False
    total_updates: int = 200    # used by lr annealing
    # minibatch shuffling: "lanes" permutes env lanes per epoch and each
    # minibatch takes a lane group over the full horizon (measured 8.5x
    # faster on v5e than "flat" — a full T*B permutation forces an 8M-key
    # sort plus random-index gathers, ~2.2s of a 2.5s update at 64k envs);
    # "flat" is the CleanRL-exact per-sample shuffle.
    shuffle: str = "lanes"
    # recurrent PPO only: truncated-BPTT segment length. 0 = the full
    # horizon (gradients flow through the whole rollout, the previous
    # behavior); otherwise horizon % bptt_horizon == 0 and gradients stop
    # at segment boundaries (the reference's time-chunked BPTT knob,
    # SURVEY.md §2.2 #9) — bounding gradient depth and update memory
    # independently of the rollout length.
    bptt_horizon: int = 0
    # scan trainer only: split each minibatch's forward+backward into this
    # many sample chunks, accumulating gradients (lax.scan), then apply ONE
    # optimizer step — the mean-loss gradient is unchanged (equal chunks:
    # mean == mean of chunk means). Bounds update-phase activation memory
    # by 1/grad_accum: the overlapping-conv pixel policy materializes ~4.5k
    # floats/sample of conv residuals for autodiff, which OOMs 16 GB at
    # 64k envs x 128 steps / 4 minibatches — grad_accum=16 trains that
    # shape in <2 GB of activations. The megakernel trainers never
    # materialize activations (hand-written backward in VMEM) and ignore
    # this knob.
    grad_accum: int = 1


@flax.struct.dataclass
class RunnerState:
    params: Any
    opt_state: Any
    env_state: EnvState      # batched (B, ...)
    last_obs: jnp.ndarray    # (B, OBS_DIM)
    key: jnp.ndarray         # jax PRNG key
    update_idx: jnp.ndarray  # int32


@flax.struct.dataclass
class Transition:
    obs: jnp.ndarray
    action: jnp.ndarray
    logp: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    ep_return: jnp.ndarray
    ep_length: jnp.ndarray


_LOG_2PI = math.log(2.0 * math.pi)


def gaussian_logp(action, mean, log_std):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(-0.5 * z * z - log_std - 0.5 * _LOG_2PI, axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * (1.0 + _LOG_2PI), axis=-1)


def compute_gae(rewards, values, dones, last_value, gamma, lam):
    """Generalized advantage estimation via reverse lax.scan.

    rewards/values/dones: (T, B); last_value: (B,).
    Returns (advantages, returns), each (T, B).
    """
    nonterminal = 1.0 - dones.astype(jnp.float32)

    def body(carry, xs):
        next_adv, next_value = carry
        r, v, nt = xs
        delta = r + gamma * next_value * nt - v
        adv = delta + gamma * lam * nt * next_adv
        return (adv, v), adv

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, nonterminal),
        reverse=True,
    )
    return advantages, advantages + values


def make_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    env_params: EnvParams,
    statics: EnvStatics,
    cfg: PPOConfig,
    axis_name: str | None = None,
    envs_per_device: int | None = None,
    rollout: str = "scan",
    rollout_interpret: bool = False,
):
    """Build the fused rollout+learn step: RunnerState -> (RunnerState, metrics).

    With axis_name set (inside shard_map), each device rolls out its local
    env shard and gradients/metrics are pmean'd across the axis — data
    parallelism in the reference sense (SURVEY.md §2.4 DP row), minus the
    process/NCCL machinery.

    rollout selects the trainer implementation:
      - "scan":       vmap(env.step) under lax.scan + XLA update, noise from
                      the host PRNG key (the CleanRL-shaped baseline path).
      - "pallas":     delegates to ppo_pallas.make_pallas_train_step — the
                      trajectory-emitting rollout megakernel feeding the
                      fused fwd+bwd update megakernel, plane-major end to
                      end. Requires the MLP ActorCritic layout and
                      num_envs % 128 == 0.
      - "pallas_ref": the kernels' pure-jnp mirrors (same noise streams,
                      same matmul formulation, same accumulation order) —
                      bitwise train-step parity with "pallas" in interpret
                      mode on CPU; the fallback on backends without Mosaic.
    rollout_interpret runs the kernels through the Pallas interpreter
    (CPU-backend testing).
    """
    if rollout not in ("scan", "pallas", "pallas_ref"):
        raise ValueError(f"rollout must be 'scan', 'pallas' or 'pallas_ref',"
                         f" got {rollout!r}")
    if rollout in ("pallas", "pallas_ref"):
        from drone_tpu import ppo_pallas

        return ppo_pallas.make_pallas_train_step(
            optimizer, env_params, statics, cfg, axis_name=axis_name,
            envs_per_device=envs_per_device,
            mode="kernel" if rollout == "pallas" else "reference",
            interpret=rollout_interpret)
    local_envs = envs_per_device if envs_per_device is not None else cfg.num_envs
    batch_size = cfg.horizon * local_envs
    if cfg.shuffle not in ("lanes", "flat"):
        raise ValueError(f"shuffle must be 'lanes' or 'flat', got {cfg.shuffle!r}")
    if cfg.shuffle == "lanes":
        assert local_envs % cfg.num_minibatches == 0, (
            f"envs per device ({local_envs}) must divide into "
            f"{cfg.num_minibatches} minibatches (shuffle='lanes')"
        )
        mb_lanes = local_envs // cfg.num_minibatches
    assert batch_size % cfg.num_minibatches == 0, (
        f"horizon*envs ({batch_size}) must divide into "
        f"{cfg.num_minibatches} minibatches"
    )
    mb_size = batch_size // cfg.num_minibatches
    assert cfg.grad_accum >= 1 and mb_size % cfg.grad_accum == 0, (
        f"minibatch size ({mb_size}) must divide into grad_accum "
        f"({cfg.grad_accum}) equal sample chunks")

    def policy_sample(params, obs, key):
        mean, log_std, value = apply_fn(params, obs)
        noise = jax.random.normal(key, mean.shape, mean.dtype)
        action = mean + jnp.exp(log_std) * noise
        logp = gaussian_logp(action, mean, log_std)
        return action, logp, value

    def rollout_body(carry, key_t):
        env_state, obs, params = carry
        action, logp, value = policy_sample(params, obs, key_t)
        env_state2, out = jax.vmap(
            lambda s, a: env_mod.step(s, a, env_params, statics)
        )(env_state, action)
        t = Transition(
            obs=obs,
            action=action,
            logp=logp,
            value=value,
            reward=out.reward,
            done=out.terminated | out.truncated,
            ep_return=out.ep_return,
            ep_length=out.ep_length,
        )
        return (env_state2, out.obs, params), t

    def loss_fn(params, mb):
        mean, log_std, value = apply_fn(params, mb.obs)
        logp = gaussian_logp(mb.action, mean, log_std)
        ratio = jnp.exp(logp - mb.logp)
        # clipped policy loss
        pg1 = -mb.adv * ratio
        pg2 = -mb.adv * jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps)
        pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
        # clipped value loss (CleanRL style)
        v_clipped = mb.value + jnp.clip(value - mb.value, -cfg.vf_clip, cfg.vf_clip)
        v_loss = 0.5 * jnp.mean(
            jnp.maximum((value - mb.ret) ** 2, (v_clipped - mb.ret) ** 2)
        )
        ent = jnp.mean(gaussian_entropy(log_std))
        total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
        approx_kl = jnp.mean(mb.logp - logp)
        clipfrac = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_eps).astype(jnp.float32))
        return total, dict(
            pg_loss=pg_loss,
            v_loss=v_loss,
            entropy=ent,
            approx_kl=approx_kl,
            clipfrac=clipfrac,
        )

    @flax.struct.dataclass
    class MB:
        obs: jnp.ndarray
        action: jnp.ndarray
        logp: jnp.ndarray
        value: jnp.ndarray
        adv: jnp.ndarray
        ret: jnp.ndarray

    def train_step(runner: RunnerState):
        key, krollout, kperm = jax.random.split(runner.key, 3)

        # --- rollout (hot loop #1 of SURVEY.md §3.1, now on-device) --------
        step_keys = jax.random.split(krollout, cfg.horizon)
        (env_state, last_obs, _), traj = jax.lax.scan(
            rollout_body,
            (runner.env_state, runner.last_obs, runner.params), step_keys
        )
        ep_ret_sum = jnp.sum(traj.ep_return)
        ep_len_sum = jnp.sum(traj.ep_length)

        _, _, last_value = apply_fn(runner.params, last_obs)
        adv, ret = compute_gae(
            traj.reward, traj.value, traj.done, last_value,
            cfg.gamma, cfg.gae_lambda,
        )
        if axis_name is not None:
            g_mean = jax.lax.pmean(jnp.mean(adv), axis_name)
            g_var = jax.lax.pmean(jnp.mean((adv - g_mean) ** 2), axis_name)
        else:
            g_mean = jnp.mean(adv)
            g_var = jnp.var(adv)
        adv = (adv - g_mean) / jnp.sqrt(g_var + 1e-8)

        full = MB(
            obs=traj.obs,
            action=traj.action,
            logp=traj.logp,
            value=traj.value,
            adv=adv,
            ret=ret,
        )

        def sgd_step(params, opt_state, mb):
            if cfg.grad_accum > 1:
                # sample-chunked forward+backward: scan over equal chunks,
                # average grads/metrics, ONE optimizer step — identical
                # mean-loss gradient, 1/grad_accum the activation memory
                chunks = jax.tree_util.tree_map(
                    lambda x: x.reshape(cfg.grad_accum,
                                        x.shape[0] // cfg.grad_accum,
                                        *x.shape[1:]), mb)

                def accum(carry, chunk):
                    (loss, aux), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params, chunk)
                    g_acc, l_acc, a_acc = carry
                    return (jax.tree_util.tree_map(jnp.add, g_acc, grads),
                            l_acc + loss,
                            jax.tree_util.tree_map(jnp.add, a_acc, aux)), None

                zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
                # derive the aux accumulator from loss_fn's own output
                # structure (eval_shape = no FLOPs) so a metric added to
                # loss_fn can never desync the scan carry tree
                _, aux_shape = jax.eval_shape(
                    lambda c: loss_fn(params, c),
                    jax.tree_util.tree_map(lambda x: x[0], chunks))
                zeros = (zero_g, jnp.float32(0.0),
                         jax.tree_util.tree_map(
                             lambda s: jnp.zeros(s.shape, s.dtype),
                             aux_shape))
                (grads, loss, aux), _ = jax.lax.scan(accum, zeros, chunks)
                inv = 1.0 / cfg.grad_accum
                grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
                loss = loss * inv
                aux = jax.tree_util.tree_map(lambda a: a * inv, aux)
            else:
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, (loss, aux)

        # --- epochs x minibatches (hot loop #2, MXU matmuls) ---------------
        if cfg.shuffle == "lanes":
            # permute the env axis; each minibatch is a lane group over the
            # full horizon — no big sort, no random-index gather
            def epoch_body(carry, ekey):
                params, opt_state = carry
                perm = jax.random.permutation(ekey, local_envs)
                shuf = jax.tree_util.tree_map(lambda x: x[:, perm], full)

                def mb_body(carry, mb_idx):
                    params, opt_state = carry
                    mb = jax.tree_util.tree_map(
                        lambda x: jax.lax.dynamic_slice_in_dim(
                            x, mb_idx * mb_lanes, mb_lanes, axis=1
                        ).reshape(mb_size, *x.shape[2:]),
                        shuf,
                    )
                    params, opt_state, out = sgd_step(params, opt_state, mb)
                    return (params, opt_state), out

                carry, losses = jax.lax.scan(
                    mb_body, (params, opt_state), jnp.arange(cfg.num_minibatches)
                )
                return carry, losses
        else:
            flat = jax.tree_util.tree_map(
                lambda x: x.reshape(batch_size, *x.shape[2:]), full
            )

            def epoch_body(carry, ekey):
                params, opt_state = carry
                perm = jax.random.permutation(ekey, batch_size)

                def mb_body(carry, mb_idx):
                    params, opt_state = carry
                    take = jax.lax.dynamic_slice_in_dim(
                        perm, mb_idx * mb_size, mb_size
                    )
                    mb = jax.tree_util.tree_map(lambda x: x[take], flat)
                    params, opt_state, out = sgd_step(params, opt_state, mb)
                    return (params, opt_state), out

                carry, losses = jax.lax.scan(
                    mb_body, (params, opt_state), jnp.arange(cfg.num_minibatches)
                )
                return carry, losses

        epoch_keys = jax.random.split(kperm, cfg.epochs)
        (params, opt_state), (losses, auxes) = jax.lax.scan(
            epoch_body, (runner.params, runner.opt_state), epoch_keys
        )

        # --- metrics --------------------------------------------------------
        # count-like quantities are psum'd to GLOBAL totals before the means
        # (pmean'ing a count would report a per-device average, n_dev-fold
        # understated; a pmean of per-device means would also mis-weight
        # devices with unequal episode counts)
        n_done = jnp.sum(traj.done)
        if axis_name is not None:
            n_done = jax.lax.psum(n_done, axis_name)
            ep_ret_sum = jax.lax.psum(ep_ret_sum, axis_name)
            ep_len_sum = jax.lax.psum(ep_len_sum, axis_name)
        metrics = dict(
            loss=jnp.mean(losses),
            reward_mean=jnp.mean(traj.reward),
            episodes=n_done.astype(jnp.float32),
            ep_return_mean=ep_ret_sum / jnp.maximum(n_done, 1),
            ep_length_mean=ep_len_sum / jnp.maximum(n_done, 1),
            **{k: jnp.mean(v) for k, v in auxes.items()},
        )
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        runner2 = RunnerState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            last_obs=last_obs,
            key=key,
            update_idx=runner.update_idx + 1,
        )
        return runner2, metrics

    return train_step


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    if cfg.anneal_lr:
        lr = optax.linear_schedule(
            cfg.lr, 0.0, cfg.total_updates * cfg.epochs * cfg.num_minibatches
        )
    else:
        lr = cfg.lr
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(lr, eps=1e-5),
    )


def init_runner(
    model, env, cfg: PPOConfig, seed: int = 0, envs: int | None = None,
    optimizer: optax.GradientTransformation | None = None,
) -> RunnerState:
    """Fresh RunnerState: batched env, initialized params and optimizer."""
    n = envs if envs is not None else cfg.num_envs
    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    env_state = env.init_batch(seed, n)
    obs = env.observe_batch(env_state)
    params = model.init(kinit, obs[:1])
    opt = optimizer if optimizer is not None else make_optimizer(cfg)
    opt_state = opt.init(params)
    return RunnerState(
        params=params,
        opt_state=opt_state,
        env_state=env_state,
        last_obs=obs,
        key=key,
        update_idx=jnp.int32(0),
    )
