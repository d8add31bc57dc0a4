"""Recurrent PPO: LSTM policy + truncated BPTT, fused rollout+learn.

Rebuild of the reference trainer's recurrent path (SURVEY.md §2.2 #9-#10:
`[U] pufferlib/pufferl.py` optional LSTM with truncated BPTT over rollout
segments; `[U] pufferlib/models.py` LSTMWrapper). TPU-native form:

  - The recurrent state (h, c) is an explicit pytree carried through the
    rollout `lax.scan` and zeroed per-lane on auto-reset — the reference's
    `done`-masked hidden state, branch-free.
  - Truncated BPTT segment length is `cfg.bptt_horizon` (default: the full
    rollout horizon T): the rollout records the recurrent state at each
    segment start, and the update re-runs the LSTM over the stored
    trajectory from those anchors with segments FOLDED INTO THE BATCH axis
    (one scan of length bptt over S*L sequences — `segmented_forward`), so
    gradients flow through time within a segment and stop at its boundary —
    exactly the reference's time-chunked BPTT knob, with gradient depth and
    update memory bounded independently of T (SURVEY.md §2.2 #9; §5
    "long-context" note: the scan horizon is this framework's sequence
    axis).
  - Minibatches split the ENV axis (sequences stay whole), matching the
    CleanRL/PuffeRL recurrent convention.

The non-recurrent trainer lives in drone_tpu.ppo; shapes/conventions match
so drone_tpu.parallel shards either via the same specs.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from drone_tpu import env as env_mod
from drone_tpu import ppo as ppo_mod
from drone_tpu.types import EnvParams, EnvStatics


@flax.struct.dataclass
class RecurrentRunnerState:
    params: Any
    opt_state: Any
    env_state: Any           # batched (B, ...)
    last_obs: jnp.ndarray    # (B, OBS_DIM)
    carry: Any               # flax LSTMCell carry (c, h), each (B, hidden)
    key: jnp.ndarray
    update_idx: jnp.ndarray


def _mask_carry(carry, done):
    """Zero the recurrent state of lanes whose episode just ended."""
    keep = (1.0 - done.astype(jnp.float32))[:, None]
    return jax.tree_util.tree_map(lambda c: c * keep, carry)


def segmented_forward(apply_fn, params, obs, done, carry0, bptt):
    """Truncated-BPTT re-run of the recurrent policy over stored data.

    obs: (T, L, OBS_DIM); done: (T, L); carry0: pytree of (S, L, hidden)
    recurrent states recorded at each segment start (S = T // bptt).
    Returns (mean, log_std, value) shaped (T, L, ...).

    Segments are folded into the batch axis — ONE scan of length bptt over
    S*L sequences — so gradient depth is bptt regardless of T, and
    gradients STOP at segment boundaries (each segment starts from stored
    carry data, not from a param-dependent value). With bptt == T this is
    exactly the full-horizon BPTT of the previous implementation.
    """
    T, L = obs.shape[0], obs.shape[1]
    S = T // bptt

    def fold(x):
        x = x.reshape(S, bptt, *x.shape[1:])
        x = jnp.moveaxis(x, 0, 1)                     # (bptt, S, L, ...)
        return x.reshape(bptt, S * L, *x.shape[3:])

    def unfold(x):
        x = x.reshape(bptt, S, L, *x.shape[2:])
        x = jnp.moveaxis(x, 0, 1)                     # (S, bptt, L, ...)
        return x.reshape(T, L, *x.shape[3:])

    c0 = jax.tree_util.tree_map(
        lambda c: c.reshape(S * L, *c.shape[2:]), carry0)

    # remat: recompute the gate/encoder activations in the backward pass
    # instead of saving them. Without this the scan stores ~6 residual
    # planes of (bptt, S*L, hidden) f32 per step — at 64k envs / 4
    # minibatches that is >6 GB of HLO temps and the update OOMs a 16 GB
    # v5e chip (measured: 16.85G requested). With remat only the carried
    # (c, h) sequence is stored (~2 GB at that size) and the update pays
    # one extra forward — the standard TPU HBM-for-FLOPs trade.
    @jax.checkpoint
    def fwd(lstm, xs):
        obs_t, done_t = xs
        mean, log_std, value, lstm2 = apply_fn(params, obs_t, lstm)
        lstm3 = _mask_carry(lstm2, done_t)
        return lstm3, (mean, log_std, value)

    _, (mean, log_std, value) = jax.lax.scan(
        fwd, c0, (fold(obs), fold(done)))
    return unfold(mean), unfold(log_std), unfold(value)


def make_recurrent_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    env_params: EnvParams,
    statics: EnvStatics,
    cfg: ppo_mod.PPOConfig,
    axis_name: str | None = None,
    envs_per_device: int | None = None,
    rollout: str = "scan",
    rollout_interpret: bool = False,
):
    """Build the fused recurrent train step.

    apply_fn(params, obs, carry) -> (mean, log_std, value, carry')
    Returns train_step(RecurrentRunnerState) -> (RecurrentRunnerState, metrics).

    rollout selects the data-collection engine:
      - "scan":       policy-in-loop lax.scan (the baseline path; noise from
                      the host PRNG key).
      - "pallas":     ops/pallas_acting_lstm.traj_lstm_rollout_pallas — the
                      fused LSTM+env megakernel streams the trajectory
                      planes AND the per-segment BPTT carry anchors to HBM;
                      the update phase is unchanged (segmented_forward
                      truncated BPTT through flax). Exploration noise comes
                      from the env's counter streams.
      - "pallas_ref": the kernel's jnp mirror (bitwise contract with
                      "pallas" in interpret mode on CPU).
    rollout_interpret routes the kernel through the Pallas interpreter.
    """
    if rollout not in ("scan", "pallas", "pallas_ref"):
        raise ValueError(f"rollout must be 'scan', 'pallas' or 'pallas_ref',"
                         f" got {rollout!r}")
    local_envs = envs_per_device if envs_per_device is not None else cfg.num_envs
    assert local_envs % cfg.num_minibatches == 0, (
        f"num_envs per device ({local_envs}) must divide into "
        f"{cfg.num_minibatches} minibatches (recurrent PPO minibatches lanes)"
    )
    mb_lanes = local_envs // cfg.num_minibatches
    bptt = cfg.bptt_horizon if cfg.bptt_horizon else cfg.horizon
    assert cfg.horizon % bptt == 0, (
        f"horizon ({cfg.horizon}) must be a multiple of bptt_horizon "
        f"({bptt})")
    n_seg = cfg.horizon // bptt

    def rollout_body(carry, key_t):
        env_state, obs, lstm, params = carry
        mean, log_std, value, lstm2 = apply_fn(params, obs, lstm)
        noise = jax.random.normal(key_t, mean.shape, mean.dtype)
        action = mean + jnp.exp(log_std) * noise
        logp = ppo_mod.gaussian_logp(action, mean, log_std)
        env_state2, out = jax.vmap(
            lambda s, a: env_mod.step(s, a, env_params, statics)
        )(env_state, action)
        done = out.terminated | out.truncated
        lstm3 = _mask_carry(lstm2, done)
        t = ppo_mod.Transition(
            obs=obs,
            action=action,
            logp=logp,
            value=value,
            reward=out.reward,
            done=done,
            ep_return=out.ep_return,
            ep_length=out.ep_length,
        )
        return (env_state2, out.obs, lstm3, params), t

    @flax.struct.dataclass
    class MB:
        obs: jnp.ndarray      # (T, L, OBS_DIM)
        action: jnp.ndarray   # (T, L, ACT_DIM)
        logp: jnp.ndarray     # (T, L)
        value: jnp.ndarray    # (T, L)
        done: jnp.ndarray     # (T, L) bool
        adv: jnp.ndarray      # (T, L)
        ret: jnp.ndarray      # (T, L)
        carry0: Any           # LSTM carries at segment starts, (S, L, hidden)

    def loss_fn(params, mb: MB):
        mean, log_std, value = segmented_forward(
            apply_fn, params, mb.obs, mb.done, mb.carry0, bptt)
        logp = ppo_mod.gaussian_logp(mb.action, mean, log_std)
        ratio = jnp.exp(logp - mb.logp)
        pg1 = -mb.adv * ratio
        pg2 = -mb.adv * jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps)
        pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
        v_clipped = mb.value + jnp.clip(value - mb.value, -cfg.vf_clip, cfg.vf_clip)
        v_loss = 0.5 * jnp.mean(
            jnp.maximum((value - mb.ret) ** 2, (v_clipped - mb.ret) ** 2)
        )
        ent = jnp.mean(ppo_mod.gaussian_entropy(log_std))
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

    def collect_scan(runner, krollout):
        step_keys = jax.random.split(krollout, cfg.horizon)
        seg_keys = jax.tree_util.tree_map(
            lambda k: k.reshape(n_seg, bptt, *k.shape[1:]), step_keys)

        # nested scan: the outer level records the recurrent state at each
        # segment start (the BPTT anchors) without storing per-step carries
        def seg_body(carry, keys_seg):
            anchor = carry[2]
            carry, traj_seg = jax.lax.scan(rollout_body, carry, keys_seg)
            return carry, (traj_seg, anchor)

        (env_state, last_obs, last_carry, _), (traj, seg_carries) = \
            jax.lax.scan(
                seg_body,
                (runner.env_state, runner.last_obs, runner.carry,
                 runner.params),
                seg_keys,
            )
        # (S, bptt, B, ...) -> (T, B, ...)
        traj = jax.tree_util.tree_map(
            lambda x: x.reshape(cfg.horizon, *x.shape[2:]), traj)
        return env_state, last_obs, last_carry, traj, seg_carries, None

    def collect_kernel(runner):
        from drone_tpu.ops import pallas_acting_lstm as PAL
        from drone_tpu.ops.pallas_acting_traj import _planes_to_traj

        if rollout == "pallas":
            env_state, last_carry, planes, seg_carries, stats = \
                PAL.traj_lstm_rollout_pallas(
                    runner.env_state, runner.params, runner.carry,
                    env_params, statics, cfg.horizon, bptt=bptt,
                    interpret=rollout_interpret)
            traj = _planes_to_traj(planes, local_envs)
        else:
            env_state, last_carry, traj, seg_carries, stats = \
                PAL.traj_lstm_rollout_reference(
                    runner.env_state, runner.params, runner.carry,
                    env_params, statics, cfg.horizon, bptt=bptt)
        last_obs = jax.vmap(env_mod.observe)(env_state)
        return env_state, last_obs, last_carry, traj, seg_carries, stats

    def train_step(runner: RecurrentRunnerState):
        key, krollout, kperm = jax.random.split(runner.key, 3)
        if rollout == "scan":
            (env_state, last_obs, last_carry, traj, seg_carries,
             k_stats) = collect_scan(runner, krollout)
        else:
            (env_state, last_obs, last_carry, traj, seg_carries,
             k_stats) = collect_kernel(runner)

        _, _, last_value, _ = apply_fn(runner.params, last_obs, last_carry)
        adv, ret = ppo_mod.compute_gae(
            traj.reward, traj.value, traj.done.astype(jnp.float32), last_value,
            cfg.gamma, cfg.gae_lambda,
        )
        if axis_name is not None:
            g_mean = jax.lax.pmean(jnp.mean(adv), axis_name)
            g_var = jax.lax.pmean(jnp.mean((adv - g_mean) ** 2), axis_name)
        else:
            g_mean = jnp.mean(adv)
            g_var = jnp.var(adv)
        adv = (adv - g_mean) / jnp.sqrt(g_var + 1e-8)

        def epoch_body(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, local_envs)

            def mb_body(carry, mb_idx):
                params, opt_state = carry
                take = jax.lax.dynamic_slice_in_dim(
                    perm, mb_idx * mb_lanes, mb_lanes
                )
                mb = MB(
                    obs=traj.obs[:, take],
                    action=traj.action[:, take],
                    logp=traj.logp[:, take],
                    value=traj.value[:, take],
                    done=traj.done[:, take],
                    adv=adv[:, take],
                    ret=ret[:, take],
                    carry0=jax.tree_util.tree_map(
                        lambda c: c[:, take], seg_carries),
                )
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb
                )
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, aux)

            carry, losses = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(cfg.num_minibatches)
            )
            return carry, losses

        epoch_keys = jax.random.split(kperm, cfg.epochs)
        (params, opt_state), (losses, auxes) = jax.lax.scan(
            epoch_body, (runner.params, runner.opt_state), epoch_keys
        )

        # psum count-like quantities to global totals (see ppo.py metrics note)
        if k_stats is None:
            n_done = jnp.sum(traj.done).astype(jnp.float32)
            ep_ret_sum = jnp.sum(traj.ep_return)
            ep_len_sum = jnp.sum(traj.ep_length).astype(jnp.float32)
        else:  # the kernel accumulates episode stats on-chip
            n_done = k_stats["episodes"]
            ep_ret_sum = k_stats["ep_return_sum"]
            ep_len_sum = k_stats["ep_length_sum"]
        if axis_name is not None:
            n_done = jax.lax.psum(n_done, axis_name)
            ep_ret_sum = jax.lax.psum(ep_ret_sum, axis_name)
            ep_len_sum = jax.lax.psum(ep_len_sum, axis_name)
        metrics = dict(
            loss=jnp.mean(losses),
            reward_mean=jnp.mean(traj.reward),
            episodes=n_done,
            ep_return_mean=ep_ret_sum / jnp.maximum(n_done, 1),
            ep_length_mean=ep_len_sum / jnp.maximum(n_done, 1),
            **{k: jnp.mean(v) for k, v in auxes.items()},
        )
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        runner2 = RecurrentRunnerState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            last_obs=last_obs,
            carry=last_carry,
            key=key,
            update_idx=runner.update_idx + 1,
        )
        return runner2, metrics

    return train_step


def init_recurrent_runner(
    model, env, cfg: ppo_mod.PPOConfig, seed: int = 0, envs: int | None = None,
    optimizer: optax.GradientTransformation | None = None,
) -> RecurrentRunnerState:
    """Fresh RecurrentRunnerState (model: LSTMActorCritic-compatible)."""
    n = envs if envs is not None else cfg.num_envs
    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    env_state = env.init_batch(seed, n)
    obs = env.observe_batch(env_state)
    carry = model.initial_carry((n,))
    params = model.init(
        kinit, obs[:1], jax.tree_util.tree_map(lambda c: c[:1], carry)
    )
    opt = optimizer if optimizer is not None else ppo_mod.make_optimizer(cfg)
    opt_state = opt.init(params)
    return RecurrentRunnerState(
        params=params,
        opt_state=opt_state,
        env_state=env_state,
        last_obs=obs,
        carry=carry,
        key=key,
        update_idx=jnp.int32(0),
    )


def rollout_recurrent(model, params, env, state, carry, steps: int,
                      key=None, deterministic: bool = True, env_params=None):
    """Policy rollout for evaluation: returns (final_state, final_carry,
    StepOut stacked over T).

    env_params: pass env.params through this (as a TRACED jit argument)
    when calling under jit — closing over the env object would bake
    EnvParams into XLA constants (strength-reduced divisions; the
    CLAUDE.md traced-params invariant)."""
    obs0 = env.observe_batch(state)
    p = env_params if env_params is not None else env.params
    statics = env.statics

    def body(c, key_t):
        s, obs, lstm = c
        mean, log_std, _, lstm2 = model.apply(params, obs, lstm)
        if deterministic:
            action = mean
        else:
            action = mean + jnp.exp(log_std) * jax.random.normal(
                key_t, mean.shape, mean.dtype
            )
        s2, out = jax.vmap(lambda ss, aa: env_mod.step(ss, aa, p, statics))(s, action)
        lstm3 = _mask_carry(lstm2, out.terminated | out.truncated)
        return (s2, out.obs, lstm3), out

    if key is None and not deterministic:
        raise ValueError(
            "stochastic rollout_recurrent needs a PRNG key: with key=None "
            "every step would draw the SAME noise from the zero key "
            "(time-correlated 'exploration', silently degenerate)")
    keys = (
        jax.random.split(key, steps)
        if key is not None
        else jnp.zeros((steps, 2), jnp.uint32)
    )
    (final_state, _, final_carry), outs = jax.lax.scan(
        body, (state, obs0, carry), keys
    )
    return final_state, final_carry, outs
