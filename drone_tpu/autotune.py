"""Batch-geometry autotuner: measure train-SPS over candidate shapes.

Rebuild of the reference's `puffer autotune` (the PufferLib CLI ships an
autotuner that searches vectorization shapes — num_envs / num_workers /
batch_size — for peak steps-per-second on the user's machine; SURVEY.md
§2.2 #11 CLI surface). The TPU-native analogue tunes the knobs that set
throughput here: `train.num_envs` (lane count — VMEM residency vs HBM
streaming tradeoff, and what the megakernel trainers tile over) and
`train.num_minibatches` (the minibatch row-tile geometry of the update
kernels). Worker counts don't exist (no processes), and
lanes_per_block/time_chunk are picked per-shape by the kernels themselves
(ops/pallas_rollout.pick_lanes_per_block, pallas_acting_traj.
pick_time_chunk), so the search space is exactly the two config knobs a
user can act on.

Honesty rules inherited from bench.py: every timed region ends with a
device->host value fetch (block_until_ready can return early on the
tunneled TPU), and the trainer used per candidate is whatever
train.build() would actually select for that shape (megakernel when
eligible on a TPU backend, scan otherwise) — the measurement IS the
production path, not a proxy.

Changing num_envs changes learning dynamics (same as the reference's
autotune changing batch size); the tool reports throughput and leaves the
choice to the user.
"""

from __future__ import annotations

import dataclasses
import time

import jax


def candidate_shapes(cfg, max_envs: int = 1 << 20):
    """Candidate (num_envs, num_minibatches) pairs around the config's.

    num_envs sweeps powers-of-two scalings of the current value (x1/4 ..
    x4); num_minibatches sweeps {2, 4, 8} plus the current. Shapes are
    kept when the PER-DEVICE shard (train.build divides num_envs across
    the mesh before the kernels see it) satisfies the megakernel
    eligibility alignment for the active backend (1024 * num_minibatches
    lanes on TPU, 128-multiples on CPU) OR the shape equals the current
    config (so the baseline is always measured, even if it only reaches
    the scan trainer)."""
    backend = jax.default_backend()
    lane_mult = 128 if backend == "cpu" else 1024
    n_dev = len(jax.devices())
    cur = (cfg.train.num_envs, cfg.train.num_minibatches)
    envs_c = sorted({max(cfg.train.num_envs >> s, lane_mult)
                     for s in (2, 1, 0)}
                    | {min(cfg.train.num_envs << s, max_envs)
                       for s in (1, 2)})
    mbs_c = sorted({2, 4, 8, cfg.train.num_minibatches})
    # The baseline goes in unconditionally: the scaled envs_c set clamps to
    # lane_mult, so a small current num_envs (< lane_mult) never reappears
    # in the loop and an `(n, mb) == cur` escape there would be unreachable.
    out = [cur]
    for n in envs_c:
        for mb in mbs_c:
            if (n, mb) == cur:
                continue
            use_mesh = cfg.run.mesh and n_dev > 1 and n % n_dev == 0
            local = n // n_dev if use_mesh else n
            if local % (lane_mult * mb) == 0:
                out.append((n, mb))
    return out


def _with_shape(cfg, num_envs: int, num_minibatches: int):
    return dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, num_envs=num_envs, num_minibatches=num_minibatches))


def measure_train_sps(cfg, iters: int = 3) -> tuple[float, str]:
    """Build the production train step for cfg (exactly train.build's
    selection) and measure steps/s over `iters` updates after one warmup.
    Returns (sps, trainer_label)."""
    from drone_tpu import ppo_pallas
    from drone_tpu.train import build

    env, model, opt, runner, step, mesh = build(cfg)
    label = ("megakernel" if ppo_pallas.is_fused_opt_state(runner.opt_state)
             else "scan/hybrid")
    runner, m = step(runner)          # compile + warm
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        runner, m = step(runner)
    float(m["loss"])                  # hard sync (value fetch)
    dt = time.perf_counter() - t0
    return cfg.train.num_envs * cfg.train.horizon * iters / dt, label


def autotune(cfg, iters: int = 3, candidates=None, measure_fn=None,
             verbose: bool = True):
    """Measure every candidate shape; return results sorted best-first.

    Each result: {"num_envs", "num_minibatches", "sps", "trainer",
    "overrides"} where overrides is the dotted-CLI string reproducing the
    shape. candidates/measure_fn are injectable for tests."""
    if candidates is None:
        candidates = candidate_shapes(cfg)
    if measure_fn is None:
        measure_fn = lambda c: measure_train_sps(c, iters=iters)
    results = []
    for n, mb in candidates:
        trial = _with_shape(cfg, n, mb)
        try:
            sps, label = measure_fn(trial)
        except Exception as e:  # OOM / shape rejection: report, keep going
            if verbose:
                print(f"[autotune] num_envs={n} num_minibatches={mb}: "
                      f"failed ({e!r:.120})", flush=True)
            continue
        rec = {
            "num_envs": n,
            "num_minibatches": mb,
            "sps": round(sps, 1),
            "trainer": label,
            "overrides": f"train.num_envs={n} train.num_minibatches={mb}",
        }
        results.append(rec)
        if verbose:
            print(f"[autotune] num_envs={n} num_minibatches={mb}: "
                  f"{sps / 1e6:.2f}M SPS ({label})", flush=True)
    results.sort(key=lambda r: -r["sps"])
    return results
