"""Scaling harness: sharded train-step throughput vs device count.

Rebuild of the distributed tier's missing piece (SURVEY.md §4.2 tier 5:
"throughput/scaling harness"; BASELINE.md: "near-linear host scaling").
Runs the SAME shard_map'd PPO train step over meshes of 1, 2, 4, ... N
devices with the env batch scaled proportionally (weak scaling — the
production regime: more chips => more drones), reports steps/s and
efficiency relative to the per-device throughput of the FIRST entry of
device_counts (the smallest mesh measured; pass device_counts starting at
1 to make that the 1-device run — efficiency columns from sweeps with
different device_counts lists are not comparable).

On a pod slice this measures real ICI/DCN scaling; under the virtual-CPU
mesh used in CI it only validates the harness mechanics (CPU "devices"
share one socket, so efficiency numbers are meaningless there).

Timing ends with a device->host value fetch — jax.block_until_ready can
return early on this image's tunneled TPU (see bench.py TIMING NOTE).
"""

from __future__ import annotations

import time

import jax

from drone_tpu import ppo as ppo_mod
from drone_tpu.parallel.mesh import make_mesh, place_runner
from drone_tpu.parallel.train_sharded import make_sharded_train_step


def run_scaling(env, model, cfg: ppo_mod.PPOConfig, envs_per_device: int = 4096,
                iters: int = 3, device_counts=None) -> list[dict]:
    """Weak-scaling sweep. Returns one record per device count:
    {devices, steps_per_s, efficiency}."""
    devices = jax.devices()
    if device_counts is None:
        device_counts = []
        n = 1
        while n <= len(devices):
            device_counts.append(n)
            n *= 2
    records = []
    base = None
    for n_dev in device_counts:
        import dataclasses

        c = dataclasses.replace(cfg, num_envs=envs_per_device * n_dev)
        opt = ppo_mod.make_optimizer(c)
        runner = ppo_mod.init_runner(model, env, c, seed=0)
        if n_dev == 1:
            step = jax.jit(ppo_mod.make_train_step(
                model.apply, opt, env.params, env.statics, c))
        else:
            mesh = make_mesh(devices[:n_dev])
            runner = place_runner(mesh, runner)
            step = make_sharded_train_step(
                model.apply, opt, env.params, env.statics, c, mesh,
                example_runner=runner)
        runner, m = step(runner)
        float(m["loss"])  # compile + hard sync
        t0 = time.perf_counter()
        for _ in range(iters):
            runner, m = step(runner)
        float(m["loss"])
        dt = time.perf_counter() - t0
        sps = c.num_envs * c.horizon * iters / dt
        if base is None:
            base = sps / n_dev  # per-device throughput of the first run
        records.append({
            "devices": n_dev,
            "num_envs": c.num_envs,
            "steps_per_s": round(sps, 1),
            "efficiency": round(sps / (base * n_dev), 3),
        })
    return records


def main(argv=None):
    import argparse
    import json

    import drone_tpu
    from drone_tpu.models import ActorCritic

    ap = argparse.ArgumentParser(description="weak-scaling sweep")
    ap.add_argument("--envs-per-device", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=64)
    args = ap.parse_args(argv)
    env = drone_tpu.DroneEnv()
    cfg = ppo_mod.PPOConfig(horizon=args.horizon, epochs=2, num_minibatches=2)
    for rec in run_scaling(env, ActorCritic(), cfg,
                           envs_per_device=args.envs_per_device):
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
