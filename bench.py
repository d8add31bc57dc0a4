"""Benchmark: aggregate env-steps/s on the batched hover task (the
BASELINE.json:2 metric). Prints ONE JSON line.

Runs on whatever accelerator is default (the driver provides a real TPU
chip). The measured program is the production rollout: vmapped fused env
step (mix -> integrate -> reward -> done -> auto-reset -> obs) + policy
forward, under lax.scan, rollouts never leaving HBM.

vs_baseline: the reference publishes no numbers (BASELINE.md); the spec
target is >100M steps/s aggregate on a v4-16 (16 chips). We report
vs_baseline as measured single-chip steps/s divided by a 6.25M steps/s
per-chip share of that target (100M/16), i.e. vs_baseline > 1.0 means this
chip beats its pro-rata share of the target.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import drone_tpu
    from drone_tpu import env as env_mod
    from drone_tpu.models import ActorCritic

    N = 131072  # drones (measured best on v5e: beats 64K/256K/512K lanes)
    T = 256     # horizon per timed call

    env = drone_tpu.DroneEnv(task="hover", integrator="euler")
    model = ActorCritic()
    key = jax.random.PRNGKey(0)
    obs0 = jnp.zeros((1, env.obs_dim), jnp.float32)
    params = model.init(key, obs0)
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

    def run(state, key):
        obs = jax.vmap(env_mod.observe)(state)
        keys = jax.random.split(key, T)
        (final, _, acc), _ = jax.lax.scan(body, (state, obs, jnp.float32(0)), keys)
        # acc is a small reduction so nothing large leaves the device
        return final, acc

    state = env.init_batch(0, N)

    # donate the carried env state: without donation XLA must preserve the
    # input buffers across the call, inserting copies of the full fleet state
    run_j = jax.jit(run, donate_argnums=0)
    # warmup/compile
    state2, s = run_j(state, key)
    jax.block_until_ready(s)

    # timed: 4 chained calls
    iters = 4
    t0 = time.perf_counter()
    st = state2
    for i in range(iters):
        st, s = run_j(st, jax.random.fold_in(key, i))
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0

    steps_per_s = N * T * iters / dt
    target_per_chip = 100e6 / 16.0
    print(json.dumps({
        "metric": "env_steps_per_s_batched_hover_1chip",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / target_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
