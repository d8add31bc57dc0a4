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
    from drone_tpu.models import ActorCritic
    from drone_tpu.rollout import rollout_policy

    N = 65536   # drones
    T = 256     # horizon per timed call

    env = drone_tpu.DroneEnv(task="hover", integrator="euler")
    model = ActorCritic()
    key = jax.random.PRNGKey(0)
    obs0 = jnp.zeros((1, env.obs_dim), jnp.float32)
    params = model.init(key, obs0)

    def policy(obs, key_t):
        mean, log_std, _ = model.apply(params, obs)
        noise = jax.random.normal(key_t, mean.shape, mean.dtype)
        return mean + jnp.exp(log_std) * noise, ()

    state = env.init_batch(0, N)

    def run(state, p, key):
        final, (out, _) = rollout_policy(state, policy, T, p, env.statics, key=key)
        # return a small reduction so nothing large leaves the device
        return final, jnp.sum(out.reward)

    run_j = jax.jit(run)
    # warmup/compile
    state2, s = run_j(state, env.params, key)
    jax.block_until_ready(s)

    # timed: 4 chained calls
    iters = 4
    t0 = time.perf_counter()
    st = state2
    for i in range(iters):
        st, s = run_j(st, env.params, jax.random.fold_in(key, i))
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
