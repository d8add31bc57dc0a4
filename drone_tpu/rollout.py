"""lax.scan rollouts — the TPU-native replacement for the reference's
multiprocessing vectorization layer (SURVEY.md §1 L2, §2.4: processes +
shared memory become vmap + scan; zero copies, rollouts never leave HBM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drone_tpu import env as env_mod
from drone_tpu.types import EnvParams, EnvState, EnvStatics


def rollout_actions(state: EnvState, actions, p: EnvParams, statics: EnvStatics):
    """Step a SINGLE drone through a precomputed (T, 4) action sequence.

    Returns (final_state, StepOut stacked over T). Used by the parity tier
    to drive the exact action stream the C oracle consumed.
    """

    def body(s, a):
        s2, out = env_mod.step(s, a, p, statics)
        return s2, out

    return jax.lax.scan(body, state, actions)


def rollout_actions_packed(state: EnvState, actions, p: EnvParams, statics: EnvStatics):
    """Like rollout_actions but also records the packed 19-float state after
    every step (the oracle's fstate layout) for bitwise comparison."""

    def body(s, a):
        s2, out = env_mod.step(s, a, p, statics)
        packed = jnp.concatenate(
            [
                s2.pos,
                s2.vel,
                s2.quat,
                s2.omega,
                s2.target,
                s2.dr_mass[None],
                s2.dr_thrust[None],
                s2.ep_return[None],
            ]
        )
        return s2, (out, packed)

    return jax.lax.scan(body, state, actions)


def rollout_policy(state: EnvState, policy_fn, steps: int, p: EnvParams,
                   statics: EnvStatics, key=None):
    """Batched policy rollout: state is a vmapped EnvState (leading axis N);
    policy_fn(obs_batch, key) -> (actions, aux pytree). Returns
    (final_state, (StepOut, aux) stacked over T)."""
    obs0 = jax.vmap(env_mod.observe)(state)

    def body(carry, key_t):
        s, obs = carry
        actions, aux = policy_fn(obs, key_t)
        s2, out = jax.vmap(lambda ss, aa: env_mod.step(ss, aa, p, statics))(s, actions)
        return (s2, out.obs), (out, aux)

    # key=None still hands policy_fn DISTINCT per-step keys (split from a
    # fixed seed): broadcasting one zero key would silently give a
    # stochastic policy the identical noise draw at every timestep
    keys = jax.random.split(
        key if key is not None else jax.random.PRNGKey(0), steps)
    (final_state, _), ys = jax.lax.scan(body, (state, obs0), keys)
    return final_state, ys
