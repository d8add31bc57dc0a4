"""Gymnasium interoperability layer.

Rebuild of the reference's emulation layer (SURVEY.md §2.2 #8:
`[U] pufferlib/emulation.py` adapts third-party Gymnasium/PettingZoo envs to
the Puffer API). The direction is inverted here — the drone env is native to
this framework, so what third-party users need is the opposite adapter: this
module exposes the JAX env as a standard `gymnasium.Env`, so it drops into
any Gymnasium-based stack (SB3, CleanRL, ...).

Gymnasium semantics differ from the internal (PufferEnv-style) convention in
one place: on termination Gymnasium returns the TERMINAL observation and the
user must call reset(), while the internal step auto-resets and returns the
new episode's first obs. The adapter uses `env.step_terminal` to honor the
Gymnasium contract exactly; the post-termination state is the auto-reset
state, so `reset()` after a done step is free (and reproducible — episode
RNG streams are counter-based).

gymnasium is optional: if it isn't installed the adapter degrades to a
structurally identical duck-typed class (same methods, drone_tpu.spaces.Box
spaces).
"""

from __future__ import annotations

import jax
import numpy as np

from drone_tpu import env as env_mod
from drone_tpu import spaces
from drone_tpu.types import ACT_DIM, EnvParams

try:  # pragma: no cover
    import gymnasium as _gym

    _EnvBase = _gym.Env
except ImportError:  # pragma: no cover
    _gym = None
    _EnvBase = object


class DroneGymnasium(_EnvBase):
    """Single-drone `gymnasium.Env` over the fused JAX step.

    >>> env = DroneGymnasium(task="hover")
    >>> obs, info = env.reset(seed=0)
    >>> obs, r, term, trunc, info = env.step(env.action_space.sample())
    """

    metadata = {"render_modes": []}

    def __init__(self, task: str = "hover", integrator: str = "euler",
                 params: EnvParams | None = None):
        from drone_tpu.env import DroneEnv

        self.env = DroneEnv(task=task, integrator=integrator, params=params)
        self.observation_space = spaces.observation_space()
        self.action_space = spaces.action_space()
        # params as traced jit arguments (same closure hazard as vector.py:
        # closed-over floats become XLA constants and divisions get
        # strength-reduced, breaking bitwise parity with the traced path)
        statics = self.env.statics
        self._step_fn = jax.jit(
            lambda s, a, p: env_mod.step_terminal(s, a, p, statics)
        )
        self._state = None
        self._needs_reset = True
        self._stepped = False  # host-side: any step since last (auto-)reset?
        self._seed = 0
        self._lane = 0

    def reset(self, *, seed: int | None = None, options: dict | None = None):
        if seed is not None:
            self._seed = seed
            self._state = self.env.init(seed, self._lane)
        elif self._state is None:
            self._state = self.env.init(self._seed, self._lane)
        elif not self._needs_reset and self._stepped:
            # (host-side flag, not int(state.step): a device->host scalar
            # fetch costs ~50 ms on the tunneled TPU — bench.py TIMING NOTE)
            # mid-episode reset (e.g. an external TimeLimit wrapper): abandon
            # the running episode and start the next one in the lane's
            # counter-based stream — same episode the auto-reset would give
            s = self._state
            self._state = env_mod.reset_state(
                s.key0, s.key1, s.reset_count + np.uint32(1),
                self.env.params, self.env.statics,
            )
        # else: the internal step already auto-reset; current state IS the
        # fresh episode (counter-based RNG => same stream either way).
        self._needs_reset = False
        self._stepped = False
        obs = np.asarray(self.env.observe(self._state))
        return obs, {}

    def step(self, action):
        if self._needs_reset:
            raise RuntimeError("episode is done — call reset() first")
        action = np.asarray(action, np.float32).reshape(ACT_DIM)
        state, out, terminal_obs = self._step_fn(self._state, action,
                                                 self.env.params)
        self._state = state
        self._stepped = True
        # ONE device->host transfer for the whole StepOut (each scalar
        # fetch costs ~50 ms on the tunneled TPU; 5 separate bool()/float()
        # reads per step would dominate the step time)
        out, terminal_obs = jax.device_get((out, terminal_obs))
        terminated = bool(out.terminated)
        truncated = bool(out.truncated)
        info = {}
        if terminated or truncated:
            self._needs_reset = True
            obs = np.asarray(terminal_obs)
            info["episode"] = {
                "r": float(out.ep_return),
                "l": int(out.ep_length),
            }
        else:
            obs = np.asarray(out.obs)
        return obs, float(out.reward), terminated, truncated, info

    def render(self):  # trajectory rendering lives in viz/; nothing live here
        return None

    def close(self):
        self._state = None


def make_gymnasium(task: str = "hover", **kwargs) -> DroneGymnasium:
    return DroneGymnasium(task=task, **kwargs)


# ---------------------------------------------------------------------------
# Vectorized gymnasium adapter (SB3-style consumers).
# ---------------------------------------------------------------------------

try:  # pragma: no cover
    from gymnasium.vector import VectorEnv as _VectorEnvBase
    from gymnasium.vector.utils import batch_space as _batch_space
except ImportError:  # pragma: no cover
    _VectorEnvBase = object
    _batch_space = None


class DroneVectorGymnasium(_VectorEnvBase):
    """`gymnasium.vector.VectorEnv` over the fused vmapped JAX step.

    SAME_STEP autoreset semantics (the env's native convention): on a done
    step the returned observation is the NEW episode's first obs, and the
    terminal observation is delivered through infos as both "final_obs"
    (gymnasium >= 1.0 naming) and "final_observation" (SB3/0.29 naming),
    masked by infos["_final_obs"]. The whole batch is one jitted
    vmap(step_terminal) — no worker processes, params traced.
    """

    metadata = {"autoreset_mode": "SameStep"}

    def __init__(self, num_envs: int, task: str = "hover",
                 integrator: str = "euler", params: EnvParams | None = None,
                 seed: int = 0):
        from drone_tpu.env import DroneEnv

        self.env = DroneEnv(task=task, integrator=integrator, params=params)
        self.num_envs = int(num_envs)
        self._seed = seed
        self.single_observation_space = spaces.observation_space()
        self.single_action_space = spaces.action_space()
        if _batch_space is not None:
            self.observation_space = _batch_space(
                self.single_observation_space, self.num_envs)
            self.action_space = _batch_space(
                self.single_action_space, self.num_envs)
        statics = self.env.statics
        self._step_fn = jax.jit(
            lambda s, a, p: jax.vmap(
                lambda ss, aa: env_mod.step_terminal(ss, aa, p, statics)
            )(s, a))
        self._state = None
        self._episode = 0

    def reset(self, *, seed: int | None = None, options: dict | None = None):
        if seed is not None:
            self._seed = seed
            self._episode = 0
        elif self._state is not None:
            # unseeded re-reset: advance every lane's counter-RNG episode
            # stream (gymnasium expects reset() to continue the RNG —
            # replaying init_batch(seed) would score the identical episode
            # set on every eval round)
            self._episode += 1
        self._state = self.env.init_batch(self._seed, self.num_envs,
                                          episode=self._episode)
        return np.asarray(self.env.observe_batch(self._state)), {}

    def step(self, actions):
        actions = np.asarray(actions, np.float32).reshape(self.num_envs,
                                                          ACT_DIM)
        state, out, terminal_obs = self._step_fn(self._state, actions,
                                                 self.env.params)
        self._state = state
        host = jax.device_get((out, terminal_obs))
        out, terminal_obs = host
        done = out.terminated | out.truncated
        infos = {}
        if done.any():
            final = np.where(done[:, None], terminal_obs, np.nan)
            infos["final_obs"] = final
            infos["final_observation"] = final
            # gymnasium's vector-info convention pairs every key with a
            # "_<key>" mask — emit one per naming, not just the 1.0 name
            infos["_final_obs"] = done.copy()
            infos["_final_observation"] = done.copy()
            infos["episode_return"] = out.ep_return[done]
            infos["episode_length"] = out.ep_length[done]
        return (np.asarray(out.obs), np.asarray(out.reward),
                np.asarray(out.terminated), np.asarray(out.truncated), infos)

    def close(self, **kwargs):
        self._state = None


def make_vector(num_envs: int, task: str = "hover",
                **kwargs) -> DroneVectorGymnasium:
    return DroneVectorGymnasium(num_envs, task=task, **kwargs)
