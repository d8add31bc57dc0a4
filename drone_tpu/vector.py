"""Numpy-facing vectorized env API — the reference's vecenv surface.

Rebuild of the PufferLib vectorization layer (SURVEY.md §1 L2, §2.2 #6-#7:
`[U] pufferlib/vector.py` `make(creator, num_envs, backend)` returning a
vecenv with sync `reset/step` and async `async_reset/send/recv` over
preallocated, caller-visible buffers). The reference needs OS worker
processes + shared memory because its envs are single-threaded C; here the
batch is one fused XLA program, so:

  - backend="jit"    (prod)  one jitted vmapped step; numpy buffers are
                             filled by a single device->host copy per recv —
                             the analogue of the reference's single-copy
                             shared-memory protocol.
  - backend="serial" (debug) python loop of single-lane jitted steps — the
                             reference's Serial backend; produces bitwise
                             identical batches to "jit" (vmap≡loop is a
                             tested invariant), so backend-equivalence tests
                             carry over from the reference's test strategy
                             (SURVEY.md §4.1).

The async API mirrors the reference's envpool-style double buffering: send()
dispatches the jitted step (JAX dispatch is async — device compute overlaps
the host), recv() blocks on the transfer. Training should use the pure-JAX
path (drone_tpu.ppo); this facade exists for evaluation, demos, and for
reference users who expect the vecenv surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from drone_tpu import env as env_mod
from drone_tpu import spaces
from drone_tpu.types import ACT_DIM, OBS_DIM, EnvParams

BACKENDS = ("jit", "serial")


class VecDrone:
    """Vectorized drone env over `num_envs` lanes with caller-visible numpy
    buffers (observations/rewards/terminals/truncations), PufferEnv-style."""

    def __init__(self, num_envs: int, task: str = "hover",
                 integrator: str = "euler", params: EnvParams | None = None,
                 backend: str = "jit", seed: int = 0):
        if backend not in BACKENDS:
            raise ValueError(f"backend must be one of {BACKENDS}, got {backend!r}")
        from drone_tpu.env import DroneEnv

        self.env = DroneEnv(task=task, integrator=integrator, params=params)
        self.num_envs = int(num_envs)
        self.backend = backend
        self.seed = seed

        self.single_observation_space = spaces.observation_space()
        self.single_action_space = spaces.action_space()

        # caller-visible preallocated buffers (single D2H copy per recv)
        self.observations = np.zeros((num_envs, OBS_DIM), np.float32)
        self.rewards = np.zeros(num_envs, np.float32)
        self.terminals = np.zeros(num_envs, bool)
        self.truncations = np.zeros(num_envs, bool)

        self._state = None          # device EnvState, batched
        self._pending = None        # in-flight (state, StepOut) from send()
        # EnvParams ride as TRACED jit arguments (project invariant: a
        # closed-over param becomes an XLA constant and division by it gets
        # strength-reduced, bitwise-diverging from the traced-params
        # training/oracle path). statics (task/integrator strings) select
        # the traced program and stay closed over.
        statics = self.env.statics

        if backend == "jit":
            def _step(state, actions, p):
                return jax.vmap(
                    lambda s, a: env_mod.step(s, a, p, statics)
                )(state, actions)

            self._step_fn = jax.jit(_step, donate_argnums=0)
        else:
            single = jax.jit(lambda s, a, p: env_mod.step(s, a, p, statics))

            def _step(state, actions, p):
                outs = []
                states = []
                for i in range(self.num_envs):
                    lane = jax.tree_util.tree_map(lambda x: x[i], state)
                    s2, out = single(lane, actions[i], p)
                    states.append(s2)
                    outs.append(out)
                stack = lambda *xs: jnp.stack(xs)
                return (
                    jax.tree_util.tree_map(stack, *states),
                    jax.tree_util.tree_map(stack, *outs),
                )

            self._step_fn = _step

    # -- sync API ------------------------------------------------------------
    def reset(self, seed: int | None = None):
        """-> (observations, infos). Buffers are (re)filled in place."""
        if seed is not None:
            self.seed = seed
        self._pending = None  # drop any in-flight step from before the reset
        self._state = self.env.init_batch(self.seed, self.num_envs)
        obs = self.env.observe_batch(self._state)
        self.observations[:] = np.asarray(obs)
        self.rewards[:] = 0.0
        self.terminals[:] = False
        self.truncations[:] = False
        return self.observations, {}

    def step(self, actions):
        """-> (obs, rewards, terminals, truncations, infos); auto-reset lanes
        return the NEW episode's first obs (PufferEnv convention)."""
        self.send(actions)
        return self.recv()

    # -- async API (reference: envpool-style double buffering) ---------------
    def async_reset(self, seed: int | None = None):
        """Arms a pending reset result: the canonical driver loop is
        async_reset() -> recv() (initial obs) -> send(actions) -> recv()."""
        self.reset(seed)
        self._pending = "reset"

    def send(self, actions):
        if self._state is None:
            raise RuntimeError("call reset()/async_reset() before send()")
        if self._pending == "reset":
            self._pending = None  # caller skipped recv'ing the initial obs
        if self._pending is not None:
            raise RuntimeError("send() called twice without recv()")
        actions = jnp.asarray(actions, jnp.float32).reshape(
            self.num_envs, ACT_DIM
        )
        self._pending = self._step_fn(self._state, actions, self.env.params)

    def recv(self):
        if self._pending is None:
            raise RuntimeError("recv() called without a pending send()")
        if self._pending == "reset":
            self._pending = None
            return (self.observations, self.rewards, self.terminals,
                    self.truncations, {})
        state, out = self._pending
        self._pending = None
        self._state = state
        # one batched D2H fetch (the tunnel to the TPU makes per-array
        # blocking copies expensive; device_get pipelines the transfers)
        host = jax.device_get(out)
        self.observations[:] = host.obs
        self.rewards[:] = host.reward
        self.terminals[:] = host.terminated
        self.truncations[:] = host.truncated
        done = self.terminals | self.truncations
        infos = {}
        if done.any():
            infos["episode_return"] = host.ep_return[done]
            infos["episode_length"] = host.ep_length[done]
            infos["finished"] = done
        return (self.observations, self.rewards, self.terminals,
                self.truncations, infos)

    def close(self):
        self._state = None
        self._pending = None

    @property
    def observation_space(self):
        return self.single_observation_space

    @property
    def action_space(self):
        return self.single_action_space


def make(task: str = "hover", num_envs: int = 8, *, integrator: str = "euler",
         params: EnvParams | None = None, backend: str = "jit",
         seed: int = 0) -> VecDrone:
    """The reference's `pufferlib.vector.make` analogue."""
    return VecDrone(num_envs, task=task, integrator=integrator,
                    params=params, backend=backend, seed=seed)
