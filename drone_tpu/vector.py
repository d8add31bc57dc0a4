"""Numpy-facing vectorized env API — the reference's vecenv surface.

Supports the reference's envpool-style PARTIAL-BATCH async protocol
(`[U] pufferlib/vector.py` batch_size < num_envs): the fleet is split into
num_envs/batch_size sub-batches, each independently in flight; recv()
returns the next completed sub-batch (with its env_ids), send(actions)
dispatches the step for the sub-batch just received. On-device the
"workers" are the async JAX dispatch queue — recv of one sub-batch
overlaps the device computing the others, the same pipelining the
reference gets from double-buffered worker processes.

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
                 backend: str = "jit", seed: int = 0,
                 batch_size: int | None = None):
        if backend not in BACKENDS:
            raise ValueError(f"backend must be one of {BACKENDS}, got {backend!r}")
        from drone_tpu.env import DroneEnv

        self.env = DroneEnv(task=task, integrator=integrator, params=params)
        self.num_envs = int(num_envs)
        self.backend = backend
        self.seed = seed
        self.batch_size = int(batch_size) if batch_size else self.num_envs
        if self.num_envs % self.batch_size:
            raise ValueError(f"batch_size ({self.batch_size}) must divide "
                             f"num_envs ({self.num_envs})")
        self._n_sub = self.num_envs // self.batch_size

        self.single_observation_space = spaces.observation_space()
        self.single_action_space = spaces.action_space()

        # caller-visible preallocated buffers (single D2H copy per recv);
        # in partial-batch mode they hold ONE sub-batch and recv() reports
        # which lanes via infos["env_ids"]
        nb = self.batch_size
        self.observations = np.zeros((nb, OBS_DIM), np.float32)
        self.rewards = np.zeros(nb, np.float32)
        self.terminals = np.zeros(nb, bool)
        self.truncations = np.zeros(nb, bool)

        self._state = None          # device EnvState, batched
        self._pending = None        # in-flight (state, StepOut) from send()
        self._subs = None           # partial mode: per-sub-batch EnvStates
        self._queue = None          # partial mode: FIFO of in-flight subs
        self._awaiting = None       # partial mode: sub id last recv'd
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
                for i in range(actions.shape[0]):
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
        if self._n_sub > 1:
            raise RuntimeError(
                "batch_size < num_envs is async-only: use async_reset()/"
                "send()/recv() (the reference's envpool protocol)")
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
        """Arms pending reset results: the canonical driver loop is
        async_reset() -> recv() (initial obs + env_ids) -> send(actions)
        -> recv() ... With batch_size < num_envs every sub-batch is queued
        and up to num_envs/batch_size steps are in flight at once."""
        if self._n_sub == 1:
            self.reset(seed)
            self._pending = "reset"
            return
        import collections

        if seed is not None:
            self.seed = seed
        full = self.env.init_batch(self.seed, self.num_envs)
        nb = self.batch_size
        self._subs = [
            jax.tree_util.tree_map(lambda x: x[i * nb:(i + 1) * nb], full)
            for i in range(self._n_sub)
        ]
        self._queue = collections.deque(
            ("reset", i, None) for i in range(self._n_sub))
        self._awaiting = None

    def send(self, actions):
        if self._n_sub > 1:
            if self._awaiting is None:
                raise RuntimeError("send() without a recv'd sub-batch")
            i = self._awaiting
            self._awaiting = None
            actions = jnp.asarray(actions, jnp.float32).reshape(
                self.batch_size, ACT_DIM)
            pending = self._step_fn(self._subs[i], actions, self.env.params)
            self._queue.append(("step", i, pending))
            return
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
        if self._n_sub > 1:
            return self._recv_sub()
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

    def _recv_sub(self):
        """Partial-batch recv: next completed sub-batch, FIFO order (JAX's
        dispatch queue completes in order on one device)."""
        if not self._queue:
            raise RuntimeError("recv() with no sub-batch in flight — call "
                               "async_reset()/send() first")
        if self._awaiting is not None:
            raise RuntimeError("recv() called twice without send()")
        kind, i, payload = self._queue.popleft()
        nb = self.batch_size
        ids = np.arange(i * nb, (i + 1) * nb)
        infos = {"env_ids": ids}
        if kind == "reset":
            obs = self.env.observe_batch(self._subs[i])
            self.observations[:] = np.asarray(obs)
            self.rewards[:] = 0.0
            self.terminals[:] = False
            self.truncations[:] = False
        else:
            state, out = payload
            self._subs[i] = state
            host = jax.device_get(out)
            self.observations[:] = host.obs
            self.rewards[:] = host.reward
            self.terminals[:] = host.terminated
            self.truncations[:] = host.truncated
            done = self.terminals | self.truncations
            if done.any():
                infos["episode_return"] = host.ep_return[done]
                infos["episode_length"] = host.ep_length[done]
                infos["finished"] = done
        self._awaiting = i
        return (self.observations, self.rewards, self.terminals,
                self.truncations, infos)

    def close(self):
        self._state = None
        self._pending = None
        self._subs = None
        self._queue = None
        self._awaiting = None

    @property
    def observation_space(self):
        return self.single_observation_space

    @property
    def action_space(self):
        return self.single_action_space


def make(task: str = "hover", num_envs: int = 8, *, integrator: str = "euler",
         params: EnvParams | None = None, backend: str = "jit",
         seed: int = 0, batch_size: int | None = None) -> VecDrone:
    """The reference's `pufferlib.vector.make` analogue (batch_size <
    num_envs selects the envpool-style partial-batch async protocol)."""
    return VecDrone(num_envs, task=task, integrator=integrator,
                    params=params, backend=backend, seed=seed,
                    batch_size=batch_size)
