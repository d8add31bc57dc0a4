"""Device mesh construction + sharding specs for the actor-learner layout.

Layout (SURVEY.md §2.4, BASELINE.json:5): one mesh axis `data` over all chips
(ICI within a host, DCN across hosts). Env state and rollouts are sharded
along `data` (each chip steps its own drone shard — the analogue of the
reference's per-worker env pools, minus the processes); params/optimizer are
replicated; gradients/metrics are pmean'd over `data`.

A `model` axis is intentionally absent: the reference has no tensor
parallelism (policies are tiny MLPs, SURVEY.md §2.4 TP row); the mesh helper
accepts an axis list so a model axis can be added without API changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def multihost_mesh(axis: str = "data") -> Mesh:
    """Mesh over all devices of all hosts. Call after
    jax.distributed.initialize() on multi-host pods; on a single host it is
    identical to make_mesh()."""
    return make_mesh(jax.devices(), axis)


_SHARDED_FIELDS = ("env_state", "last_obs", "carry")


def runner_sharding(mesh: Mesh, runner, axis: str = "data"):
    """PartitionSpec pytree for a runner state (ppo.RunnerState or
    ppo_rnn.RecurrentRunnerState): per-lane fields (env_state, last_obs, and
    the LSTM carry if present) sharded on `axis`, params/optimizer/key
    replicated."""
    replicated = jax.tree_util.tree_map(lambda _: P(), runner)
    sharded = {
        f: jax.tree_util.tree_map(lambda _: P(axis), getattr(runner, f))
        for f in _SHARDED_FIELDS
        if hasattr(runner, f)
    }
    return replicated.replace(**sharded)


def place_runner(mesh: Mesh, runner, axis: str = "data"):
    """Device-put a host-built RunnerState onto the mesh with the canonical
    sharding (env shards spread over chips, params replicated)."""
    specs = runner_sharding(mesh, runner, axis)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(runner, shardings)
