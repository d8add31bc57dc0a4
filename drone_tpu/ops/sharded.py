"""Pod-scale megakernel rollouts: shard_map around the Pallas kernels.

Each device runs the VMEM-resident rollout on its own lane shard (the
kernel is embarrassingly lane-parallel); episode statistics psum over the
mesh. This is the fleet-scale form of the BASELINE metric — at the measured
3.2B steps/s per v5e chip, a v4-16's 16 chips project to ~50B env-steps/s
aggregate (linear: there is no cross-lane communication at all until the
final stats psum).

Tested on the virtual CPU mesh (interpret mode, bitwise vs single-device);
on a real slice the same call compiles the Mosaic kernel per device.
"""

from __future__ import annotations

import functools

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from drone_tpu.ops import pallas_acting, pallas_rollout
from drone_tpu.types import EnvParams, EnvState, EnvStatics


@functools.lru_cache(maxsize=64)
def _jitted(mesh: Mesh, axis: str, state_treedef, repl_treedef, local_fn):
    """Cache the jitted shard_map per (mesh, axis, pytree structures, inner
    fn): rebuilding a fresh closure per call would miss the jit cache and
    retrace + recompile the kernel on every invocation."""
    state_specs = jax.tree_util.tree_unflatten(
        state_treedef, [P(axis)] * state_treedef.num_leaves)
    repl_specs = jax.tree_util.tree_unflatten(
        repl_treedef, [P()] * repl_treedef.num_leaves)
    stats_proto = {k: 0.0 for k in ("reward_sum", "episodes", "ep_return_sum",
                                    "ep_length_sum", "ep_return_sq_sum")}
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(state_specs, repl_specs),
        out_specs=(state_specs,
                   jax.tree_util.tree_map(lambda _: P(), stats_proto)),
        check_vma=False,
    )
    return jax.jit(fn)


def _sharded(mesh: Mesh, state: EnvState, local_fn, replicated_args, axis: str):
    # replicated_args (params etc.) ride through shard_map as TRACED inputs:
    # closing over them would bake them into XLA constants and let division
    # strength-reduce to multiply-by-reciprocal, breaking the bitwise match
    # with the single-device run (same hazard as the oracle parity tests)
    fn = _jitted(mesh, axis,
                 jax.tree_util.tree_structure(state),
                 jax.tree_util.tree_structure(replicated_args),
                 local_fn)
    placed = jax.device_put(
        state,
        jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P(axis)), state),
    )
    return fn(placed, replicated_args)


# the local fns are produced by lru_cached factories keyed on hashable
# statics, so the same configuration maps to the SAME function object and
# _jitted's cache (and jit's) actually hit on repeat calls


@functools.lru_cache(maxsize=64)
def _local_rollout(statics, T, lanes_per_block, interpret, axis):
    def local(s, p):
        f, stats = pallas_rollout.rollout_pallas(
            s, p, statics, T, lanes_per_block=lanes_per_block,
            interpret=interpret)
        return f, jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis), stats)

    return local


@functools.lru_cache(maxsize=64)
def _local_acting(statics, T, lanes_per_block, interpret, stochastic, axis):
    def local(s, args):
        pol, envp = args
        f, stats = pallas_acting.act_rollout_pallas(
            s, pol, envp, statics, T,
            lanes_per_block=lanes_per_block, interpret=interpret,
            stochastic=stochastic)
        return f, jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis), stats)

    return local


def sharded_rollout_pallas(mesh: Mesh, state: EnvState, params: EnvParams,
                           statics: EnvStatics, T: int,
                           lanes_per_block: int = 8192, axis: str = "data",
                           interpret: bool = False):
    """rollout_pallas over every device of `mesh`. state: batched EnvState
    with N divisible by (mesh size * lanes_per_block). Returns (final state
    sharded over the mesh, globally-psum'd stats dict)."""
    local = _local_rollout(statics, T, lanes_per_block, interpret, axis)
    return _sharded(mesh, state, local, params, axis)


def sharded_act_rollout_pallas(mesh: Mesh, state: EnvState, policy_params,
                               env_params: EnvParams, statics: EnvStatics,
                               T: int, lanes_per_block: int = 8192,
                               axis: str = "data", interpret: bool = False,
                               stochastic: bool = False):
    """act_rollout_pallas (fused policy+env) over every device of `mesh`."""
    local = _local_acting(statics, T, lanes_per_block, interpret, stochastic,
                          axis)
    return _sharded(mesh, state, local, (policy_params, env_params), axis)
