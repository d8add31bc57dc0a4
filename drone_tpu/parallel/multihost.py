"""Multi-host bootstrap + global runner construction.

Rebuild of the reference's multi-node path (SURVEY.md §2.5: torchrun + DDP
over NCCL) the TPU way: `jax.distributed.initialize` bootstraps the process
group, the mesh spans every device of every host (ICI within a slice, DCN
across hosts), and the SAME shard_map'd train step runs unchanged — XLA
routes the gradient psum over the right fabric.

On a multi-host pod each process must construct its shard of the global
arrays locally; `global_init_runner` does that by jitting the (pure) runner
initializer with explicit output shardings, so no host ever materializes
the full fleet. Works identically under the single-machine multi-process
CPU simulation used in tests (SURVEY.md §4.2 tier 5).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from drone_tpu.parallel.mesh import multihost_mesh, runner_sharding


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> Mesh:
    """Bootstrap the process group (TPU pods auto-detect all three args)
    and return the global mesh over every device of every host."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return multihost_mesh()


def global_init_runner(init_fn, mesh: Mesh, axis: str = "data"):
    """Build a runner whose env shards live only on their owning hosts.

    init_fn: () -> RunnerState (pure: e.g. lambda: ppo.init_runner(...)).
    Jitted with explicit out_shardings so each process computes exactly its
    addressable shards — the multi-host-safe replacement for building the
    full state on one host and device_put'ing it.
    """
    eval_shape = jax.eval_shape(init_fn)
    specs = runner_sharding(mesh, eval_shape, axis)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.jit(init_fn, out_shardings=shardings)()
