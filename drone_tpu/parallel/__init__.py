"""Parallelism — TPU-native replacement for the reference's process-pool
vectorization + DDP/NCCL (SURVEY.md §2.4/§2.5): env batches sharded over a
device mesh with shard_map, learner gradients pmean'd over ICI, multi-host
bootstrap via jax.distributed.
"""

from drone_tpu.parallel.mesh import make_mesh, runner_sharding  # noqa: F401
from drone_tpu.parallel.train_sharded import make_sharded_train_step  # noqa: F401
