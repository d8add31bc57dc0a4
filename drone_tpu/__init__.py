"""drone_tpu — a TPU-native quadrotor RL environment + training framework in JAX.

Built from scratch with the capabilities of the reference `tensaur/drone`
(a C quadrotor simulator shipped inside PufferLib; see /root/repo/SURVEY.md).
The compute path is pure JAX (jit/vmap/lax.scan/shard_map); correctness is
gated by bitwise float32 parity against the C oracle in `oracle/`.

Layer map (TPU-native restatement of the reference's L0..L5, SURVEY.md §1):
  L0 physics      -> drone_tpu.dynamics (pure functions)
  L1 env API      -> drone_tpu.env (typed pytree EnvState/EnvParams)
                     + drone_tpu.spaces / drone_tpu.emulation (gymnasium)
  L2 vectorize    -> jax.vmap + lax.scan (drone_tpu.rollout)
                     + drone_tpu.vector (numpy-facing vecenv facade)
  L3 trainer      -> drone_tpu.ppo / drone_tpu.train (flax+optax, on-device)
  L4 CLI/config   -> drone_tpu.cli / drone_tpu.utils.config
  L5 demo/deploy  -> native/ C inference + viz/
"""

__version__ = "0.1.0"

from drone_tpu.types import EnvParams, EnvState, EnvStatics, StepOut  # noqa: F401
from drone_tpu.env import DroneEnv  # noqa: F401
