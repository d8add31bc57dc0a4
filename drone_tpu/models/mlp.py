"""Default MLP actor-critic (Gaussian policy head + value head).

Rebuild of the reference's default policy (SURVEY.md §2.2 #10:
`[U] pufferlib/models.py` `Default` — MLP encoder, actor head, value head).
Continuous 4-dim action space (motor commands), state-independent learned
log-std, tanh activations. All matmuls run in float32 on the MXU; shapes are
static so XLA tiles them.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ActorCritic(nn.Module):
    """obs -> (action mean, log_std, value).

    Separate actor/critic towers (the reference's Default shares an encoder;
    separate towers are the stronger baseline for continuous control and cost
    the same on TPU — both are tiny matmuls that fuse into one program).
    """

    act_dim: int = 4
    hidden: Sequence[int] = (64, 64)
    log_std_init: float = 0.0
    # compute dtype for the towers (params stay float32; outputs are cast
    # back). bfloat16 is ~25% faster per SGD pass on v5e (the update is
    # activation-bandwidth-bound, DESIGN.md §3) at slightly coarser policy
    # outputs — select with run.compute_dtype.
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, obs):
        x = jnp.asarray(obs, self.dtype)
        for i, h in enumerate(self.hidden):
            x = nn.tanh(nn.Dense(h, dtype=self.dtype, name=f"actor_h{i}")(x))
        mean = nn.Dense(
            self.act_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(0.01),
            name="actor_mean",
        )(x).astype(jnp.float32)
        log_std = self.param(
            "log_std",
            nn.initializers.constant(self.log_std_init),
            (self.act_dim,),
        )

        v = jnp.asarray(obs, self.dtype)
        for i, h in enumerate(self.hidden):
            v = nn.tanh(nn.Dense(h, dtype=self.dtype, name=f"critic_h{i}")(v))
        value = nn.Dense(
            1, dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(1.0), name="critic_value"
        )(v).astype(jnp.float32)
        return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0]
