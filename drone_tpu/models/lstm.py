"""LSTM actor-critic — rebuild of the reference's LSTM wrapper
(SURVEY.md §2.2 #10: `[U] pufferlib/models.py` `LSTMWrapper`, trained with
truncated BPTT in `[U] pufferlib/pufferl.py`).

The recurrent state is an explicit pytree carried through the rollout scan,
so truncated BPTT falls out of `lax.scan` over the horizon for free — the
TPU-native analogue of the reference's time-chunked BPTT (SURVEY.md §2.4
sequence-parallel note).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class LSTMActorCritic(nn.Module):
    """obs, carry -> (mean, log_std, value, carry').

    `carry` is the flax LSTMCell tuple, ordered (c, h) — cell state FIRST
    (the Pallas kernels and BPTT anchors depend on this ordering; see
    ops/pallas_acting_lstm.py)."""

    act_dim: int = 4
    hidden: int = 128
    encoder: Sequence[int] = (64,)
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs, carry):
        x = obs
        for i, h in enumerate(self.encoder):
            x = nn.tanh(nn.Dense(h, name=f"enc_h{i}")(x))
        cell = nn.OptimizedLSTMCell(self.hidden, name="lstm")
        carry, x = cell(carry, x)
        mean = nn.Dense(
            self.act_dim,
            kernel_init=nn.initializers.orthogonal(0.01),
            name="actor_mean",
        )(x)
        log_std = self.param(
            "log_std",
            nn.initializers.constant(self.log_std_init),
            (self.act_dim,),
        )
        value = nn.Dense(
            1, kernel_init=nn.initializers.orthogonal(1.0), name="critic_value"
        )(x)
        return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0], carry

    def initial_carry(self, batch_shape):
        zeros = jnp.zeros((*batch_shape, self.hidden), jnp.float32)
        return (zeros, zeros)
