"""LSTM actor-critic — rebuild of the reference's LSTM wrapper
(SURVEY.md §2.2 #10: `[U] pufferlib/models.py` `LSTMWrapper`, trained with
truncated BPTT in `[U] pufferlib/pufferl.py`).

The recurrent state is an explicit pytree carried through the rollout scan,
so truncated BPTT falls out of `lax.scan` over the horizon for free — the
TPU-native analogue of the reference's time-chunked BPTT (SURVEY.md §2.4
sequence-parallel note).

Encoder composability (LSTMWrapper parity): the reference's LSTMWrapper
wraps ANY policy encoder — the default MLP or a CNN. Here that is
`LSTMActorCritic(encoder_module=...)` for arbitrary obs->features modules
(scan trainer), and `CNNLSTMActorCritic` for the flagship pixel-recurrent
configuration — the patchify-CNN tower inlined with FLAT param naming
(conv0/conv1/trunk/lstm/heads) so the megakernel weight extractors and the
DRNW exporter see the same names as the feedforward pixel policy.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _lstm_and_heads(module, x, carry, hidden, act_dim, log_std_init):
    """LSTM cell + Gaussian actor / value heads as a compact-module helper
    (registers lstm/actor_mean/critic_value/log_std on the CALLING module —
    one head definition and one naming for every recurrent policy)."""
    cell = nn.OptimizedLSTMCell(hidden, name="lstm")
    carry, x = cell(carry, x)
    mean = nn.Dense(
        act_dim,
        kernel_init=nn.initializers.orthogonal(0.01),
        name="actor_mean",
    )(x)
    log_std = module.param(
        "log_std",
        nn.initializers.constant(log_std_init),
        (act_dim,),
    )
    value = nn.Dense(
        1, kernel_init=nn.initializers.orthogonal(1.0), name="critic_value"
    )(x)
    return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0], carry


class LSTMActorCritic(nn.Module):
    """obs, carry -> (mean, log_std, value, carry').

    `carry` is the flax LSTMCell tuple, ordered (c, h) — cell state FIRST
    (the Pallas kernels and BPTT anchors depend on this ordering; see
    ops/pallas_acting_lstm.py).

    encoder_module: ANY flax module mapping obs -> features (the
    LSTMWrapper-parity hook; e.g. models.cnn.PatchCNNEncoder). When None,
    the default tanh dense tower of widths `encoder` is used."""

    act_dim: int = 4
    hidden: int = 128
    encoder: Sequence[int] = (64,)
    encoder_module: Optional[nn.Module] = None
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs, carry):
        if self.encoder_module is not None:
            x = self.encoder_module(obs)
        else:
            x = obs
            for i, h in enumerate(self.encoder):
                x = nn.tanh(nn.Dense(h, name=f"enc_h{i}")(x))
        return _lstm_and_heads(self, x, carry, self.hidden, self.act_dim,
                               self.log_std_init)

    def initial_carry(self, batch_shape):
        zeros = jnp.zeros((*batch_shape, self.hidden), jnp.float32)
        return (zeros, zeros)


class CNNLSTMActorCritic(nn.Module):
    """13-vector obs -> on-device pixel render -> patchify-CNN tower ->
    LSTM -> Gaussian actor / value heads: the pixel-RECURRENT policy family
    (run.policy="cnn_lstm"), kernel-trainable.

    The encoder is models.cnn.patch_cnn_trunk — the SAME tower (and the
    same top-level conv0/conv1/trunk param names) as PatchCNNActorCritic,
    so the Pallas weight extractors, the fused-optimizer layouts, and the
    DRNW v3 exporter handle both pixel families with one code path; the
    recurrent half shares _lstm_and_heads with LSTMActorCritic.
    Reference: SURVEY.md:158 (`[U] pufferlib/models.py` LSTMWrapper wraps
    any encoder, including the CNN ones)."""

    act_dim: int = 4
    res: int = 24
    patch0: int = 4
    patch1: int = 2
    channels: Sequence[int] = (64, 64)
    trunk_hidden: int = 128
    hidden: int = 128
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs, carry):
        from drone_tpu.models.cnn import patch_cnn_trunk

        x = patch_cnn_trunk(obs, self.res, self.patch0, self.patch1,
                            self.channels, self.trunk_hidden)
        return _lstm_and_heads(self, x, carry, self.hidden, self.act_dim,
                               self.log_std_init)

    def initial_carry(self, batch_shape):
        zeros = jnp.zeros((*batch_shape, self.hidden), jnp.float32)
        return (zeros, zeros)
