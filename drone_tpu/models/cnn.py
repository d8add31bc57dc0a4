"""CNN actor-critic — rebuild of the reference's CNN policy variants
(SURVEY.md §2.2 #10: `[U] pufferlib/models.py` ships a Nature-CNN-style
encoder for the pixel-based Ocean envs alongside the default MLP).

The drone env's native observation is a 13-vector, so the drone tasks use
the MLP/LSTM policies; this encoder exists for pixel observations (e.g. a
camera-view drone variant or any image-observation env trained with
drone_tpu.ppo — the trainer only needs apply(params, obs) -> (mean,
log_std, value)). Convolutions lower to MXU convolutions on TPU; keep
batch sizes large so XLA can tile them.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class CNNActorCritic(nn.Module):
    """(B, H, W, C) image obs -> (action mean, log_std, value).

    Nature-CNN-shaped encoder (32/64/64 channels) with a linear head;
    Gaussian actor and value head share the trunk (the reference's CNN
    policies share their encoder too)."""

    act_dim: int = 4
    channels: Sequence[int] = (32, 64, 64)
    kernels: Sequence[int] = (8, 4, 3)
    strides: Sequence[int] = (4, 2, 1)
    hidden: int = 256
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs):
        x = jnp.asarray(obs, jnp.float32)
        for i, (c, k, s) in enumerate(zip(self.channels, self.kernels,
                                          self.strides)):
            x = nn.relu(nn.Conv(c, (k, k), strides=(s, s), padding="VALID",
                                name=f"conv{i}")(x))
        x = x.reshape((*x.shape[:-3], -1))
        x = nn.relu(nn.Dense(self.hidden, name="trunk")(x))
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
        return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0]


def patch_cnn_trunk(obs, res, patch0, patch1, channels, hidden):
    """The patchify-CNN feature tower as a compact-module helper: 13-obs ->
    on-device render -> conv0 -> conv1 -> relu trunk features.

    Called INSIDE a @nn.compact __call__, so the conv0/conv1/trunk
    submodules register on the CALLING module — PatchCNNActorCritic and
    CNNLSTMActorCritic share one tower definition AND one top-level param
    naming (conv0/conv1/trunk), which the kernel weight extractors, the
    DRNW exporter, and old checkpoints all rely on."""
    from drone_tpu.pixels import obs_to_pixels

    assert res % (patch0 * patch1) == 0, (res, patch0, patch1)
    img = obs_to_pixels(jnp.asarray(obs, jnp.float32), res)
    x = nn.relu(nn.Conv(channels[0], (patch0, patch0),
                        strides=(patch0, patch0),
                        padding="VALID", name="conv0")(img))
    x = nn.relu(nn.Conv(channels[1], (patch1, patch1),
                        strides=(patch1, patch1),
                        padding="VALID", name="conv1")(x))
    x = x.reshape((*x.shape[:-3], -1))
    return nn.relu(nn.Dense(hidden, name="trunk")(x))


class PatchCNNEncoder(nn.Module):
    """Standalone patchify-CNN encoder module: obs -> feature vector.

    The pluggable-encoder form of the pixel tower, for composing with
    LSTMActorCritic(encoder_module=...) — the reference's LSTMWrapper wraps
    ANY encoder (SURVEY.md §2.2 #10, `[U] pufferlib/models.py`); this is
    the pixel one. (The flagship kernel-trainable pixel-recurrent policy is
    CNNLSTMActorCritic in models/lstm.py, which inlines this tower for flat
    param naming.)"""

    res: int = 24
    patch0: int = 4
    patch1: int = 2
    channels: Sequence[int] = (64, 64)
    hidden: int = 128

    @nn.compact
    def __call__(self, obs):
        return patch_cnn_trunk(obs, self.res, self.patch0, self.patch1,
                               self.channels, self.hidden)


class PatchCNNActorCritic(nn.Module):
    """13-vector obs -> on-device pixel render -> PATCH-conv actor-critic:
    the CNN policy family's megakernel-trainable configuration.

    TPU-first architecture choice: both convolutions are NON-OVERLAPPING
    (kernel == stride — conv0 4x4/4, conv1 2x2/2, both VALID), so im2col
    and its transpose are pure static row reorderings and the whole network
    is dense MXU matmuls — the Pallas rollout/update kernels
    (ops/pallas_acting_cnn.py, ops/pallas_update_cnn.py) evaluate and
    backprop it in VMEM with zero gather/strided-window traffic, and the
    trainer stores only the 13-float obs (pixels are rematerialized
    in-kernel — 9 KB/sample of HBM trajectory traffic avoided). Patch
    embeddings are the standard TPU idiom for conv front ends (ViT); the
    overlap the reference's Nature-CNN strides carry buys nothing on a
    synthetic splat image. The generic CNNActorCritic above remains for
    arbitrary overlapping-conv image policies on the scan trainer.

    Trunk is shared by the actor and critic heads (as the reference's CNN
    policies share their encoder — SURVEY.md §2.2 #10)."""

    act_dim: int = 4
    res: int = 24
    patch0: int = 4
    patch1: int = 2
    channels: Sequence[int] = (64, 64)
    hidden: int = 128
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs):
        x = patch_cnn_trunk(obs, self.res, self.patch0, self.patch1,
                            self.channels, self.hidden)
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
            1, kernel_init=nn.initializers.orthogonal(1.0),
            name="critic_value",
        )(x)
        return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0]


class PixelActorCritic(nn.Module):
    """13-vector obs -> on-device pixel render -> CNN actor-critic.

    Makes the CNN policy a first-class trainable configuration
    (run.policy="cnn"): the renderer (drone_tpu.pixels.obs_to_pixels) is a
    parameterless jnp function applied inside the module, so the standard
    trainer/evaluator see the usual apply(params, obs) signature while the
    encoder consumes (res, res, 4) images. Defaults are sized for the
    24x24 sensor raster (smaller kernels/strides than the Nature CNN,
    whose 8-stride-4 front end assumes 84x84 Atari frames)."""

    act_dim: int = 4
    res: int = 24
    channels: Sequence[int] = (16, 32)
    kernels: Sequence[int] = (5, 3)
    strides: Sequence[int] = (2, 2)
    hidden: int = 128
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs):
        from drone_tpu.pixels import obs_to_pixels

        img = obs_to_pixels(jnp.asarray(obs, jnp.float32), self.res)
        return CNNActorCritic(
            act_dim=self.act_dim, channels=self.channels,
            kernels=self.kernels, strides=self.strides, hidden=self.hidden,
            log_std_init=self.log_std_init, name="cnn")(img)
