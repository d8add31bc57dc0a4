"""In-JAX pixel observations: the camera-view drone variant.

The reference ships CNN policies for its pixel-based Ocean envs (SURVEY.md
§2.2 #10); the drone env's native observation is a 13-vector, so to make
the CNN policy a REAL, trainable capability this module renders a compact
body-frame sensor image from the state vector — entirely in jnp, on
device, differentiable, no host round trips:

  channel 0 — target splat: the target direction rotated into the body
              frame, orthographically projected, amplitude = closeness
              1/(1+distance)  (a minimal "camera" cue);
  channel 1 — artificial horizon: the world up-vector in the body frame
              (attitude), amplitude encodes uprightness;
  channel 2 — velocity splat (body frame, amplitude = speed saturation);
  channel 3 — body-rate splat (omega).

Each cue is a Gaussian blob on a res x res grid. The encoding preserves
the information the MLP sees (direction + magnitude per vector), so a CNN
policy can in principle hover; the point is an end-to-end pixel training
path through the standard trainer, not photorealism (the reference's demo
renderer is likewise a visualization, not the training observation).

`PixelActorCritic` (models/cnn.py) applies this renderer inside the
module, so the whole pixel pipeline plugs into ppo.make_train_step /
train.py unchanged (obs stays the 13-vector; pixels are an on-device
function of it).
"""

from __future__ import annotations

import jax.numpy as jnp

from drone_tpu.types import OBS_DIM


SPLAT_SIGMA = 0.18  # Gaussian splat width; shared by _splat, the CNN
                    # megakernels (ops/pallas_acting_cnn._SIGMA) and the
                    # DRNW v3 exporter (models/export.py)


def body_rotation_t(quat):
    """Rows of R^T for q=(w,x,y,z) (world->body): returns three (..., 3)
    row vectors."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y + w * z),
                    2 * (x * z - w * y)], axis=-1)
    r1 = jnp.stack([2 * (x * y - w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z + w * x)], axis=-1)
    r2 = jnp.stack([2 * (x * z + w * y), 2 * (y * z - w * x),
                    1 - 2 * (x * x + y * y)], axis=-1)
    return r0, r1, r2


def to_body(quat, v):
    """Rotate world vectors (..., 3) into the body frame."""
    r0, r1, r2 = body_rotation_t(quat)
    return jnp.stack([jnp.sum(r0 * v, -1), jnp.sum(r1 * v, -1),
                      jnp.sum(r2 * v, -1)], axis=-1)


def _splat(u, amp, res, sigma=SPLAT_SIGMA):
    """(..., 2) centers in [-1, 1] + (...,) amplitudes -> (..., res, res)."""
    lin = jnp.linspace(-1.0, 1.0, res)
    gx = lin[None, :]
    gy = lin[:, None]
    d2 = ((gx - u[..., 0, None, None]) ** 2
          + (gy - u[..., 1, None, None]) ** 2)
    return amp[..., None, None] * jnp.exp(-d2 / (2.0 * sigma * sigma))


def splat_inputs(obs):
    """(..., OBS_DIM) obs -> per-channel splat parameters
    ((u0, u1, amp) per channel, each (...,)) — the 12 scalars obs_to_pixels
    renders from. Shared by the image renderer and the CNN megakernel's
    in-kernel rematerializer (ops/pallas_acting_cnn.py), so both paths
    compute the SAME splat parameters from the same expressions."""
    rel = obs[..., 0:3]
    quat = obs[..., 3:7]
    vel = obs[..., 7:10]
    omega = obs[..., 10:13]

    rel_b = to_body(quat, rel)
    vel_b = to_body(quat, vel)
    up_b = to_body(quat, jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), rel.shape))

    def dir2(v):
        n = jnp.sqrt(jnp.sum(v * v, -1))
        return v[..., :2] / (1.0 + n)[..., None], n

    u_t, d_t = dir2(rel_b)
    u_v, d_v = dir2(vel_b)
    u_w, d_w = dir2(omega)           # omega is already body-frame rates
    return (
        (u_t[..., 0], u_t[..., 1], 1.0 / (1.0 + d_t)),
        (up_b[..., 0], up_b[..., 1], 0.5 + 0.5 * up_b[..., 2]),
        (u_v[..., 0], u_v[..., 1], d_v / (1.0 + d_v)),
        (u_w[..., 0], u_w[..., 1], d_w / (1.0 + d_w)),
    )


def patch_grid(res: int, patch: int):
    """Pixel-coordinate columns for the CNN megakernel's patch-major row
    order: returns (gx, gy), each (res*res, 1) float32, where row
    r = q * patch^2 + s holds the coordinates of within-patch offset
    s = di*patch + dj of patch q = qi*(res//patch) + qj (pixel
    i = qi*patch + di, j = qj*patch + dj) — patch q's pixels are the
    contiguous row block [q*patch^2, (q+1)*patch^2). Values are gathered
    from the SAME jnp.linspace obs_to_pixels uses, so a pixel's
    coordinates are bitwise identical in both layouts."""
    import numpy as np

    g = res // patch
    lin = jnp.linspace(-1.0, 1.0, res)
    s = np.arange(patch * patch)
    q = np.arange(g * g)
    di, dj = s // patch, s % patch
    qi, qj = q // g, q % g
    i = (qi[:, None] * patch + di[None, :]).reshape(-1)   # r = q*patch^2 + s
    j = (qj[:, None] * patch + dj[None, :]).reshape(-1)
    # _splat's d2 uses gx along the row axis's second coordinate u[...,0]
    # with gx = lin[None, :] (x varies along axis -1 = j) and gy along i
    return (lin[jnp.asarray(j)].reshape(-1, 1),
            lin[jnp.asarray(i)].reshape(-1, 1))


def obs_to_pixels(obs, res: int = 24):
    """(..., OBS_DIM) observation vectors -> (..., res, res, 4) images."""
    assert obs.shape[-1] == OBS_DIM, obs.shape
    chans = [_splat(jnp.stack([u0, u1], axis=-1), amp, res)
             for u0, u1, amp in splat_inputs(obs)]
    return jnp.stack(chans, axis=-1)
