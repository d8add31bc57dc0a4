"""Shared test utilities: state packing, deterministic action streams."""

from __future__ import annotations

import numpy as np

from drone_tpu.prng import bits_to_uniform_np, threefry2x32_np


def pack_fstate(s) -> np.ndarray:
    """EnvState -> flat float32 vector in the oracle's fstate layout."""
    return np.concatenate(
        [
            np.asarray(s.pos, np.float32),
            np.asarray(s.vel, np.float32),
            np.asarray(s.quat, np.float32),
            np.asarray(s.omega, np.float32),
            np.asarray(s.target, np.float32),
            np.atleast_1d(np.asarray(s.dr_mass, np.float32)),
            np.atleast_1d(np.asarray(s.dr_thrust, np.float32)),
            np.atleast_1d(np.asarray(s.ep_return, np.float32)),
        ]
    ).astype(np.float32)


def pack_fstate_batch(s) -> np.ndarray:
    """Batched EnvState -> (N, 19) float32."""
    return np.concatenate(
        [
            np.asarray(s.pos, np.float32),
            np.asarray(s.vel, np.float32),
            np.asarray(s.quat, np.float32),
            np.asarray(s.omega, np.float32),
            np.asarray(s.target, np.float32),
            np.asarray(s.dr_mass, np.float32)[:, None],
            np.asarray(s.dr_thrust, np.float32)[:, None],
            np.asarray(s.ep_return, np.float32)[:, None],
        ],
        axis=1,
    ).astype(np.float32)


def action_stream(T: int, n: int = 1, seed: int = 7, scale: float = 0.3,
                  bias: float = -0.1) -> np.ndarray:
    """Deterministic float32 pseudo-random actions shaped (T, n, 4) (or (T, 4)
    when n == 1): identical input stream for oracle and JAX paths."""
    total = T * n * 4
    blocks = (total + 1) // 2
    bits = np.zeros(2 * blocks, np.uint32)
    for j in range(blocks):
        b0, b1 = threefry2x32_np(seed, 0x5EED, j, 0)
        bits[2 * j] = b0
        bits[2 * j + 1] = b1
    u = bits_to_uniform_np(bits[:total])
    a = ((u * 2 - 1) * scale + bias).astype(np.float32)
    if n == 1:
        return a.reshape(T, 4)
    return a.reshape(T, n, 4)


def bitwise_equal(a: np.ndarray, b: np.ndarray) -> bool:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return a.shape == b.shape and np.array_equal(a.view(np.uint32), b.view(np.uint32))
