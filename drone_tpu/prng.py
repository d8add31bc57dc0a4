"""Counter-based PRNG: Threefry-2x32 (20 rounds), implemented in pure jnp uint32 ops.

Why not `jax.random`? The correctness gate (BASELINE.json:5,7) is *bitwise
float32 parity* between the JAX env step and the C oracle, including the
randomized reset path. We therefore implement one explicit counter-based
generator in BOTH languages (this file and `oracle/drone_oracle.c`) so the two
paths consume literally identical random bits. Threefry-2x32 is the same
algorithm `jax.random` uses internally, is ARX-only (add/xor/rotate on
uint32), so it is TPU-friendly (no 64-bit ints, no multiplies), vmaps
trivially, and is stateless: every draw is a pure function of
(key, lane, reset_count, block).

Key discipline (mirrored in oracle/drone_oracle.c):
  lane_key(seed, lane)       = threefry2x32((seed, GOLDEN), (lane, 0))
  draw block j of episode e  = threefry2x32(lane_key, (e, j))  -> 2 uniforms
  uniform in [0, 1)          = bitcast(0x3F800000 | (bits >> 9)) - 1.0

The reference's C env uses per-process libc rand() (SURVEY.md §3.5) — a parity
hazard this design removes entirely.
"""

from __future__ import annotations

import jax.numpy as jnp

# Python ints (not jnp scalars): these get wrapped at trace time, so the
# functions below stay usable inside Pallas kernels (a kernel may not capture
# device-resident constants).
GOLDEN = 0x9E3779B9   # arbitrary fixed second key word
_PARITY = 0x1BD11BDA  # threefry key-schedule parity constant

# Rotation schedules for Threefry-2x32 (Random123).
_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32, 20 rounds. All args/results uint32 (arrays broadcast).

    Matches the standard Random123 algorithm (KAT: key=0, ctr=0 ->
    (0x6b200159, 0x99ba4efe)) and the identical C implementation in
    oracle/drone_oracle.c (drone_threefry2x32).
    """
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)
    ks = (k0, k1, _PARITY ^ k0 ^ k1)

    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    rots = (_ROT_A, _ROT_B)
    for i in range(5):
        for r in rots[i % 2]:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def bits_to_uniform(bits):
    """uint32 bits -> float32 uniform in [0, 1). Exact bit recipe as C oracle."""
    mantissa = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jnp.asarray(mantissa).view(jnp.float32) - jnp.float32(1.0)


def lane_key(seed, lane):
    """Derive a per-lane (per-drone) key from a global uint32 seed."""
    seed = jnp.asarray(seed, jnp.uint32)
    lane = jnp.asarray(lane, jnp.uint32)
    return threefry2x32(seed, GOLDEN, lane, jnp.uint32(0))


def episode_uniforms(key0, key1, episode, n_blocks, block0=0):
    """`2*n_blocks` float32 uniforms for one (lane, episode).

    Block j (j = block0 .. block0+n_blocks-1) is threefry(key, (episode, j));
    each block yields uniforms (2j, 2j+1). n_blocks/block0 are static.
    Returns an array shaped (..., 2*n_blocks) where ... broadcasts over the
    key/episode args — so it vmaps over lanes for free.
    """
    episode = jnp.asarray(episode, jnp.uint32)
    outs = []
    for j in range(block0, block0 + n_blocks):
        b0, b1 = threefry2x32(key0, key1, episode, jnp.uint32(j))
        outs.append(bits_to_uniform(b0))
        outs.append(bits_to_uniform(b1))
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# NumPy mirror (host-side helper for tests / action-stream generation).
# ---------------------------------------------------------------------------

def threefry2x32_np(k0, k1, x0, x1):
    """NumPy uint32 mirror of threefry2x32 (for host-side test fixtures)."""
    import numpy as np

    with np.errstate(over="ignore"):
        k0 = np.asarray(k0, np.uint32)
        k1 = np.asarray(k1, np.uint32)
        x0 = np.asarray(x0, np.uint32).copy()
        x1 = np.asarray(x1, np.uint32).copy()
        ks = (k0, k1, (np.uint32(0x1BD11BDA) ^ k0 ^ k1).astype(np.uint32))

        def rotl(x, r):
            return ((x << np.uint32(r)) | (x >> np.uint32(32 - r))).astype(np.uint32)

        x0 = (x0 + ks[0]).astype(np.uint32)
        x1 = (x1 + ks[1]).astype(np.uint32)
        rots = (_ROT_A, _ROT_B)
        for i in range(5):
            for r in rots[i % 2]:
                x0 = (x0 + x1).astype(np.uint32)
                x1 = rotl(x1, r)
                x1 = (x1 ^ x0).astype(np.uint32)
            x0 = (x0 + ks[(i + 1) % 3]).astype(np.uint32)
            x1 = (x1 + ks[(i + 2) % 3] + np.uint32(i + 1)).astype(np.uint32)
        return x0, x1


def bits_to_uniform_np(bits):
    import numpy as np

    mantissa = ((np.asarray(bits, np.uint32) >> np.uint32(9)) | np.uint32(0x3F800000)).astype(np.uint32)
    return mantissa.view(np.float32) - np.float32(1.0)
