"""Reset randomization + per-episode domain randomization.

Rebuild of the reference's randomized reset (SURVEY.md §3.5) and the
BASELINE.json:5 "domain randomization" requirement, using the explicit
counter-based draw layout shared bit-for-bit with oracle/drone_oracle.c.

Draw layout per reset (episode e, blocks 0..RESET_BLOCKS-1 of the lane
stream; u[i] = uniform i, two per threefry block):
    u0..u2   position offset in [-pos_radius, pos_radius] around p.target
    u3..u5   velocity in [-vel_max_init, vel_max_init]
    u6..u8   rotation vector in [-rot_max_init, rot_max_init] (small-angle
             quat q = normalize(1, r/2) — transcendental-free on purpose)
    u9..u11  omega in [-omega_max_init, omega_max_init]
    u12      mass DR scale in [dr_mass_lo, dr_mass_hi]
    u13      thrust DR scale in [dr_thrust_lo, dr_thrust_hi]
    u14..u16 waypoint target (waypoint task; hover/racing consume but ignore)
    u17      unused
"""

from __future__ import annotations

import jax.numpy as jnp

from drone_tpu import prng
from drone_tpu.types import RESET_BLOCKS, WP_BLOCK0


def reset_draws(key0, key1, episode):
    """The RESET_BLOCKS*2 uniforms of a reset, shaped (..., 18)."""
    return prng.episode_uniforms(key0, key1, episode, RESET_BLOCKS)


def waypoint_draws(key0, key1, episode, wp_count):
    """4 uniforms for the wp_count-th mid-episode waypoint respawn."""
    # blocks WP_BLOCK0 + 2*wp_count and +1 (wp_count is a traced uint32, so
    # compute the block indices dynamically rather than via the static
    # block0 argument of episode_uniforms).
    j0 = jnp.uint32(WP_BLOCK0) + jnp.asarray(wp_count, jnp.uint32) * jnp.uint32(2)
    b0, b1 = prng.threefry2x32(key0, key1, jnp.asarray(episode, jnp.uint32), j0)
    b2, b3 = prng.threefry2x32(key0, key1, jnp.asarray(episode, jnp.uint32), j0 + jnp.uint32(1))
    return (
        prng.bits_to_uniform(b0),
        prng.bits_to_uniform(b1),
        prng.bits_to_uniform(b2),
        prng.bits_to_uniform(b3),
    )


def sample_waypoint(u0, u1, u2, p):
    """Waypoint target from 3 uniforms; mirrors oracle drone_sample_waypoint."""
    tx = (u0 * 2.0 - 1.0) * p.wp_box
    ty = (u1 * 2.0 - 1.0) * p.wp_box
    tz = p.wp_zmin + u2 * (p.wp_zmax - p.wp_zmin)
    return jnp.stack([tx, ty, tz])


def init_pose(u, p):
    """(pos, vel, quat, omega, dr_mass, dr_thrust) from reset uniforms u[18].

    Mirrors oracle drone_reset exactly. Requires pos_radius < target_z so the
    spawn cube stays above ground.
    """
    px = p.target[0] + (u[0] * 2.0 - 1.0) * p.pos_radius
    py = p.target[1] + (u[1] * 2.0 - 1.0) * p.pos_radius
    pz = p.target[2] + (u[2] * 2.0 - 1.0) * p.pos_radius
    vx = (u[3] * 2.0 - 1.0) * p.vel_max_init
    vy = (u[4] * 2.0 - 1.0) * p.vel_max_init
    vz = (u[5] * 2.0 - 1.0) * p.vel_max_init
    hx = (u[6] * 2.0 - 1.0) * p.rot_max_init * 0.5
    hy = (u[7] * 2.0 - 1.0) * p.rot_max_init * 0.5
    hz = (u[8] * 2.0 - 1.0) * p.rot_max_init * 0.5
    n2 = 1.0 + (hx * hx + hy * hy + hz * hz)
    n = jnp.sqrt(n2)
    qw = 1.0 / n
    qx = hx / n
    qy = hy / n
    qz = hz / n
    wx = (u[9] * 2.0 - 1.0) * p.omega_max_init
    wy = (u[10] * 2.0 - 1.0) * p.omega_max_init
    wz = (u[11] * 2.0 - 1.0) * p.omega_max_init
    dr_mass = p.dr_mass_lo + u[12] * (p.dr_mass_hi - p.dr_mass_lo)
    dr_thrust = p.dr_thrust_lo + u[13] * (p.dr_thrust_hi - p.dr_thrust_lo)
    pos = jnp.stack([px, py, pz])
    vel = jnp.stack([vx, vy, vz])
    quat = jnp.stack([qw, qx, qy, qz])
    omega = jnp.stack([wx, wy, wz])
    return pos, vel, quat, omega, dr_mass, dr_thrust
