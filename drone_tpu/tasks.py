"""Task logic: reward shaping, crash/termination, waypoint/gate progression.

Rebuild of the reference env logic (SURVEY.md §1 L0 component #2, §3.2 steps
4-5; BASELINE.json:5 "observation/reward computation (hover error, waypoint
tracking, crash termination) ... task logic (hover/waypoint/racing)").

PARITY CONTRACT: expression order mirrors oracle/drone_oracle.c exactly.
Reward uses only +,-,*,/ (no transcendentals) so C and XLA agree bitwise:
    r = 1/(1 + d2) - c_vel*|v|^2 - c_spin*|w|^2 - c_act*|a|^2
      (+ reach_bonus on waypoint/gate reach) (+ crash_penalty on crash)
"""

from __future__ import annotations

import jax.numpy as jnp


def reward_base(pos, vel, omega, action, target, p):
    """Dense shaping reward; returns (reward, squared distance to target)."""
    dx = target[0] - pos[0]
    dy = target[1] - pos[1]
    dz = target[2] - pos[2]
    d2 = dx * dx + dy * dy + dz * dz
    r = 1.0 / (1.0 + d2)
    v2 = vel[0] * vel[0] + vel[1] * vel[1] + vel[2] * vel[2]
    r = r - p.c_vel * v2
    w2 = omega[0] * omega[0] + omega[1] * omega[1] + omega[2] * omega[2]
    r = r - p.c_spin * w2
    a2 = action[0] * action[0] + action[1] * action[1] + action[2] * action[2] + action[3] * action[3]
    r = r - p.c_act * a2
    return r, d2


def check_crash(pos, quat, p):
    """Crash = hit ground, excessive tilt, or out of bounds."""
    upz = 1.0 - 2.0 * (quat[1] * quat[1] + quat[2] * quat[2])
    crashed = (pos[2] < 0.0)
    crashed = crashed | (upz < p.tilt_min)
    crashed = crashed | (jnp.abs(pos[0]) > p.bound)
    crashed = crashed | (jnp.abs(pos[1]) > p.bound)
    crashed = crashed | (pos[2] > p.bound)
    return crashed


def observation(pos, vel, quat, omega, target):
    """(OBS_DIM,) = target-relative position, quat, vel, omega (all raw)."""
    return jnp.stack(
        [
            target[0] - pos[0],
            target[1] - pos[1],
            target[2] - pos[2],
            quat[0],
            quat[1],
            quat[2],
            quat[3],
            vel[0],
            vel[1],
            vel[2],
            omega[0],
            omega[1],
            omega[2],
        ]
    )
