"""Quadrotor rigid-body 6-DoF dynamics: derivative + Euler / RK4 integrators.

TPU-native rebuild of the reference C physics core (SURVEY.md §1 L0, §3.2:
`[U] pufferlib/ocean/drone/drone.h` inner dynamics; feature list confirmed by
BASELINE.json:5 — "rigid-body 6-DoF dynamics, rotor thrust/torque model,
quaternion attitude integration ... dynamics integrator (Euler/RK4)").

PARITY CONTRACT: every expression below is written in an explicit, fixed
evaluation order and duplicated verbatim (same association, same operation
sequence) in oracle/drone_oracle.c. Do not "simplify" an expression here
without changing the C side identically — the float32 bitwise-parity gate
(BASELINE.json:7, tests/test_parity_*.py) depends on it. Only +, -, *, /, and
sqrt are used (all correctly rounded in IEEE f32 on the CPU backend); no
transcendentals, no dot products, no FMA-able reductions left to the compiler
(the oracle is compiled with -ffp-contract=off and XLA CPU does not contract).

Rotor layout (X configuration, x forward / y left / z up, thrusts F0..F3):
    F0: front-right (+arm_l, -arm_l), spin CW  (s=-1)
    F1: front-left  (+arm_l, +arm_l), spin CCW (s=+1)
    F2: rear-right  (-arm_l, -arm_l), spin CCW (s=+1)
    F3: rear-left   (-arm_l, +arm_l), spin CW  (s=-1)
  roll  tau_x = arm_l * ((F1 + F3) - (F0 + F2))
  pitch tau_y = arm_l * ((F2 + F3) - (F0 + F1))
  yaw   tau_z = torque_coef * ((F1 + F2) - (F0 + F3))
"""

from __future__ import annotations

import jax.numpy as jnp


def deriv(pos, vel, quat, omega, thrusts, mass_eff, p):
    """Time derivative of (pos, vel, quat, omega).

    thrusts: (4,) rotor thrusts in N. mass_eff: effective (DR-scaled) mass.
    Mirrors oracle/drone_oracle.c:drone_deriv exactly.
    """
    F0 = thrusts[0]
    F1 = thrusts[1]
    F2 = thrusts[2]
    F3 = thrusts[3]
    T = F0 + F1 + F2 + F3

    qw = quat[0]
    qx = quat[1]
    qy = quat[2]
    qz = quat[3]
    # body +z axis in world frame (third column of R(q)):
    uzx = 2.0 * (qx * qz + qw * qy)
    uzy = 2.0 * (qy * qz - qw * qx)
    uzz = 1.0 - 2.0 * (qx * qx + qy * qy)

    vx = vel[0]
    vy = vel[1]
    vz = vel[2]
    Tm = T / mass_eff
    ax = Tm * uzx - p.drag_lin * vx / mass_eff
    ay = Tm * uzy - p.drag_lin * vy / mass_eff
    az = Tm * uzz - p.drag_lin * vz / mass_eff - p.gravity

    wx = omega[0]
    wy = omega[1]
    wz = omega[2]
    taux = p.arm_l * ((F1 + F3) - (F0 + F2)) - p.drag_ang * wx
    tauy = p.arm_l * ((F2 + F3) - (F0 + F1)) - p.drag_ang * wy
    tauz = p.torque_coef * ((F1 + F2) - (F0 + F3)) - p.drag_ang * wz
    # Euler's equations with diagonal inertia (gyroscopic term w x (I w)):
    wdx = (taux - (wy * (p.inertia_z * wz) - wz * (p.inertia_y * wy))) / p.inertia_x
    wdy = (tauy - (wz * (p.inertia_x * wx) - wx * (p.inertia_z * wz))) / p.inertia_y
    wdz = (tauz - (wx * (p.inertia_y * wy) - wy * (p.inertia_x * wx))) / p.inertia_z

    # qdot = 0.5 * q (x) (0, omega_body)
    s = qx * wx + qy * wy + qz * wz
    qdw = -0.5 * s
    qdx = 0.5 * (qw * wx + qy * wz - qz * wy)
    qdy = 0.5 * (qw * wy - qx * wz + qz * wx)
    qdz = 0.5 * (qw * wz + qx * wy - qy * wx)

    dpos = jnp.stack([vx, vy, vz])
    dvel = jnp.stack([ax, ay, az])
    dquat = jnp.stack([qdw, qdx, qdy, qdz])
    domega = jnp.stack([wdx, wdy, wdz])
    return dpos, dvel, dquat, domega


def normalize_quat(quat):
    """Renormalize (w,x,y,z). Mirrors oracle drone_quat_normalize."""
    qw = quat[0]
    qx = quat[1]
    qy = quat[2]
    qz = quat[3]
    n2 = qw * qw + qx * qx + qy * qy + qz * qz
    n = jnp.sqrt(n2)
    return jnp.stack([qw / n, qx / n, qy / n, qz / n])


def euler_step(pos, vel, quat, omega, thrusts, mass_eff, p):
    """One explicit Euler step; quat renormalized. Mirrors oracle euler path."""
    dpos, dvel, dquat, domega = deriv(pos, vel, quat, omega, thrusts, mass_eff, p)
    pos2 = pos + p.dt * dpos
    vel2 = vel + p.dt * dvel
    quat2 = quat + p.dt * dquat
    omega2 = omega + p.dt * domega
    return pos2, vel2, normalize_quat(quat2), omega2


def rk4_step(pos, vel, quat, omega, thrusts, mass_eff, p):
    """Classic RK4 (thrusts held constant over the step); quat renormalized at
    the end only (intermediate quats intentionally unnormalized — same as
    oracle). Combination order fixed: s + h6*(((k1 + 2*k2) + 2*k3) + k4).

    h6 is dt * (1/6 rounded to f32), NOT dt/6: XLA strength-reduces division
    by a literal constant into multiplication by its reciprocal, so we write
    the multiplication explicitly with the identical f32 constant on both
    sides (C: p->dt * (1.0f / 6.0f))."""
    h2 = p.dt * 0.5
    h6 = p.dt * (1.0 / 6.0)

    k1 = deriv(pos, vel, quat, omega, thrusts, mass_eff, p)
    s2 = (pos + h2 * k1[0], vel + h2 * k1[1], quat + h2 * k1[2], omega + h2 * k1[3])
    k2 = deriv(*s2, thrusts, mass_eff, p)
    s3 = (pos + h2 * k2[0], vel + h2 * k2[1], quat + h2 * k2[2], omega + h2 * k2[3])
    k3 = deriv(*s3, thrusts, mass_eff, p)
    s4 = (pos + p.dt * k3[0], vel + p.dt * k3[1], quat + p.dt * k3[2], omega + p.dt * k3[3])
    k4 = deriv(*s4, thrusts, mass_eff, p)

    pos2 = pos + h6 * (((k1[0] + 2.0 * k2[0]) + 2.0 * k3[0]) + k4[0])
    vel2 = vel + h6 * (((k1[1] + 2.0 * k2[1]) + 2.0 * k3[1]) + k4[1])
    quat2 = quat + h6 * (((k1[2] + 2.0 * k2[2]) + 2.0 * k3[2]) + k4[2])
    omega2 = omega + h6 * (((k1[3] + 2.0 * k2[3]) + 2.0 * k3[3]) + k4[3])
    return pos2, vel2, normalize_quat(quat2), omega2
