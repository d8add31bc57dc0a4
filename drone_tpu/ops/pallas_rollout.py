"""Pallas rollout megakernel: T env steps per HBM round trip.

The scan-based rollout (drone_tpu.rollout / ppo) reads and writes the full
fleet state from HBM on every step — ~200 B/lane/step of traffic for ~1.5k
ALU ops, leaving the VPU underfed. This kernel keeps each block of lanes
resident in VMEM for the whole horizon: the grid tiles the fleet into
(R=LANES_PER_BLOCK/128, 128) planes, a fori_loop advances T steps entirely
on-chip (motor mixing -> Euler/RK4 -> task reward/progression -> termination
-> branch-free auto-reset with the SAME threefry-2x32 counter streams as
drone_tpu.prng and oracle/drone_oracle.c), and HBM is touched once per block.

Covers every task (hover / waypoint / racing) x integrator (euler / rk4)
combination. The math mirrors drone_tpu.{mixing,dynamics,tasks,randomize,env}
line for line; the unit tests check bitwise f32 equality against
vmap(env.step) on the CPU backend for all six combinations.

Two action sources:
  - actions=None: on-chip uniform random actions in [-1,1] from the lane's
    threefry stream at block index ACTION_BLOCK0 + 2*step, where step is the
    lane's carried episode-step counter (distinct from the reset stream;
    collision-free across chained kernel calls; regenerated, never stored —
    this is the pure env-engine throughput measurement, the analogue of the
    reference's env SPS bench)
  - actions=(T, N, 4) f32: a provided action stream (parity tests).

Reference: SURVEY.md §2.2 #1-2 (the C hot loop this replaces at speed of
light); /opt/skills/guides/pallas_guide.md (kernel idioms used here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drone_tpu import prng
from drone_tpu.types import (
    MAX_GATES,
    OBS_DIM,
    WP_BLOCK0,
    EnvParams,
    EnvState,
    EnvStatics,
)

# float32 state planes (matches the oracle fstate layout, types.py:33)
F_PX, F_PY, F_PZ = 0, 1, 2
F_VX, F_VY, F_VZ = 3, 4, 5
F_QW, F_QX, F_QY, F_QZ = 6, 7, 8, 9
F_WX, F_WY, F_WZ = 10, 11, 12
F_TX, F_TY, F_TZ = 13, 14, 15
F_DRM, F_DRT, F_EPRET = 16, 17, 18
NF = 19

# uint32 planes: [reset_count, key0, key1, wp_count]
NU = 4
# int32 planes: [step, gate_idx]
NI = 2
ACTION_BLOCK0 = 0x40000000  # in-kernel action stream block offset

# f32 scalar params in SMEM order (+ target xyz + gates flat)
_PF = ("mass", "gravity", "arm_l", "thrust_max", "torque_coef",
       "inertia_x", "inertia_y", "inertia_z", "drag_lin", "drag_ang", "dt",
       "bound", "tilt_min", "c_vel", "c_spin", "c_act", "crash_penalty",
       "reach_bonus", "reach_tol2",
       "pos_radius", "vel_max_init", "rot_max_init", "omega_max_init",
       "dr_mass_lo", "dr_mass_hi", "dr_thrust_lo", "dr_thrust_hi",
       "wp_box", "wp_zmin", "wp_zmax")
_NP = len(_PF) + 3 + 3 * MAX_GATES  # + target xyz + gate centers


def _pack_params(p: EnvParams):
    vals = ([getattr(p, k) for k in _PF]
            + [p.target[0], p.target[1], p.target[2]]
            + [p.gates[g, c] for g in range(MAX_GATES) for c in range(3)])
    pf = jnp.stack([jnp.asarray(v, jnp.float32) for v in vals]).reshape(1, _NP)
    pi = jnp.stack([jnp.asarray(p.horizon, jnp.int32),
                    jnp.asarray(p.n_gates, jnp.int32)]).reshape(1, 2)
    return pf, pi


def pack_state(s: EnvState, rows: int):
    """Batched EnvState (N leading) -> (fs (NF,rows,128) f32, us (NU,rows,128)
    u32, st (NI,rows,128) i32). N must equal rows*128."""
    def plane(x, dt):
        return jnp.asarray(x, dt).reshape(rows, 128)

    fs = jnp.stack([
        plane(s.pos[:, 0], jnp.float32), plane(s.pos[:, 1], jnp.float32),
        plane(s.pos[:, 2], jnp.float32),
        plane(s.vel[:, 0], jnp.float32), plane(s.vel[:, 1], jnp.float32),
        plane(s.vel[:, 2], jnp.float32),
        plane(s.quat[:, 0], jnp.float32), plane(s.quat[:, 1], jnp.float32),
        plane(s.quat[:, 2], jnp.float32), plane(s.quat[:, 3], jnp.float32),
        plane(s.omega[:, 0], jnp.float32), plane(s.omega[:, 1], jnp.float32),
        plane(s.omega[:, 2], jnp.float32),
        plane(s.target[:, 0], jnp.float32), plane(s.target[:, 1], jnp.float32),
        plane(s.target[:, 2], jnp.float32),
        plane(s.dr_mass, jnp.float32), plane(s.dr_thrust, jnp.float32),
        plane(s.ep_return, jnp.float32),
    ])
    us = jnp.stack([plane(s.reset_count, jnp.uint32),
                    plane(s.key0, jnp.uint32), plane(s.key1, jnp.uint32),
                    plane(s.wp_count, jnp.uint32)])
    st = jnp.stack([plane(s.step, jnp.int32), plane(s.gate_idx, jnp.int32)])
    return fs, us, st


def unpack_state(fs, us, st) -> EnvState:
    """Inverse of pack_state."""
    n = fs.shape[1] * 128
    flat = lambda x: x.reshape(n)
    v3 = lambda a, b, c: jnp.stack([flat(fs[a]), flat(fs[b]), flat(fs[c])], -1)
    return EnvState(
        pos=v3(F_PX, F_PY, F_PZ),
        vel=v3(F_VX, F_VY, F_VZ),
        quat=jnp.stack([flat(fs[F_QW]), flat(fs[F_QX]), flat(fs[F_QY]),
                        flat(fs[F_QZ])], -1),
        omega=v3(F_WX, F_WY, F_WZ),
        target=v3(F_TX, F_TY, F_TZ),
        dr_mass=flat(fs[F_DRM]),
        dr_thrust=flat(fs[F_DRT]),
        ep_return=flat(fs[F_EPRET]),
        step=flat(st[0]),
        reset_count=flat(us[0]),
        wp_count=flat(us[3]),
        gate_idx=flat(st[1]),
        key0=flat(us[1]),
        key1=flat(us[2]),
    )


def _uniform(bits):
    m = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return pltpu.bitcast(m, jnp.float32) - jnp.float32(1.0)


def pick_lanes_per_block(n: int, cap: int = 8192) -> int:
    """Largest multiple of 128 that divides n and is <= cap, PREFERRING
    multiples of 1024: Mosaic rejects the (L,) -> (rb, 128) reshapes the
    policy kernels do unless rb % 8 == 0 (measured on v5e: rb=4 and rb=9
    fail `infer-vector-layout: unsupported shape cast`, rb=8 compiles), so
    a 1024-aligned block is required for COMPILED runs; 128-aligned blocks
    remain available for interpret-mode tests on small batches. n must be a
    multiple of 128. n%128==0 does NOT imply n%8192==0 — callers that
    hardcoded min(8192, n) crashed on e.g. n=8320."""
    assert n % 128 == 0, n
    for k in range(min(cap, n) // 1024, 0, -1):
        if n % (k * 1024) == 0:
            return k * 1024
    for k in range(min(cap, n) // 128, 0, -1):
        if n % (k * 128) == 0:
            return k * 128
    return 128


def check_compiled_lane_block(lanes_per_block: int, n: int, interpret: bool):
    """THE compiled-mode lane-block precondition (one copy for every policy
    kernel entry point): Mosaic needs rb % 8 == 0 for the (L,) -> (rb, 128)
    reshapes, i.e. 1024-aligned blocks — raise an actionable error instead
    of a Mosaic layout failure."""
    if not interpret and lanes_per_block % 1024:
        raise ValueError(
            f"compiled policy kernels need 1024-aligned lane blocks "
            f"(Mosaic reshape rule; got lanes_per_block={lanes_per_block} "
            f"from n={n}). Use a batch with a 1024-multiple divisor, or "
            f"interpret=True for small CPU runs.")


def obs_matrix(c, L):
    """tasks.observation in plane space: carry tuple -> (OBS_DIM, L) matrix
    (shared by the acting kernels so the obs layout lives in ONE place)."""
    (px, py, pz, vx, vy, vz, qw, qx, qy, qz, wx, wy, wz, tx, ty, tz) = c[:16]
    return jnp.stack([tx - px, ty - py, tz - pz, qw, qx, qy, qz,
                      vx, vy, vz, wx, wy, wz]).reshape(OBS_DIM, L)


class _P:
    """Named scalar access into the packed param row (trace-time sugar)."""

    def __init__(self, pf_ref, pi_ref):
        for i, k in enumerate(_PF):
            setattr(self, k, pf_ref[0, i])
        base = len(_PF)
        self.tgx = pf_ref[0, base]
        self.tgy = pf_ref[0, base + 1]
        self.tgz = pf_ref[0, base + 2]
        self.gates = [
            (pf_ref[0, base + 3 + 3 * g], pf_ref[0, base + 4 + 3 * g],
             pf_ref[0, base + 5 + 3 * g])
            for g in range(MAX_GATES)
        ]
        self.horizon = pi_ref[0, 0]
        self.n_gates = pi_ref[0, 1]


def _deriv(px, py, pz, vx, vy, vz, qw, qx, qy, qz, wx, wy, wz,
           F0, F1, F2, F3, mass_eff, P):
    """dynamics.deriv on planes — identical expression order."""
    del px, py, pz
    T = F0 + F1 + F2 + F3
    uzx = 2.0 * (qx * qz + qw * qy)
    uzy = 2.0 * (qy * qz - qw * qx)
    uzz = 1.0 - 2.0 * (qx * qx + qy * qy)
    Tm = T / mass_eff
    ax = Tm * uzx - P.drag_lin * vx / mass_eff
    ay = Tm * uzy - P.drag_lin * vy / mass_eff
    az = Tm * uzz - P.drag_lin * vz / mass_eff - P.gravity
    taux = P.arm_l * ((F1 + F3) - (F0 + F2)) - P.drag_ang * wx
    tauy = P.arm_l * ((F2 + F3) - (F0 + F1)) - P.drag_ang * wy
    tauz = P.torque_coef * ((F1 + F2) - (F0 + F3)) - P.drag_ang * wz
    wdx = (taux - (wy * (P.inertia_z * wz) - wz * (P.inertia_y * wy))) / P.inertia_x
    wdy = (tauy - (wz * (P.inertia_x * wx) - wx * (P.inertia_z * wz))) / P.inertia_y
    wdz = (tauz - (wx * (P.inertia_y * wy) - wy * (P.inertia_x * wx))) / P.inertia_z
    s = qx * wx + qy * wy + qz * wz
    qdw = -0.5 * s
    qdx = 0.5 * (qw * wx + qy * wz - qz * wy)
    qdy = 0.5 * (qw * wy - qx * wz + qz * wx)
    qdz = 0.5 * (qw * wz + qx * wy - qy * wx)
    return (vx, vy, vz, ax, ay, az, qdw, qdx, qdy, qdz, wdx, wdy, wdz)


def _normalize_quat(nqw, nqx, nqy, nqz):
    # NUMERICS NOTE (measured on v5e): Mosaic strength-reduces x/sqrt(y) to
    # its own rsqrt+refine sequence, 1-4 ulp from the correctly-rounded
    # result; XLA:TPU approximates it differently (3 ulp from host). Neither
    # a maximum() wrapper nor a VMEM store/load round trip blocks the fusion
    # (store-to-load forwarding). The kernel therefore agrees with the XLA
    # path bitwise in interpret mode (and on XLA:CPU) and to a few ulp (quat
    # fields only) compiled on TPU; the oracle parity contract lives on the
    # CPU backend and is untouched by this.
    n2 = nqw * nqw + nqx * nqx + nqy * nqy + nqz * nqz
    n = jnp.sqrt(n2)
    return nqw / n, nqx / n, nqy / n, nqz / n


def _integrate(state13, F0, F1, F2, F3, mass_eff, P, integrator):
    """dynamics.euler_step / rk4_step on planes — identical combination
    order (see dynamics.py for why h6 is dt * (1/6))."""
    if integrator == "euler":
        d = _deriv(*state13, F0, F1, F2, F3, mass_eff, P)
        out = tuple(s + P.dt * ds for s, ds in zip(state13, d))
    else:
        h2 = P.dt * 0.5
        h6 = P.dt * (1.0 / 6.0)
        k1 = _deriv(*state13, F0, F1, F2, F3, mass_eff, P)
        s2 = tuple(s + h2 * k for s, k in zip(state13, k1))
        k2 = _deriv(*s2, F0, F1, F2, F3, mass_eff, P)
        s3 = tuple(s + h2 * k for s, k in zip(state13, k2))
        k3 = _deriv(*s3, F0, F1, F2, F3, mass_eff, P)
        s4 = tuple(s + P.dt * k for s, k in zip(state13, k3))
        k4 = _deriv(*s4, F0, F1, F2, F3, mass_eff, P)
        out = tuple(
            s + h6 * (((a + 2.0 * b) + 2.0 * c) + d_)
            for s, a, b, c, d_ in zip(state13, k1, k2, k3, k4)
        )
    (px2, py2, pz2, vx2, vy2, vz2, nqw, nqx, nqy, nqz, wx2, wy2, wz2) = out
    qw2, qx2, qy2, qz2 = _normalize_quat(nqw, nqx, nqy, nqz)
    return px2, py2, pz2, vx2, vy2, vz2, qw2, qx2, qy2, qz2, wx2, wy2, wz2


def _gate_target(gi, P):
    """target = p.gates[gi] as an 8-way select chain (gates are SMEM
    scalars; per-lane table lookup on the VPU)."""
    tx = jnp.zeros_like(gi, jnp.float32) + P.gates[0][0]
    ty = jnp.zeros_like(gi, jnp.float32) + P.gates[0][1]
    tz = jnp.zeros_like(gi, jnp.float32) + P.gates[0][2]
    for g in range(1, MAX_GATES):
        sel = gi == jnp.int32(g)
        tx = jnp.where(sel, P.gates[g][0], tx)
        ty = jnp.where(sel, P.gates[g][1], ty)
        tz = jnp.where(sel, P.gates[g][2], tz)
    return tx, ty, tz


def _sample_waypoint(u0, u1, u2, P):
    # randomize.sample_waypoint
    tx = (u0 * 2.0 - 1.0) * P.wp_box
    ty = (u1 * 2.0 - 1.0) * P.wp_box
    tz = P.wp_zmin + u2 * (P.wp_zmax - P.wp_zmin)
    return tx, ty, tz


def _fresh_state(k0, k1, e2, P, task):
    """env.reset_state on planes: randomize.init_pose draws + task target.
    Computes only the threefry blocks the task consumes (XLA DCEs the same
    blocks in the scan path)."""
    n_blocks = 9 if task == "waypoint" else 7
    us = []
    for j in range(n_blocks):
        b0, b1 = prng.threefry2x32(k0, k1, e2, jnp.uint32(j))
        us.append(_uniform(b0))
        us.append(_uniform(b1))
    fpx = P.tgx + (us[0] * 2.0 - 1.0) * P.pos_radius
    fpy = P.tgy + (us[1] * 2.0 - 1.0) * P.pos_radius
    fpz = P.tgz + (us[2] * 2.0 - 1.0) * P.pos_radius
    fvx = (us[3] * 2.0 - 1.0) * P.vel_max_init
    fvy = (us[4] * 2.0 - 1.0) * P.vel_max_init
    fvz = (us[5] * 2.0 - 1.0) * P.vel_max_init
    hx = (us[6] * 2.0 - 1.0) * P.rot_max_init * 0.5
    hy = (us[7] * 2.0 - 1.0) * P.rot_max_init * 0.5
    hz = (us[8] * 2.0 - 1.0) * P.rot_max_init * 0.5
    fn2 = 1.0 + (hx * hx + hy * hy + hz * hz)
    fn = jnp.sqrt(fn2)  # same few-ulp Mosaic rsqrt note as _normalize_quat
    fqw = 1.0 / fn
    fqx = hx / fn
    fqy = hy / fn
    fqz = hz / fn
    fwx = (us[9] * 2.0 - 1.0) * P.omega_max_init
    fwy = (us[10] * 2.0 - 1.0) * P.omega_max_init
    fwz = (us[11] * 2.0 - 1.0) * P.omega_max_init
    fdrm = P.dr_mass_lo + us[12] * (P.dr_mass_hi - P.dr_mass_lo)
    fdrt = P.dr_thrust_lo + us[13] * (P.dr_thrust_hi - P.dr_thrust_lo)
    if task == "hover":
        shape = fpx.shape
        ftx = jnp.full(shape, P.tgx, jnp.float32)
        fty = jnp.full(shape, P.tgy, jnp.float32)
        ftz = jnp.full(shape, P.tgz, jnp.float32)
    elif task == "waypoint":
        ftx, fty, ftz = _sample_waypoint(us[14], us[15], us[16], P)
    else:  # racing: first gate
        shape = fpx.shape
        ftx = jnp.full(shape, P.gates[0][0], jnp.float32)
        fty = jnp.full(shape, P.gates[0][1], jnp.float32)
        ftz = jnp.full(shape, P.gates[0][2], jnp.float32)
    return (fpx, fpy, fpz, fvx, fvy, fvz, fqw, fqx, fqy, fqz,
            fwx, fwy, fwz, ftx, fty, ftz, fdrm, fdrt)


def _env_step(c, a0, a1, a2, a3, P, task, integrator):
    """One env step on (R,128) planes. Mirrors env.step exactly:
    mixing.mix -> dynamics integrate -> tasks.reward_base -> task
    progression -> tasks.check_crash -> auto-reset select."""
    (px, py, pz, vx, vy, vz, qw, qx, qy, qz, wx, wy, wz, tx, ty, tz,
     drm, drt, epret, stp, wp, gi, rc, k0, k1) = c

    mass_eff = P.mass * drm
    # mixing.mix
    def thr(a):
        f = (a + 1.0) * 0.5
        f = jnp.minimum(jnp.maximum(f, 0.0), 1.0)
        return f * P.thrust_max * drt

    F0, F1, F2, F3 = thr(a0), thr(a1), thr(a2), thr(a3)
    (px2, py2, pz2, vx2, vy2, vz2, qw2, qx2, qy2, qz2, wx2, wy2, wz2) = \
        _integrate((px, py, pz, vx, vy, vz, qw, qx, qy, qz, wx, wy, wz),
                   F0, F1, F2, F3, mass_eff, P, integrator)

    step2 = stp + jnp.int32(1)
    # tasks.reward_base against the CURRENT target (pre-progression)
    dx = tx - px2
    dy = ty - py2
    dz = tz - pz2
    d2 = dx * dx + dy * dy + dz * dz
    r = 1.0 / (1.0 + d2)
    v2 = vx2 * vx2 + vy2 * vy2 + vz2 * vz2
    r = r - P.c_vel * v2
    w2 = wx2 * wx2 + wy2 * wy2 + wz2 * wz2
    r = r - P.c_spin * w2
    aa = a0 * a0 + a1 * a1 + a2 * a2 + a3 * a3
    r = r - P.c_act * aa

    # --- task progression (mirrors env.step order) -------------------------
    tx2, ty2, tz2 = tx, ty, tz
    wp2, gi2 = wp, gi
    if task == "waypoint":
        reached = d2 < P.reach_tol2
        r = jnp.where(reached, r + P.reach_bonus, r)
        # randomize.waypoint_draws: blocks WP_BLOCK0 + 2*wp, +1 of episode rc
        j0 = jnp.uint32(WP_BLOCK0) + wp * jnp.uint32(2)
        b0, b1 = prng.threefry2x32(k0, k1, rc, j0)
        b2, _ = prng.threefry2x32(k0, k1, rc, j0 + jnp.uint32(1))
        ntx, nty, ntz = _sample_waypoint(
            _uniform(b0), _uniform(b1), _uniform(b2), P
        )
        tx2 = jnp.where(reached, ntx, tx)
        ty2 = jnp.where(reached, nty, ty)
        tz2 = jnp.where(reached, ntz, tz)
        wp2 = wp + jnp.where(reached, jnp.uint32(1), jnp.uint32(0))
    elif task == "racing":
        reached = d2 < P.reach_tol2
        r = jnp.where(reached, r + P.reach_bonus, r)
        gate_next = jnp.mod(gi + jnp.int32(1),
                            jnp.maximum(P.n_gates, jnp.int32(1)))
        gi2 = jnp.where(reached, gate_next, gi)
        tx2, ty2, tz2 = _gate_target(gi2, P)
        wp2 = wp + jnp.where(reached, jnp.uint32(1), jnp.uint32(0))

    # tasks.check_crash
    upz = 1.0 - 2.0 * (qx2 * qx2 + qy2 * qy2)
    crashed = (pz2 < 0.0)
    crashed = crashed | (upz < P.tilt_min)
    crashed = crashed | (jnp.abs(px2) > P.bound)
    crashed = crashed | (jnp.abs(py2) > P.bound)
    crashed = crashed | (pz2 > P.bound)
    truncated = (step2 >= P.horizon) & jnp.logical_not(crashed)
    done = crashed | truncated
    r = jnp.where(crashed, r + P.crash_penalty, r)
    epret2 = epret + r

    e2 = rc + jnp.uint32(1)
    fresh = _fresh_state(k0, k1, e2, P, task)

    w = lambda f, cont: jnp.where(done, f, cont)
    zf = jnp.float32(0.0)
    cont = (px2, py2, pz2, vx2, vy2, vz2, qw2, qx2, qy2, qz2,
            wx2, wy2, wz2, tx2, ty2, tz2, drm, drt)
    c2 = tuple(w(f, s) for f, s in zip(fresh, cont)) + (
        w(zf, epret2),
        jnp.where(done, jnp.int32(0), step2),
        jnp.where(done, jnp.uint32(0), wp2),
        jnp.where(done, jnp.int32(0), gi2),
        jnp.where(done, e2, rc), k0, k1,
    )
    return c2, r, done, epret2, step2


def read_carry(fs_ref, us_ref, st_ref):
    """Kernel prologue: state planes -> the canonical carry tuple (shared
    with pallas_acting so the slot layout lives in ONE place)."""
    return tuple(fs_ref[k] for k in range(NF)) + (
        st_ref[0], us_ref[3], st_ref[1], us_ref[0], us_ref[1], us_ref[2],
    )


N_STATS = 5  # reward, episodes, ep_return, ep_length, ep_return^2


def accumulate(acc, r, done, epret2, step2):
    """Per-step stats accumulation (N_STATS planes; ep_return^2 enables
    episode-return variance without storing per-episode data)."""
    donef = done.astype(jnp.float32)
    ep_ret = jnp.where(done, epret2, 0.0)
    return (acc[0] + r,
            acc[1] + donef,
            acc[2] + ep_ret,
            acc[3] + donef * step2.astype(jnp.float32),
            acc[4] + ep_ret * ep_ret)


def write_back(c, acc, ofs_ref, ous_ref, ost_ref, stats_ref):
    """Kernel epilogue: carry tuple -> output planes (inverse of
    read_carry) + per-lane stat accumulators (the caller reduces; scalar
    SMEM outputs would violate the (8, 128)-divisible block rule)."""
    for k in range(NF):
        ofs_ref[k] = c[k]
    ost_ref[0] = c[NF]      # step
    ous_ref[3] = c[NF + 1]  # wp_count
    ost_ref[1] = c[NF + 2]  # gate_idx
    ous_ref[0] = c[NF + 3]  # reset_count
    ous_ref[1] = c[NF + 4]  # key0
    ous_ref[2] = c[NF + 5]  # key1
    for i in range(N_STATS):
        stats_ref[i] = acc[i]


def _rollout_kernel(pf_ref, pi_ref, fs_ref, us_ref, st_ref, act_ref,
                    ofs_ref, ous_ref, ost_ref, stats_ref,
                    *, T, with_actions, task, integrator):
    P = _P(pf_ref, pi_ref)

    c0 = read_carry(fs_ref, us_ref, st_ref)
    shape = c0[0].shape
    zero = jnp.zeros(shape, jnp.float32)
    acc0 = (zero,) * N_STATS

    def body(t, carry):
        c, acc = carry
        rc, k0, k1 = c[22], c[23], c[24]
        if with_actions:
            a0 = act_ref[t, 0]
            a1 = act_ref[t, 1]
            a2 = act_ref[t, 2]
            a3 = act_ref[t, 3]
        else:
            # per-lane action stream at blocks ACTION_BLOCK0 + 2*step (+1):
            # keyed on the lane's CARRIED episode-step counter, not the loop
            # index, so chained kernel calls never re-consume a (episode,
            # block) counter (step resets with the episode, whose rc bump
            # refreshes the whole stream)
            stp = c[19]
            jb = (jnp.uint32(ACTION_BLOCK0)
                  + jnp.uint32(2) * stp.astype(jnp.uint32))
            b0, b1 = prng.threefry2x32(k0, k1, rc, jb)
            b2, b3 = prng.threefry2x32(k0, k1, rc, jb + jnp.uint32(1))
            a0 = _uniform(b0) * 2.0 - 1.0
            a1 = _uniform(b1) * 2.0 - 1.0
            a2 = _uniform(b2) * 2.0 - 1.0
            a3 = _uniform(b3) * 2.0 - 1.0
        c2, r, done, epret2, step2 = _env_step(c, a0, a1, a2, a3, P,
                                               task, integrator)
        return c2, accumulate(acc, r, done, epret2, step2)

    c, acc = jax.lax.fori_loop(0, T, body, (c0, acc0))
    write_back(c, acc, ofs_ref, ous_ref, ost_ref, stats_ref)


@functools.partial(
    jax.jit,
    static_argnames=("T", "lanes_per_block", "task", "integrator", "interpret"),
    donate_argnums=(0,),
)
def _run(state, params, actions, *, T, lanes_per_block, task, integrator,
         interpret=False):
    n = state.pos.shape[0]
    fs, us, st = pack_state(state, n // 128)
    pf, pi = _pack_params(params)
    if actions is not None:
        actions = jnp.asarray(actions, jnp.float32).transpose(0, 2, 1).reshape(
            T, 4, n // 128, 128
        )
    rows_total = fs.shape[1]
    rb = lanes_per_block // 128
    n_blocks = rows_total // rb
    if actions is None:
        with_actions = False
        act = jnp.zeros((1, 4, rb, 128), jnp.float32)  # placeholder
        act_spec = pl.BlockSpec((1, 4, rb, 128), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        with_actions = True
        act = actions
        act_spec = pl.BlockSpec((T, 4, rb, 128), lambda i: (0, 0, i, 0),
                                memory_space=pltpu.VMEM)

    kernel = functools.partial(_rollout_kernel, T=T, with_actions=with_actions,
                               task=task, integrator=integrator)
    out_shapes = (
        jax.ShapeDtypeStruct(fs.shape, jnp.float32),
        jax.ShapeDtypeStruct(us.shape, jnp.uint32),
        jax.ShapeDtypeStruct(st.shape, jnp.int32),
        jax.ShapeDtypeStruct((N_STATS, rows_total, 128), jnp.float32),
    )
    plane_spec = lambda nf: pl.BlockSpec((nf, rb, 128), lambda i: (0, i, 0),
                                         memory_space=pltpu.VMEM)
    ofs, ous, ost, stats = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, _NP), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            plane_spec(NF),
            plane_spec(NU),
            plane_spec(NI),
            act_spec,
        ],
        out_specs=(
            plane_spec(NF),
            plane_spec(NU),
            plane_spec(NI),
            plane_spec(N_STATS),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(pf, pi, fs, us, st, act)
    return unpack_state(ofs, ous, ost), jnp.sum(stats, axis=(1, 2))


def _stats_dict(stats):
    return {
        "reward_sum": stats[0],
        "episodes": stats[1],
        "ep_return_sum": stats[2],
        "ep_length_sum": stats[3],
        "ep_return_sq_sum": stats[4],
    }


def rollout_pallas(state: EnvState, params: EnvParams, statics: EnvStatics,
                   T: int, actions=None, lanes_per_block: int = 8192,
                   interpret: bool = False):
    """Run T env steps entirely in VMEM (any task, any integrator).

    state: batched EnvState with N = k * lanes_per_block lanes.
    actions: None (on-chip RNG stream) or (T, N, 4) float32.
    interpret: run through the Pallas interpreter (XLA ops, no Mosaic) —
    bitwise-identical to the scan path on the CPU backend; used by the
    logic-equivalence tests.
    Returns (final EnvState, stats dict with reward_sum / episodes /
    ep_return_sum / ep_length_sum)."""
    n = state.pos.shape[0]
    lanes_per_block = pick_lanes_per_block(n, lanes_per_block)

    # A provided action stream lives in VMEM for the whole kernel (the
    # BlockSpec pins (T, 4, lanes_per_block) floats per block), so long
    # horizons must be streamed as host-side time chunks — each chunk is a
    # separate kernel launch continuing from the previous final state, which
    # is exactly equivalent because the kernel is sequential in time.
    ACT_VMEM_BUDGET = 4 * 1024 * 1024  # bytes of VMEM for the action stream
    if actions is None:
        chunk = T
    else:
        chunk = max(1, min(T, ACT_VMEM_BUDGET // (lanes_per_block * 4 * 4)))

    run = functools.partial(_run, lanes_per_block=lanes_per_block,
                            task=statics.task, integrator=statics.integrator,
                            interpret=interpret)
    if chunk >= T:
        final, stats = run(state, params, actions, T=T)
    else:
        stats = jnp.zeros(N_STATS, jnp.float32)
        final = state
        for t0 in range(0, T, chunk):
            tc = min(chunk, T - t0)
            final, s = run(final, params, actions[t0:t0 + tc], T=tc)
            stats = stats + s
    return final, _stats_dict(stats)


def rollout_hover_pallas(state: EnvState, params: EnvParams, T: int,
                         actions=None, lanes_per_block: int = 8192,
                         interpret: bool = False):
    """Hover/Euler convenience wrapper around rollout_pallas (the benchmark
    configuration)."""
    return rollout_pallas(state, params, EnvStatics("hover", "euler"), T,
                          actions=actions, lanes_per_block=lanes_per_block,
                          interpret=interpret)
