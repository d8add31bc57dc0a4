"""Pallas rollout megakernel: T env steps per HBM round trip.

The scan-based rollout (drone_tpu.rollout / ppo) reads and writes the full
fleet state from HBM on every step — ~200 B/lane/step of traffic for ~1.5k
ALU ops, leaving the VPU underfed. This kernel keeps each block of lanes
resident in VMEM for the whole horizon: the grid tiles the fleet into
(R=LANES_PER_BLOCK/128, 128) planes, a fori_loop advances T steps entirely
on-chip (motor mixing -> Euler -> reward -> termination -> branch-free
auto-reset with the SAME threefry-2x32 counter streams as drone_tpu.prng and
oracle/drone_oracle.c), and HBM is touched once per block.

Scope: hover task, Euler integrator — the benchmark configuration
(BASELINE.md: "aggregate env throughput (batched hover)"). The math mirrors
drone_tpu.{mixing,dynamics,tasks,randomize,env} line for line; the unit test
checks bitwise f32 equality against vmap(env.step) on the same device.

Two action sources:
  - actions=None: on-chip uniform random actions in [-1,1] from the lane's
    threefry stream at block index ACTION_BLOCK0 + 2t (distinct from the
    reset stream; regenerated, never stored — this is the pure env-engine
    throughput measurement, the analogue of the reference's env SPS bench)
  - actions=(T, N, 4) f32: a provided action stream (parity tests).

Reference: SURVEY.md §2.2 #1-2 (the C hot loop this replaces at speed of
light); /opt/skills/guides/pallas_guide.md (kernel idioms used here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drone_tpu import prng
from drone_tpu.types import EnvParams, EnvState

# float32 state planes (matches the oracle fstate layout, types.py:33)
F_PX, F_PY, F_PZ = 0, 1, 2
F_VX, F_VY, F_VZ = 3, 4, 5
F_QW, F_QX, F_QY, F_QZ = 6, 7, 8, 9
F_WX, F_WY, F_WZ = 10, 11, 12
F_TX, F_TY, F_TZ = 13, 14, 15
F_DRM, F_DRT, F_EPRET = 16, 17, 18
NF = 19

# uint32 planes: [reset_count, key0, key1]; int32 planes: [step]
NU = 3
ACTION_BLOCK0 = 0x40000000  # in-kernel action stream block offset

# f32 scalar params consumed by the hover kernel, in SMEM order
_PF = ("mass", "gravity", "arm_l", "thrust_max", "torque_coef",
       "inertia_x", "inertia_y", "inertia_z", "drag_lin", "drag_ang", "dt",
       "bound", "tilt_min", "c_vel", "c_spin", "c_act", "crash_penalty",
       "pos_radius", "vel_max_init", "rot_max_init", "omega_max_init",
       "dr_mass_lo", "dr_mass_hi", "dr_thrust_lo", "dr_thrust_hi")
_NP = len(_PF) + 3  # + target x, y, z


def _pack_params(p: EnvParams):
    vals = [getattr(p, k) for k in _PF] + [p.target[0], p.target[1], p.target[2]]
    pf = jnp.stack([jnp.asarray(v, jnp.float32) for v in vals]).reshape(1, _NP)
    pi = jnp.asarray(p.horizon, jnp.int32).reshape(1, 1)
    return pf, pi


def pack_state(s: EnvState, rows: int):
    """Batched EnvState (N leading) -> (fs (NF,rows,128) f32, us (NU,rows,128)
    u32, st (1,rows,128) i32). N must equal rows*128."""
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
                    plane(s.key0, jnp.uint32), plane(s.key1, jnp.uint32)])
    st = plane(s.step, jnp.int32)[None]
    return fs, us, st


def unpack_state(fs, us, st) -> EnvState:
    """Inverse of pack_state (hover: wp_count/gate_idx are identically 0)."""
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
        wp_count=jnp.zeros(n, jnp.uint32),
        gate_idx=jnp.zeros(n, jnp.int32),
        key0=flat(us[1]),
        key1=flat(us[2]),
    )


def _uniform(bits):
    m = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return pltpu.bitcast(m, jnp.float32) - jnp.float32(1.0)


def _hover_step(c, a0, a1, a2, a3, P, horizon):
    """One hover/Euler step on (R,128) planes. Mirrors env.step exactly:
    mixing.mix -> dynamics.euler_step -> tasks.reward_base/check_crash ->
    auto-reset select with randomize.init_pose draws."""
    (px, py, pz, vx, vy, vz, qw, qx, qy, qz, wx, wy, wz,
     drm, drt, epret, stp, rc, k0, k1) = c
    (mass, gravity, arm_l, thrust_max, torque_coef, ix, iy, iz, drag_lin,
     drag_ang, dt, bound, tilt_min, c_vel, c_spin, c_act, crash_penalty,
     pos_radius, vel_max_init, rot_max_init, omega_max_init,
     dr_mass_lo, dr_mass_hi, dr_thrust_lo, dr_thrust_hi, tgx, tgy, tgz) = P

    mass_eff = mass * drm
    # mixing.mix
    def thr(a):
        f = (a + 1.0) * 0.5
        f = jnp.minimum(jnp.maximum(f, 0.0), 1.0)
        return f * thrust_max * drt

    F0, F1, F2, F3 = thr(a0), thr(a1), thr(a2), thr(a3)
    # dynamics.deriv
    T = F0 + F1 + F2 + F3
    uzx = 2.0 * (qx * qz + qw * qy)
    uzy = 2.0 * (qy * qz - qw * qx)
    uzz = 1.0 - 2.0 * (qx * qx + qy * qy)
    Tm = T / mass_eff
    ax = Tm * uzx - drag_lin * vx / mass_eff
    ay = Tm * uzy - drag_lin * vy / mass_eff
    az = Tm * uzz - drag_lin * vz / mass_eff - gravity
    taux = arm_l * ((F1 + F3) - (F0 + F2)) - drag_ang * wx
    tauy = arm_l * ((F2 + F3) - (F0 + F1)) - drag_ang * wy
    tauz = torque_coef * ((F1 + F2) - (F0 + F3)) - drag_ang * wz
    wdx = (taux - (wy * (iz * wz) - wz * (iy * wy))) / ix
    wdy = (tauy - (wz * (ix * wx) - wx * (iz * wz))) / iy
    wdz = (tauz - (wx * (iy * wy) - wy * (ix * wx))) / iz
    s = qx * wx + qy * wy + qz * wz
    qdw = -0.5 * s
    qdx = 0.5 * (qw * wx + qy * wz - qz * wy)
    qdy = 0.5 * (qw * wy - qx * wz + qz * wx)
    qdz = 0.5 * (qw * wz + qx * wy - qy * wx)
    # dynamics.euler_step
    px2 = px + dt * vx
    py2 = py + dt * vy
    pz2 = pz + dt * vz
    vx2 = vx + dt * ax
    vy2 = vy + dt * ay
    vz2 = vz + dt * az
    nqw = qw + dt * qdw
    nqx = qx + dt * qdx
    nqy = qy + dt * qdy
    nqz = qz + dt * qdz
    wx2 = wx + dt * wdx
    wy2 = wy + dt * wdy
    wz2 = wz + dt * wdz
    n2 = nqw * nqw + nqx * nqx + nqy * nqy + nqz * nqz
    # NUMERICS NOTE (measured on v5e): Mosaic strength-reduces x/sqrt(y) to
    # its own rsqrt+refine sequence, 1-4 ulp from the correctly-rounded
    # result; XLA:TPU approximates it differently (3 ulp from host). Neither
    # a maximum() wrapper nor a VMEM store/load round trip blocks the fusion
    # (store-to-load forwarding). The kernel therefore agrees with the XLA
    # path bitwise in interpret mode and to a few ulp (quat fields only)
    # compiled; the oracle parity contract lives on the CPU backend and is
    # untouched by this.
    n = jnp.sqrt(n2)
    qw2 = nqw / n
    qx2 = nqx / n
    qy2 = nqy / n
    qz2 = nqz / n

    step2 = stp + jnp.int32(1)
    # tasks.reward_base (hover target is the param constant)
    dx = tgx - px2
    dy = tgy - py2
    dz = tgz - pz2
    d2 = dx * dx + dy * dy + dz * dz
    r = 1.0 / (1.0 + d2)
    v2 = vx2 * vx2 + vy2 * vy2 + vz2 * vz2
    r = r - c_vel * v2
    w2 = wx2 * wx2 + wy2 * wy2 + wz2 * wz2
    r = r - c_spin * w2
    aa = a0 * a0 + a1 * a1 + a2 * a2 + a3 * a3
    r = r - c_act * aa
    # tasks.check_crash
    upz = 1.0 - 2.0 * (qx2 * qx2 + qy2 * qy2)
    crashed = (pz2 < 0.0)
    crashed = crashed | (upz < tilt_min)
    crashed = crashed | (jnp.abs(px2) > bound)
    crashed = crashed | (jnp.abs(py2) > bound)
    crashed = crashed | (pz2 > bound)
    truncated = (step2 >= horizon) & jnp.logical_not(crashed)
    done = crashed | truncated
    r = jnp.where(crashed, r + crash_penalty, r)
    epret2 = epret + r

    # env.reset_state for episode rc+1 (draws u0..u13 = blocks 0..6; the
    # waypoint draws u14..u16 are dead for hover, as XLA DCEs them too)
    e2 = rc + jnp.uint32(1)
    us = []
    for j in range(7):
        b0, b1 = prng.threefry2x32(k0, k1, e2, jnp.uint32(j))
        us.append(_uniform(b0))
        us.append(_uniform(b1))
    # randomize.init_pose
    fpx = tgx + (us[0] * 2.0 - 1.0) * pos_radius
    fpy = tgy + (us[1] * 2.0 - 1.0) * pos_radius
    fpz = tgz + (us[2] * 2.0 - 1.0) * pos_radius
    fvx = (us[3] * 2.0 - 1.0) * vel_max_init
    fvy = (us[4] * 2.0 - 1.0) * vel_max_init
    fvz = (us[5] * 2.0 - 1.0) * vel_max_init
    hx = (us[6] * 2.0 - 1.0) * rot_max_init * 0.5
    hy = (us[7] * 2.0 - 1.0) * rot_max_init * 0.5
    hz = (us[8] * 2.0 - 1.0) * rot_max_init * 0.5
    fn2 = 1.0 + (hx * hx + hy * hy + hz * hz)
    fn = jnp.sqrt(fn2)  # same few-ulp Mosaic rsqrt note as normalize above
    fqw = 1.0 / fn
    fqx = hx / fn
    fqy = hy / fn
    fqz = hz / fn
    fwx = (us[9] * 2.0 - 1.0) * omega_max_init
    fwy = (us[10] * 2.0 - 1.0) * omega_max_init
    fwz = (us[11] * 2.0 - 1.0) * omega_max_init
    fdrm = dr_mass_lo + us[12] * (dr_mass_hi - dr_mass_lo)
    fdrt = dr_thrust_lo + us[13] * (dr_thrust_hi - dr_thrust_lo)

    w = lambda f, cont: jnp.where(done, f, cont)
    zf = jnp.float32(0.0)
    c2 = (
        w(fpx, px2), w(fpy, py2), w(fpz, pz2),
        w(fvx, vx2), w(fvy, vy2), w(fvz, vz2),
        w(fqw, qw2), w(fqx, qx2), w(fqy, qy2), w(fqz, qz2),
        w(fwx, wx2), w(fwy, wy2), w(fwz, wz2),
        w(fdrm, drm), w(fdrt, drt), w(zf, epret2),
        jnp.where(done, jnp.int32(0), step2),
        jnp.where(done, e2, rc), k0, k1,
    )
    return c2, r, done, epret2, step2


def _rollout_kernel(pf_ref, pi_ref, fs_ref, us_ref, st_ref, act_ref,
                    ofs_ref, ous_ref, ost_ref, stats_ref,
                    *, T, with_actions):
    P = tuple(pf_ref[0, i] for i in range(_NP))
    horizon = pi_ref[0, 0]

    c0 = (
        fs_ref[F_PX], fs_ref[F_PY], fs_ref[F_PZ],
        fs_ref[F_VX], fs_ref[F_VY], fs_ref[F_VZ],
        fs_ref[F_QW], fs_ref[F_QX], fs_ref[F_QY], fs_ref[F_QZ],
        fs_ref[F_WX], fs_ref[F_WY], fs_ref[F_WZ],
        fs_ref[F_DRM], fs_ref[F_DRT], fs_ref[F_EPRET],
        st_ref[0], us_ref[0], us_ref[1], us_ref[2],
    )
    shape = c0[0].shape
    zero = jnp.zeros(shape, jnp.float32)
    acc0 = (zero, zero, zero, zero)  # reward, episodes, ep_return, ep_length

    def body(t, carry):
        c, acc = carry
        rc, k0, k1 = c[17], c[18], c[19]
        if with_actions:
            a0 = act_ref[t, 0]
            a1 = act_ref[t, 1]
            a2 = act_ref[t, 2]
            a3 = act_ref[t, 3]
        else:
            # per-lane action stream at blocks ACTION_BLOCK0 + 2t (+1),
            # keyed like the reset stream so lanes stay independent
            jb = jnp.uint32(ACTION_BLOCK0) + jnp.uint32(2) * jnp.asarray(t, jnp.uint32)
            b0, b1 = prng.threefry2x32(k0, k1, rc, jb)
            b2, b3 = prng.threefry2x32(k0, k1, rc, jb + jnp.uint32(1))
            a0 = _uniform(b0) * 2.0 - 1.0
            a1 = _uniform(b1) * 2.0 - 1.0
            a2 = _uniform(b2) * 2.0 - 1.0
            a3 = _uniform(b3) * 2.0 - 1.0
        c2, r, done, epret2, step2 = _hover_step(c, a0, a1, a2, a3, P, horizon)
        donef = done.astype(jnp.float32)
        acc2 = (acc[0] + r,
                acc[1] + donef,
                acc[2] + jnp.where(done, epret2, 0.0),
                acc[3] + donef * step2.astype(jnp.float32))
        return c2, acc2

    c, acc = jax.lax.fori_loop(0, T, body, (c0, acc0))

    ofs_ref[F_PX] = c[0]
    ofs_ref[F_PY] = c[1]
    ofs_ref[F_PZ] = c[2]
    ofs_ref[F_VX] = c[3]
    ofs_ref[F_VY] = c[4]
    ofs_ref[F_VZ] = c[5]
    ofs_ref[F_QW] = c[6]
    ofs_ref[F_QX] = c[7]
    ofs_ref[F_QY] = c[8]
    ofs_ref[F_QZ] = c[9]
    ofs_ref[F_WX] = c[10]
    ofs_ref[F_WY] = c[11]
    ofs_ref[F_WZ] = c[12]
    # hover: target planes are the param constants for every lane
    ofs_ref[F_TX] = jnp.full(shape, P[-3], jnp.float32)
    ofs_ref[F_TY] = jnp.full(shape, P[-2], jnp.float32)
    ofs_ref[F_TZ] = jnp.full(shape, P[-1], jnp.float32)
    ofs_ref[F_DRM] = c[13]
    ofs_ref[F_DRT] = c[14]
    ofs_ref[F_EPRET] = c[15]
    ost_ref[0] = c[16]
    ous_ref[0] = c[17]
    ous_ref[1] = c[18]
    ous_ref[2] = c[19]
    # per-lane accumulators; the caller reduces (scalar SMEM outputs would
    # violate the (8, 128)-divisible block rule)
    stats_ref[0] = acc[0]
    stats_ref[1] = acc[1]
    stats_ref[2] = acc[2]
    stats_ref[3] = acc[3]


@functools.partial(jax.jit,
                   static_argnames=("T", "lanes_per_block", "interpret"),
                   donate_argnums=(0,))
def _run(state, params, actions, *, T, lanes_per_block, interpret=False):
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

    kernel = functools.partial(_rollout_kernel, T=T, with_actions=with_actions)
    out_shapes = (
        jax.ShapeDtypeStruct(fs.shape, jnp.float32),
        jax.ShapeDtypeStruct(us.shape, jnp.uint32),
        jax.ShapeDtypeStruct(st.shape, jnp.int32),
        jax.ShapeDtypeStruct((4, rows_total, 128), jnp.float32),
    )
    plane_spec = lambda nf: pl.BlockSpec((nf, rb, 128), lambda i: (0, i, 0),
                                         memory_space=pltpu.VMEM)
    ofs, ous, ost, stats = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, _NP), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            plane_spec(NF),
            plane_spec(NU),
            plane_spec(1),
            act_spec,
        ],
        out_specs=(
            plane_spec(NF),
            plane_spec(NU),
            plane_spec(1),
            plane_spec(4),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(pf, pi, fs, us, st, act)
    return unpack_state(ofs, ous, ost), jnp.sum(stats, axis=(1, 2))


def rollout_hover_pallas(state: EnvState, params: EnvParams, T: int,
                         actions=None, lanes_per_block: int = 8192,
                         interpret: bool = False):
    """Run T hover/Euler env steps entirely in VMEM.

    state: batched EnvState with N = k * lanes_per_block lanes.
    actions: None (on-chip RNG stream) or (T, N, 4) float32.
    interpret: run through the Pallas interpreter (XLA ops, no Mosaic) —
    bitwise-identical to the scan path; used by the logic-equivalence test.
    Returns (final EnvState, stats dict with reward_sum / episodes /
    ep_return_sum / ep_length_sum).
    """
    n = state.pos.shape[0]
    assert n % lanes_per_block == 0, (n, lanes_per_block)
    final, stats = _run(state, params, actions, T=T,
                        lanes_per_block=lanes_per_block, interpret=interpret)
    return final, {
        "reward_sum": stats[0],
        "episodes": stats[1],
        "ep_return_sum": stats[2],
        "ep_length_sum": stats[3],
    }
