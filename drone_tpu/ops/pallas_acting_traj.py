"""Trajectory-emitting acting megakernel: PPO training data at kernel speed.

The acting megakernel (pallas_acting.py) runs policy+env fused in VMEM but
discards the trajectory, so PPO training was stuck consuming the ~50x slower
XLA scan rollout. This kernel closes that gap: per step it evaluates BOTH
policy towers (actor mean on the MXU, critic value), samples the exploration
action from the lane's counter-RNG noise stream, steps the env, and streams
the per-step training planes

    obs(13) action(4) logp(1) value(1) reward(1) done(1)   (N_TRAJ = 21 f32)

to HBM through a time-chunked output BlockSpec: the grid is
(lane_blocks, T/time_chunk) with time innermost, the env-state carry lives in
the (revisited) final-state output refs across time chunks, and each
time-chunk block of trajectory planes double-buffers out to HBM while the
next chunk computes. HBM write traffic is the experience buffer itself —
exactly the bytes PPO must store — instead of the scan path's full
state-in/state-out round trip per step.

RNG contract: exploration noise comes from the SAME counter stream as
pallas_acting's stochastic mode — threefry blocks NOISE_BLOCK0 + 2*step of
episode `reset_count` (step = the lane's carried episode-step counter), so
rollouts are reproducible, lane-independent, and collision-free across
chained kernel calls; the host PRNG key is not consumed by the rollout.

`traj_act_rollout_reference` is the pure-jnp mirror (same matmul
formulation, same noise expressions, same evaluation order) used by the
equivalence tests: in interpret mode on the CPU backend the kernel matches
it bitwise, the same contract pallas_rollout has with the scan env path.

Reference: SURVEY.md §3.1 hot-loop fusion rationale (`[U]
pufferlib/pufferl.py` rollout collection feeding the PPO update);
BASELINE.json:10 (64K-drone training tier).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drone_tpu import env as env_mod
from drone_tpu import prng
from drone_tpu.ops import pallas_rollout as PR
# the shared kernel math lives in pallas_acting (the import-graph base):
# ONE _dot32/_tower/_gauss4_planes for every policy kernel and mirror —
# never fork copies (CLAUDE.md megakernel contract)
from drone_tpu.ops.pallas_acting import (  # noqa: F401 — re-exported
    NOISE_BLOCK0,
    _TWO_PI,
    _dot32,
    _gauss4_planes,
    _tower,
    actor_weights,
    dense_tower,
)
from drone_tpu.types import OBS_DIM, EnvParams, EnvState, EnvStatics

# trajectory plane layout (f32)
TP_OBS0 = 0
TP_ACT0 = OBS_DIM          # 4 action planes
TP_LOGP = OBS_DIM + 4
TP_VAL = OBS_DIM + 5
TP_REW = OBS_DIM + 6
TP_DONE = OBS_DIM + 7
N_TRAJ = OBS_DIM + 8       # 21

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


class Traj(NamedTuple):
    """One rollout of training data, scan-path layout: (T, B, ...) arrays."""

    obs: jnp.ndarray      # (T, B, OBS_DIM)
    action: jnp.ndarray   # (T, B, 4)
    logp: jnp.ndarray     # (T, B)
    value: jnp.ndarray    # (T, B)
    reward: jnp.ndarray   # (T, B)
    done: jnp.ndarray     # (T, B) bool


def critic_weights(params):
    """Extract the critic tower from ActorCritic params (MXU-ready W^T)."""
    p = params["params"] if "params" in params else params
    ws = dense_tower(p, "critic_h")
    d = p["critic_value"]
    ws.append((jnp.asarray(d["kernel"], jnp.float32).T,
               jnp.asarray(d["bias"], jnp.float32)))
    return ws


def _log_std(params):
    p = params["params"] if "params" in params else params
    return jnp.asarray(p["log_std"], jnp.float32).reshape(1, 4)


def _sample_logp(m, z, ls_scalars, stochastic):
    """action/logp from mean planes m[4], noise z[4], log_std scalars.

    logp is reconstructed from the STORED action ((a - m)/std, like the PPO
    loss recomputation) rather than from z directly, so ratio == 1 exactly
    at the first minibatch of the first epoch."""
    C = jnp.float32(_HALF_LOG_2PI)
    a, lp = [], []
    for k in range(4):
        std_k = jnp.exp(ls_scalars[k])
        a_k = m[k] + std_k * z[k] if stochastic else m[k]
        zr = (a_k - m[k]) / std_k
        lp.append(jnp.float32(-0.5) * (zr * zr) - ls_scalars[k] - C)
        a.append(a_k)
    logp = ((lp[0] + lp[1]) + lp[2]) + lp[3]
    return a, logp


def _traj_kernel(pf_ref, pi_ref, fs_ref, us_ref, st_ref, ls_ref, *refs,
                 tc, task, integrator, n_actor, n_critic, stochastic,
                 compute_dtype):
    nw = 2 * (n_actor + n_critic)
    w_refs = refs[:nw]
    traj_ref, ofs_ref, ous_ref, ost_ref, stats_ref = refs[nw:]
    actor = [(w_refs[2 * i][:], w_refs[2 * i + 1][:])
             for i in range(n_actor)]
    critic = [(w_refs[2 * (n_actor + i)][:], w_refs[2 * (n_actor + i) + 1][:])
              for i in range(n_critic)]
    ls = [ls_ref[0, k] for k in range(4)]

    t = pl.program_id(1)

    # the final-state/stats output refs double as the cross-chunk carry:
    # their block index is constant in t, so the VMEM buffer persists
    # (revisiting) until the lane-block changes and flushes once to HBM
    @pl.when(t == 0)
    def _init():
        for k in range(PR.NF):
            ofs_ref[k] = fs_ref[k]
        for k in range(PR.NU):
            ous_ref[k] = us_ref[k]
        for k in range(PR.NI):
            ost_ref[k] = st_ref[k]
        for k in range(PR.N_STATS):
            stats_ref[k] = jnp.zeros_like(stats_ref[k])

    P = PR._P(pf_ref, pi_ref)
    c0 = PR.read_carry(ofs_ref, ous_ref, ost_ref)
    shape = c0[0].shape
    L = shape[0] * 128
    acc0 = tuple(stats_ref[k] for k in range(PR.N_STATS))

    # fori_loop with dynamic trajectory stores: measured IDENTICAL throughput
    # to a fully unrolled chunk (the kernel is matmul-bound, not
    # store-bound), and the unrolled form cost ~3 min of Mosaic compile at
    # tc=4 vs ~10 s for the loop
    def body(s, carry):
        c, acc = carry
        X = PR.obs_matrix(c, L)
        mx = _tower(X, actor, compute_dtype)
        vx = _tower(X, critic, compute_dtype)
        m = [mx[k].reshape(shape) for k in range(4)]
        value = vx[0].reshape(shape)
        rc, k0, k1, stp = c[22], c[23], c[24], c[19]
        z = _gauss4_planes(k0, k1, rc, stp, PR._uniform)
        a, logp = _sample_logp(m, z, ls, stochastic)
        for k in range(OBS_DIM):
            traj_ref[s, TP_OBS0 + k] = X[k].reshape(shape)
        for k in range(4):
            traj_ref[s, TP_ACT0 + k] = a[k]
        traj_ref[s, TP_LOGP] = logp
        traj_ref[s, TP_VAL] = value
        c2, r, done, epret2, step2 = PR._env_step(c, a[0], a[1], a[2], a[3],
                                                  P, task, integrator)
        traj_ref[s, TP_REW] = r
        traj_ref[s, TP_DONE] = done.astype(jnp.float32)
        return c2, PR.accumulate(acc, r, done, epret2, step2)

    c, acc = jax.lax.fori_loop(0, tc, body, (c0, acc0))
    PR.write_back(c, acc, ofs_ref, ous_ref, ost_ref, stats_ref)


@functools.partial(
    jax.jit,
    static_argnames=("T", "tc", "lanes_per_block", "task", "integrator",
                     "n_actor", "n_critic", "interpret", "stochastic",
                     "compute_dtype"),
    donate_argnums=(0,),
)
def _run(state, env_params, actor_w, critic_w, log_std, *, T, tc,
         lanes_per_block, task, integrator, n_actor, n_critic,
         interpret=False, stochastic=True, compute_dtype="float32"):
    n = state.pos.shape[0]
    fs, us, st = PR.pack_state(state, n // 128)
    pf, pi = PR._pack_params(env_params)
    rows = fs.shape[1]
    rb = lanes_per_block // 128
    nb = rows // rb
    nt = T // tc
    plane = lambda nf: pl.BlockSpec((nf, rb, 128), lambda i, t: (0, i, 0),
                                    memory_space=pltpu.VMEM)

    def full(shp):
        return pl.BlockSpec(shp, lambda i, t: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    w_flat = [m for wb in (*actor_w, *critic_w) for m in wb]
    kernel = functools.partial(_traj_kernel, tc=tc, task=task,
                               integrator=integrator, n_actor=n_actor,
                               n_critic=n_critic, stochastic=stochastic,
                               compute_dtype=jnp.dtype(compute_dtype).type)
    traj, ofs, ous, ost, stats = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((1, PR._NP), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            plane(PR.NF), plane(PR.NU), plane(PR.NI),
            pl.BlockSpec((1, 4), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            *[full(m.shape) for m in w_flat],
        ],
        out_specs=(
            # kernel-natural layout: contiguous (rb, 128) plane stores per
            # step (Mosaic rejects the strided stores a row-major layout
            # would need). This (T, N_TRAJ, rows, 128) buffer IS the
            # training set: GAE reads it time-major and the update kernel
            # gathers (tc, N_TRAJ, row-block, 128) tiles from it directly.
            pl.BlockSpec((tc, N_TRAJ, rb, 128), lambda i, t: (t, 0, i, 0),
                         memory_space=pltpu.VMEM),
            plane(PR.NF), plane(PR.NU), plane(PR.NI), plane(PR.N_STATS),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, N_TRAJ, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct(fs.shape, jnp.float32),
            jax.ShapeDtypeStruct(us.shape, jnp.uint32),
            jax.ShapeDtypeStruct(st.shape, jnp.int32),
            jax.ShapeDtypeStruct((PR.N_STATS, rows, 128), jnp.float32),
        ),
        interpret=interpret,
    )(pf, pi, fs, us, st, log_std, *w_flat)
    return traj, PR.unpack_state(ofs, ous, ost), jnp.sum(stats, axis=(1, 2))


def _planes_to_traj(traj, n):
    """(T, N_TRAJ, rows, 128) planes -> Traj with (T, B, ...) arrays."""
    T = traj.shape[0]

    def vec(p0, d):
        x = traj[:, p0:p0 + d]                        # (T, d, rows, 128)
        return x.transpose(0, 2, 3, 1).reshape(T, n, d)

    def scal(p0):
        return traj[:, p0].reshape(T, n)

    return Traj(
        obs=vec(TP_OBS0, OBS_DIM),
        action=vec(TP_ACT0, 4),
        logp=scal(TP_LOGP),
        value=scal(TP_VAL),
        reward=scal(TP_REW),
        done=scal(TP_DONE) != 0.0,
    )


def pack_traj_planes(traj: Traj, rows: int) -> jnp.ndarray:
    """Inverse of _planes_to_traj: Traj -> (T, N_TRAJ, rows, 128) planes
    (pure layout, no arithmetic — used to feed reference rollouts into the
    plane-consuming update path bit-exactly)."""
    T = traj.obs.shape[0]
    parts = [traj.obs.transpose(0, 2, 1),                # (T, OBS_DIM, B)
             traj.action.transpose(0, 2, 1),             # (T, 4, B)
             traj.logp[:, None], traj.value[:, None],
             traj.reward[:, None],
             traj.done.astype(jnp.float32)[:, None]]
    flat = jnp.concatenate(parts, axis=1)                # (T, N_TRAJ, B)
    return flat.reshape(T, N_TRAJ, rows, 128)


def pick_time_chunk(T: int, cap: int = 16) -> int:
    """Largest divisor of T that is <= cap AND legal as a Mosaic trailing
    block dim (multiple of 8, or the whole of T). The trajectory VMEM block
    holds time_chunk * N_TRAJ * lanes_per_block floats, double-buffered
    (4096 lanes x tc=16 = 5.5 MB x2 — measured 20 ms/rollout faster than
    tc=8 at 64k lanes; 8192-lane blocks fail to compile at these sizes)."""
    best = None
    for k in range(1, min(cap, T) + 1):
        if T % k == 0 and (k % 8 == 0 or k == T):
            best = k
    return best if best is not None else T


def traj_act_rollout_pallas(state: EnvState, policy_params,
                            env_params: EnvParams, statics: EnvStatics,
                            T: int, lanes_per_block: int = 4096,
                            time_chunk: int | None = None,
                            interpret: bool = False, stochastic: bool = True,
                            compute_dtype: str = "float32"):
    """Run T fused policy+env steps on-chip, emitting the PPO training
    trajectory to HBM.

    Returns (final EnvState, Traj, stats dict). stats carries the on-chip
    episode accounting (reward_sum / episodes / ep_return_sum /
    ep_length_sum / ep_return_sq_sum) so the trainer needs no per-step
    ep_return planes.
    """
    final, traj, stats = traj_act_rollout_pallas_planes(
        state, policy_params, env_params, statics, T,
        lanes_per_block=lanes_per_block, time_chunk=time_chunk,
        interpret=interpret, stochastic=stochastic,
        compute_dtype=compute_dtype)
    return final, _planes_to_traj(traj, state.pos.shape[0]), stats


def traj_act_rollout_pallas_planes(state: EnvState, policy_params,
                                   env_params: EnvParams,
                                   statics: EnvStatics, T: int,
                                   lanes_per_block: int = 4096,
                                   time_chunk: int | None = None,
                                   interpret: bool = False,
                                   stochastic: bool = True,
                                   compute_dtype: str = "float32"):
    """traj_act_rollout_pallas without the (T, B, ...) conversion: returns
    (final EnvState, raw planes (T, N_TRAJ, rows, 128), stats dict).

    The layout is the KERNEL-NATURAL one — exactly the buffer the rollout
    kernel streams to HBM, returned with zero relayout. GAE's reverse scan
    wants time leading anyway, and the PPO update megakernel
    (ops/pallas_update.py) gathers (time-chunk, row-block) tiles from it
    via its BlockSpec index maps, so the training path touches these bytes
    exactly once per consumer (the round-2 row-major relayout cost ~2x
    buffer bytes of HBM traffic per rollout — ~1.4 GB at 64k lanes)."""
    n = state.pos.shape[0]
    lanes_per_block = PR.pick_lanes_per_block(n, lanes_per_block)
    PR.check_compiled_lane_block(lanes_per_block, n, interpret)
    tc = time_chunk if time_chunk is not None else pick_time_chunk(T)
    assert T % tc == 0, (T, tc)
    actor_w = tuple(actor_weights(policy_params))
    critic_w = tuple(critic_weights(policy_params))
    traj, final, stats = _run(
        state, env_params, actor_w, critic_w, _log_std(policy_params),
        T=T, tc=tc, lanes_per_block=lanes_per_block, task=statics.task,
        integrator=statics.integrator, n_actor=len(actor_w),
        n_critic=len(critic_w), interpret=interpret, stochastic=stochastic,
        compute_dtype=compute_dtype)
    return final, traj, PR._stats_dict(stats)


# ---------------------------------------------------------------------------
# Pure-jnp reference (the bitwise contract for the equivalence tests, and
# the rollout used by ppo's rollout="pallas_ref" on backends without Mosaic).
# ---------------------------------------------------------------------------

def traj_act_rollout_reference(state: EnvState, policy_params,
                               env_params: EnvParams, statics: EnvStatics,
                               T: int, stochastic: bool = True,
                               compute_dtype: str = "float32"):
    """jnp mirror of traj_act_rollout_pallas: same matmul formulation
    (W^T @ obs planes), same noise stream, same expression order. In
    interpret mode on the CPU backend the kernel matches this bitwise
    (single lane block); params ride as traced arguments."""
    actor_w = tuple(actor_weights(policy_params))
    critic_w = tuple(critic_weights(policy_params))
    cdt = jnp.dtype(compute_dtype).type
    ls_row = _log_std(policy_params)
    ls = [ls_row[0, k] for k in range(4)]

    def body(carry, _):
        s = carry
        obs = jax.vmap(env_mod.observe)(s)            # (B, OBS_DIM)
        X = obs.T                                     # (OBS_DIM, B) planes
        mx = _tower(X, actor_w, cdt)
        vx = _tower(X, critic_w, cdt)
        m = [mx[k] for k in range(4)]
        value = vx[0]
        z = _gauss4_planes(s.key0, s.key1, s.reset_count, s.step,
                           prng.bits_to_uniform)
        a, logp = _sample_logp(m, z, ls, stochastic)
        action = jnp.stack(a, axis=-1)
        s2, out = jax.vmap(
            lambda ss, aa: env_mod.step(ss, aa, env_params, statics)
        )(s, action)
        done = out.terminated | out.truncated
        tr = Traj(obs=obs, action=action, logp=logp, value=value,
                  reward=out.reward, done=done)
        aux = (jnp.where(done, out.ep_return, 0.0),
               jnp.where(done, out.ep_length.astype(jnp.float32), 0.0))
        return s2, (tr, aux)

    final, (traj, (ep_ret, ep_len)) = jax.lax.scan(body, state, None, length=T)
    donef = traj.done.astype(jnp.float32)
    stats = {
        "reward_sum": jnp.sum(traj.reward),
        "episodes": jnp.sum(donef),
        "ep_return_sum": jnp.sum(ep_ret),
        "ep_length_sum": jnp.sum(ep_len),
        "ep_return_sq_sum": jnp.sum(ep_ret * ep_ret),
    }
    return final, traj, stats
