"""Fused policy+env acting megakernel: deterministic MLP control in VMEM.

Extends the rollout megakernel (pallas_rollout.py) with the ActorCritic
actor tower evaluated INSIDE the kernel: observations are assembled as a
(OBS_DIM, L) matrix in plane space (no transposes — the state planes
already are lane-major), the policy matmuls run on the MXU as
(hidden, in) @ (in, L) with the flax kernels pre-transposed, and actions
feed the env step without ever touching HBM. This is the serving/eval
configuration: measured 1.8B policy-steps/s on one v5e vs 0.55B for the
XLA scan acting path (policy forward + env step both at full precision).

Two action modes:
  - deterministic (default): action = policy mean — what evaluate() uses.
  - stochastic=True: action = mean + exp(log_std) * z with z ~ N(0,1) from
    an in-kernel Box-Muller over the lane's threefry stream (blocks
    NOISE_BLOCK0 + 2*step, step = carried episode-step counter) —
    exploration-style data generation at kernel speed. PPO training from
    kernel rollouts lives in ops/pallas_acting_traj.py (same noise stream,
    plus per-step (obs, action, logp, value, ...) planes streamed to HBM).

Reference: SURVEY.md §3.3 (`puffer eval` rollout loop — policy forward +
c_step per frame, here fused per VMEM-resident lane block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drone_tpu import prng
from drone_tpu.ops import pallas_rollout as PR
from drone_tpu.types import EnvParams, EnvState, EnvStatics

NOISE_BLOCK0 = 0x60000000  # exploration-noise stream (disjoint from
                           # ACTION_BLOCK0 and the reset/waypoint blocks)
_TWO_PI = 6.2831853071795864


def dense_tower(p, prefix: str):
    """Collect p[f'{prefix}{i}'] dense layers as MXU-ready (pre-transposed)
    (W^T (out,in), b (out,)) pairs. Shared by the MLP and LSTM extractors."""
    ws = []
    i = 0
    while f"{prefix}{i}" in p:
        d = p[f"{prefix}{i}"]
        ws.append((jnp.asarray(d["kernel"], jnp.float32).T,
                   jnp.asarray(d["bias"], jnp.float32)))
        i += 1
    return ws


def actor_weights(params):
    """Extract the actor tower from ActorCritic params."""
    p = params["params"] if "params" in params else params
    ws = dense_tower(p, "actor_h")
    d = p["actor_mean"]
    ws.append((jnp.asarray(d["kernel"], jnp.float32).T,
               jnp.asarray(d["bias"], jnp.float32)))
    return ws


def _dot32(w, x, dtype=jnp.float32):
    """MXU matmul with f32 accumulation; dtype=bfloat16 casts the OPERANDS
    only (the ~3x-rate / ulp-precision trade both trainers expose). The ONE
    dot formulation shared by every policy kernel and mirror."""
    if dtype == jnp.float32:
        return jnp.dot(w, x, preferred_element_type=jnp.float32)
    return jnp.dot(w.astype(dtype), x.astype(dtype),
                   preferred_element_type=jnp.float32)


def _tower(x, weights, dtype=jnp.float32):
    """(in, L) @ MXU tower -> (out, L); tanh between layers, linear head.
    The ONE formulation shared by kernel and reference (bitwise contract).
    Biases may be (out,) or column (out, 1) — the fused-optimizer path keeps
    them 2-D so gradient/optimizer tensors share one shape."""
    n = len(weights)
    for li, (w, b) in enumerate(weights):
        x = _dot32(w, x, dtype) + (b if b.ndim == 2 else b[:, None])
        if li < n - 1:
            x = jnp.tanh(x)
    return x


def _gauss4_planes(k0, k1, e, stp, uniform):
    """4 standard normals at blocks NOISE_BLOCK0 + 2*step (+1), step being
    the lane's carried episode-step counter (collision-free across chained
    kernel calls): Box-Muller over the lane's counter stream. Shared
    expression order for every kernel (uniform=PR._uniform) and reference
    mirror (uniform=prng.bits_to_uniform)."""
    jb = (jnp.uint32(NOISE_BLOCK0)
          + jnp.uint32(2) * jnp.asarray(stp).astype(jnp.uint32))
    b0, b1 = prng.threefry2x32(k0, k1, e, jb)
    b2, b3 = prng.threefry2x32(k0, k1, e, jb + jnp.uint32(1))
    u1, u2, u3, u4 = uniform(b0), uniform(b1), uniform(b2), uniform(b3)
    # 1-u in (0, 1]: log never sees 0
    r1 = jnp.sqrt(-2.0 * jnp.log(1.0 - u1))
    r2 = jnp.sqrt(-2.0 * jnp.log(1.0 - u3))
    a1 = jnp.float32(_TWO_PI) * u2
    a2 = jnp.float32(_TWO_PI) * u4
    return (r1 * jnp.cos(a1), r1 * jnp.sin(a1),
            r2 * jnp.cos(a2), r2 * jnp.sin(a2))


def _acting_kernel(pf_ref, pi_ref, fs_ref, us_ref, st_ref, std_ref, *w_refs,
                   T, task, integrator, n_layers, stochastic):
    # w_refs: 2*n_layers weight/bias refs, then the 4 output refs
    ofs_ref, ous_ref, ost_ref, stats_ref = w_refs[2 * n_layers:]
    w_refs = w_refs[: 2 * n_layers]
    weights = [(w_refs[2 * i][:], w_refs[2 * i + 1][:])
               for i in range(n_layers)]

    P = PR._P(pf_ref, pi_ref)
    c0 = PR.read_carry(fs_ref, us_ref, st_ref)
    shape = c0[0].shape
    L = shape[0] * 128
    zero = jnp.zeros(shape, jnp.float32)
    acc0 = (zero,) * PR.N_STATS

    def body(t, carry):
        c, acc = carry
        x = _tower(PR.obs_matrix(c, L), weights)
        a0 = x[0].reshape(shape)
        a1 = x[1].reshape(shape)
        a2 = x[2].reshape(shape)
        a3 = x[3].reshape(shape)
        if stochastic:
            rc, k0, k1 = c[22], c[23], c[24]
            z0, z1, z2, z3 = _gauss4_planes(k0, k1, rc, c[19], PR._uniform)
            a0 = a0 + std_ref[0, 0] * z0
            a1 = a1 + std_ref[0, 1] * z1
            a2 = a2 + std_ref[0, 2] * z2
            a3 = a3 + std_ref[0, 3] * z3
        c2, r, done, epret2, step2 = PR._env_step(c, a0, a1, a2, a3, P,
                                                  task, integrator)
        return c2, PR.accumulate(acc, r, done, epret2, step2)

    c, acc = jax.lax.fori_loop(0, T, body, (c0, acc0))
    PR.write_back(c, acc, ofs_ref, ous_ref, ost_ref, stats_ref)


@functools.partial(
    jax.jit,
    static_argnames=("T", "lanes_per_block", "task", "integrator",
                     "n_layers", "interpret", "stochastic"),
    donate_argnums=(0,),
)
def _run(state, params, weights, std, *, T, lanes_per_block, task, integrator,
         n_layers, interpret=False, stochastic=False):
    n = state.pos.shape[0]
    fs, us, st = PR.pack_state(state, n // 128)
    pf, pi = PR._pack_params(params)
    rows = fs.shape[1]
    rb = lanes_per_block // 128
    nb = rows // rb
    plane = lambda nf: pl.BlockSpec((nf, rb, 128), lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)

    def full(shp):
        return pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    w_flat = [m for wb in weights for m in wb]
    kernel = functools.partial(_acting_kernel, T=T, task=task,
                               integrator=integrator, n_layers=n_layers,
                               stochastic=stochastic)
    ofs, ous, ost, stats = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, PR._NP), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            plane(PR.NF), plane(PR.NU), plane(PR.NI),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *[full(m.shape) for m in w_flat],
        ],
        out_specs=(plane(PR.NF), plane(PR.NU), plane(PR.NI), plane(PR.N_STATS)),
        out_shape=(
            jax.ShapeDtypeStruct(fs.shape, jnp.float32),
            jax.ShapeDtypeStruct(us.shape, jnp.uint32),
            jax.ShapeDtypeStruct(st.shape, jnp.int32),
            jax.ShapeDtypeStruct((PR.N_STATS, rows, 128), jnp.float32),
        ),
        interpret=interpret,
    )(pf, pi, fs, us, st, std, *w_flat)
    return PR.unpack_state(ofs, ous, ost), jnp.sum(stats, axis=(1, 2))


def act_rollout_pallas(state: EnvState, policy_params, env_params: EnvParams,
                       statics: EnvStatics, T: int,
                       lanes_per_block: int = 8192, interpret: bool = False,
                       stochastic: bool = False):
    """Run T policy+env steps entirely on-chip.

    policy_params: flax ActorCritic variables (any depth of actor_h{i}).
    stochastic=True samples action = mean + exp(log_std) * N(0,1) from the
    params' log_std via in-kernel Box-Muller (counter streams; lanes stay
    independent and reproducible).
    Returns (final EnvState, stats dict) — same contract as rollout_pallas.
    """
    n = state.pos.shape[0]
    lanes_per_block = PR.pick_lanes_per_block(n, lanes_per_block)
    PR.check_compiled_lane_block(lanes_per_block, n, interpret)
    weights = actor_weights(policy_params)
    p = policy_params["params"] if "params" in policy_params else policy_params
    std = jnp.exp(jnp.asarray(p["log_std"], jnp.float32)).reshape(1, 4)
    final, stats = _run(state, env_params, tuple(weights), std, T=T,
                        lanes_per_block=lanes_per_block, task=statics.task,
                        integrator=statics.integrator,
                        n_layers=len(weights), interpret=interpret,
                        stochastic=stochastic)
    return final, PR._stats_dict(stats)
