"""Fused LSTM-policy + env acting megakernel (recurrent serving path).

Recurrent counterpart of pallas_acting.py: the LSTMActorCritic tower runs
inside the VMEM-resident rollout kernel. Everything stays in plane space —
the hidden/cell state live as (hidden, L) matrices in the fori_loop carry,
gate matmuls are (hidden, in) @ (in, L) on the MXU with pre-transposed flax
kernels, and the carry is zeroed per lane on auto-reset exactly as
ppo_rnn._mask_carry does on the scan path.

Flax LSTMCell semantics (models/lstm.py / native/dronenet.c lstm_fwd):
    i = sig(x Wi_i + h Wh_i + b_i)   f = sig(...)
    g = tanh(x Wi_g + h Wh_g + b_g)  o = sig(...)
    c' = f*c + i*g ; h' = o*tanh(c')

Deterministic actions (action = policy mean) — the recurrent eval/serving
configuration; recurrent TRAINING stays on the scan path (BPTT needs the
stored sequence, drone_tpu.ppo_rnn).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drone_tpu.ops import pallas_rollout as PR
from drone_tpu.types import EnvParams, EnvState, EnvStatics

_GATES = ("i", "f", "g", "o")


def lstm_weights(params):
    """LSTMActorCritic params -> (enc [(W^T, b)...], wi[4] (H,in), wh[4]
    (H,H), bh[4] (H,), head (4, H) + b (4,))."""
    from drone_tpu.ops.pallas_acting import dense_tower

    p = params["params"] if "params" in params else params
    enc = dense_tower(p, "enc_h")
    lp = p["lstm"]
    wi = tuple(jnp.asarray(lp[f"i{g}"]["kernel"], jnp.float32).T
               for g in _GATES)
    wh = tuple(jnp.asarray(lp[f"h{g}"]["kernel"], jnp.float32).T
               for g in _GATES)
    bh = tuple(jnp.asarray(lp[f"h{g}"]["bias"], jnp.float32) for g in _GATES)
    d = p["actor_mean"]
    head = (jnp.asarray(d["kernel"], jnp.float32).T,
            jnp.asarray(d["bias"], jnp.float32))
    return tuple(enc), wi, wh, bh, head


def _kernel(pf_ref, pi_ref, fs_ref, us_ref, st_ref, h0_ref, c0_ref, *refs,
            T, task, integrator, n_enc):
    # refs: 2*n_enc enc refs, 4 wi, 4 wh, 4 bh, head W, head b, then
    # outputs: ofs, ous, ost, oh, oc, stats
    n_w = 2 * n_enc + 14
    w_refs, out_refs = refs[:n_w], refs[n_w:]
    ofs_ref, ous_ref, ost_ref, oh_ref, oc_ref, stats_ref = out_refs
    enc = [(w_refs[2 * i][:], w_refs[2 * i + 1][:]) for i in range(n_enc)]
    wi = [w_refs[2 * n_enc + g][:] for g in range(4)]
    wh = [w_refs[2 * n_enc + 4 + g][:] for g in range(4)]
    bh = [w_refs[2 * n_enc + 8 + g][:] for g in range(4)]
    head_w = w_refs[2 * n_enc + 12][:]
    head_b = w_refs[2 * n_enc + 13][:]

    P = PR._P(pf_ref, pi_ref)
    s0 = PR.read_carry(fs_ref, us_ref, st_ref)
    shape = s0[0].shape
    L = shape[0] * 128
    zero = jnp.zeros(shape, jnp.float32)
    acc0 = (zero,) * PR.N_STATS

    # PERF NOTE (measured on v5e, H=128, enc 64, 131k lanes, T=512):
    # this 8-matmul form runs 307M steps/s = ~60 TFLOP/s effective — at or
    # above the chip's f32 matmul rate, i.e. the kernel is at its matmul
    # roofline for this model size. Two attempted optimizations measured
    # SLOWER or neutral and were reverted: (a) stacking the 4 gate
    # projections into one (4H,in)/(4H,H) pair (2 matmuls/step): 286M;
    # (b) bf16 gate operands with f32 accumulation: 295M stacked / neutral
    # here — Mosaic does not reach the bf16 rate on these shapes. The
    # MLP acting kernel's 1.8B steps/s is the same effective FLOP rate
    # (its tower is ~7x fewer FLOPs/step); the LSTM/MLP throughput gap is
    # the model-size ratio, not kernel inefficiency.
    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def body(t, carry):
        s, h, cc, acc = carry
        x = PR.obs_matrix(s, L)
        for w, b in enc:
            x = jnp.tanh(dot(w, x) + b[:, None])
        gi = jax.nn.sigmoid(dot(wi[0], x) + dot(wh[0], h) + bh[0][:, None])
        gf = jax.nn.sigmoid(dot(wi[1], x) + dot(wh[1], h) + bh[1][:, None])
        gg = jnp.tanh(dot(wi[2], x) + dot(wh[2], h) + bh[2][:, None])
        go = jax.nn.sigmoid(dot(wi[3], x) + dot(wh[3], h) + bh[3][:, None])
        cc2 = gf * cc + gi * gg
        h2 = go * jnp.tanh(cc2)
        mean = dot(head_w, h2) + head_b[:, None]  # (4, L)
        a0 = mean[0].reshape(shape)
        a1 = mean[1].reshape(shape)
        a2 = mean[2].reshape(shape)
        a3 = mean[3].reshape(shape)
        s2, r, done, epret2, step2 = PR._env_step(s, a0, a1, a2, a3, P,
                                                  task, integrator)
        # ppo_rnn._mask_carry: zero the recurrent state of done lanes
        keep = (1.0 - done.astype(jnp.float32)).reshape(1, L)
        h2 = h2 * keep
        cc2 = cc2 * keep
        return s2, h2, cc2, PR.accumulate(acc, r, done, epret2, step2)

    s, h, cc, acc = jax.lax.fori_loop(0, T, body,
                                      (s0, h0_ref[:], c0_ref[:], acc0))
    PR.write_back(s, acc, ofs_ref, ous_ref, ost_ref, stats_ref)
    oh_ref[:] = h
    oc_ref[:] = cc


@functools.partial(
    jax.jit,
    static_argnames=("T", "lanes_per_block", "task", "integrator",
                     "n_enc", "interpret"),
    # donate only the env state: initial_carry aliases one zeros buffer as
    # both h and c, and donating the same buffer twice is a runtime error
    donate_argnums=(0,),
)
def _run(state, carry, weights, params, *, T, lanes_per_block, task,
         integrator, n_enc, interpret=False):
    n = state.pos.shape[0]
    fs, us, st = PR.pack_state(state, n // 128)
    pf, pi = PR._pack_params(params)
    enc, wi, wh, bh, head = weights
    hidden = wh[0].shape[0]
    # flax LSTMCell carry ordering is (c, h)
    c0 = jnp.asarray(carry[0], jnp.float32).T.reshape(hidden, n)  # (H, N)
    h0 = jnp.asarray(carry[1], jnp.float32).T.reshape(hidden, n)
    rows = fs.shape[1]
    rb = lanes_per_block // 128
    nb = rows // rb
    plane = lambda nf: pl.BlockSpec((nf, rb, 128), lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)
    hc_spec = pl.BlockSpec((hidden, lanes_per_block),
                           lambda i: (0, i), memory_space=pltpu.VMEM)

    def full(shp):
        return pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    w_flat = ([m for wb in enc for m in wb] + list(wi) + list(wh) + list(bh)
              + [head[0], head[1]])
    kernel = functools.partial(_kernel, T=T, task=task, integrator=integrator,
                               n_enc=n_enc)
    ofs, ous, ost, oh, oc, stats = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, PR._NP), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            plane(PR.NF), plane(PR.NU), plane(PR.NI),
            hc_spec, hc_spec,
            *[full(m.shape) for m in w_flat],
        ],
        out_specs=(plane(PR.NF), plane(PR.NU), plane(PR.NI),
                   hc_spec, hc_spec, plane(PR.N_STATS)),
        out_shape=(
            jax.ShapeDtypeStruct(fs.shape, jnp.float32),
            jax.ShapeDtypeStruct(us.shape, jnp.uint32),
            jax.ShapeDtypeStruct(st.shape, jnp.int32),
            jax.ShapeDtypeStruct((hidden, n), jnp.float32),
            jax.ShapeDtypeStruct((hidden, n), jnp.float32),
            jax.ShapeDtypeStruct((PR.N_STATS, rows, 128), jnp.float32),
        ),
        interpret=interpret,
    )(pf, pi, fs, us, st, h0, c0, *w_flat)
    out_carry = (oc.reshape(hidden, n).T, oh.reshape(hidden, n).T)  # (c, h)
    return PR.unpack_state(ofs, ous, ost), out_carry, jnp.sum(stats, axis=(1, 2))


def lstm_act_rollout_pallas(state: EnvState, policy_params, carry,
                            env_params: EnvParams, statics: EnvStatics,
                            T: int, lanes_per_block: int | None = None,
                            interpret: bool = False):
    """Run T deterministic LSTM-policy + env steps entirely on-chip.

    carry: the flax LSTM carry (c, h), each (N, hidden) — exactly what
    LSTMActorCritic.initial_carry / model.apply produce and consume.
    lanes_per_block: None auto-sizes so the (h, c) working set fits VMEM
    (measured limit on v5e: hidden * lanes_per_block <= 128k floats).
    Returns (final EnvState, final carry, stats dict)."""
    n = state.pos.shape[0]
    weights = lstm_weights(policy_params)
    hidden = weights[1][0].shape[0]
    cap = max(128, (131072 // max(hidden, 1)) // 128 * 128)
    if lanes_per_block is not None:
        cap = min(cap, lanes_per_block)
    lanes_per_block = PR.pick_lanes_per_block(n, min(8192, cap))
    final, out_carry, stats = _run(
        state, tuple(carry), weights, env_params, T=T,
        lanes_per_block=lanes_per_block, task=statics.task,
        integrator=statics.integrator, n_enc=len(weights[0]),
        interpret=interpret)
    return final, out_carry, PR._stats_dict(stats)
