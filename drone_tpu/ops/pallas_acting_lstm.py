"""Fused LSTM-policy + env megakernels (recurrent serving AND training).

Recurrent counterpart of pallas_acting.py / pallas_acting_traj.py: the
LSTMActorCritic tower runs inside the VMEM-resident rollout kernel.
Everything stays in plane space — the hidden/cell state live as
(hidden, L) matrices in the fori_loop carry, gate matmuls are
(hidden, in) @ (in, L) on the MXU with pre-transposed flax kernels, and
the carry is zeroed per lane on auto-reset exactly as ppo_rnn._mask_carry
does on the scan path.

Flax LSTMCell semantics (models/lstm.py / native/dronenet.c lstm_fwd):
    i = sig(x Wi_i + h Wh_i + b_i)   f = sig(...)
    g = tanh(x Wi_g + h Wh_g + b_g)  o = sig(...)
    c' = f*c + i*g ; h' = o*tanh(c')

Two kernels:
  - `lstm_act_rollout_pallas`: deterministic actions (action = policy
    mean) — the recurrent eval/serving configuration.
  - `traj_lstm_rollout_pallas`: the recurrent TRAINING rollout — samples
    exploration actions from the counter-RNG noise stream (same blocks as
    the MLP trajectory kernel), evaluates the critic head, streams the
    (obs, action, logp, value, reward, done) planes to HBM in the
    kernel-natural (T, N_TRAJ, rows, 128) layout, and records the (c, h)
    carry at every `bptt` segment start — exactly the anchors
    ppo_rnn.segmented_forward needs for truncated BPTT. The jnp mirror
    `traj_lstm_rollout_reference` is the bitwise contract in interpret
    mode (the pallas_acting_traj pattern).

Reference: SURVEY.md §2.2 #9-#10 (`[U] pufferlib/pufferl.py` LSTM mode is
part of the trainer; `[U] pufferlib/models.py` LSTMWrapper).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drone_tpu import env as env_mod
from drone_tpu import prng
from drone_tpu.ops import pallas_rollout as PR
from drone_tpu.ops.pallas_acting_traj import (
    N_TRAJ,
    TP_ACT0,
    TP_DONE,
    TP_LOGP,
    TP_OBS0,
    TP_REW,
    TP_VAL,
    Traj,
    _dot32,
    _gauss4_planes,
    _sample_logp,
    pick_time_chunk,
)
from drone_tpu.types import OBS_DIM, EnvParams, EnvState, EnvStatics

_GATES = ("i", "f", "g", "o")


def lstm_encoder(X, enc, dot):
    """THE shared encoder tower (plane space): X (OBS_DIM, L), enc
    [(W (H,in), b (H,1))...]. Returns the per-layer activation list
    (acts[0] = X, acts[-1] = the LSTM input). Shared verbatim by the
    rollout kernels, their jnp mirrors, the BPTT update kernel
    (ops/pallas_update_lstm.py), and the trainer's value head
    (ppo_rnn_pallas._lstm_value) — change the math here only, never fork a
    copy (the bitwise kernel/mirror contracts depend on one evaluation
    order)."""
    acts = [X]
    x = X
    for w, b in enc:
        x = jnp.tanh(dot(w, x) + b)
        acts.append(x)
    return acts


def enc_flat(enc):
    """Flatten the encoder [(W, b), ...] pairs into the flat tuple order
    cnn_encode/cnn_encoder_bwd consume (W0, b0, W1, b1, Wt, bt) — THE one
    packing definition (used by encode_features, _lstm_step_fwd and the
    BPTT encoder backward; keep them in lock-step through this helper)."""
    return tuple(x for pair in enc for x in pair)


def encode_features(X, enc, dtype=jnp.float32, encoder="dense", geom=None,
                    gx=None, gy=None):
    """THE policy feature tower switch: X (OBS_DIM, L) -> LSTM input.

    encoder="dense": the tanh dense stack (lstm_encoder; enc = [(W, b_col)
    ...]). encoder="cnn": the patchify-CNN trunk (pixel-recurrent family;
    enc = [(W0, b0), (W1, b1), (Wt, bt)] column-bias pairs, routed through
    pallas_acting_cnn.cnn_encode — the SAME shared function the CNN
    rollout/update kernels evaluate, one evaluation order everywhere).
    Shared verbatim by the recurrent rollout kernels, their jnp mirrors,
    and the BPTT update kernel. Takes the compute DTYPE (not a caller dot)
    so both branches derive their matmul from the one _dot32 formulation —
    a caller can't hand the dense branch a bf16 dot while the cnn branch
    silently runs f32."""
    if encoder == "dense":
        return lstm_encoder(X, enc, lambda a, b: _dot32(a, b, dtype))[-1]
    from drone_tpu.ops.pallas_acting_cnn import cnn_encode

    return cnn_encode(X, enc_flat(enc), gx, gy, geom, dtype)


def lstm_gates(x, h, cc, wi, wh, bh, dot):
    """THE shared LSTM gate block (flax LSTMCell semantics, plane space):
    x (in, L) encoder output, h/cc (H, L) carry, wi/wh 4 gate kernels,
    bh 4 (H, 1) bias columns, dot the caller's matmul. Returns
    (gi, gf, gg, go, cc2, th, h2). Same sharing contract as
    lstm_encoder."""
    gi = jax.nn.sigmoid(dot(wi[0], x) + dot(wh[0], h) + bh[0])
    gf = jax.nn.sigmoid(dot(wi[1], x) + dot(wh[1], h) + bh[1])
    gg = jnp.tanh(dot(wi[2], x) + dot(wh[2], h) + bh[2])
    go = jax.nn.sigmoid(dot(wi[3], x) + dot(wh[3], h) + bh[3])
    cc2 = gf * cc + gi * gg
    th = jnp.tanh(cc2)
    h2 = go * th
    return gi, gf, gg, go, cc2, th, h2


def lstm_encoder_kind(params):
    """(encoder kind, CnnGeom|None) from the param structure — static at
    trace time (dict keys, array shapes). "cnn" = the pixel-recurrent
    CNNLSTMActorCritic (conv0/conv1/trunk tower); "dense" = the enc_h*
    tower. A policy built with LSTMActorCritic(encoder_module=...) and any
    OTHER encoder structure is rejected here (the kernels would otherwise
    silently treat it as an empty dense encoder and fail with an opaque
    matmul shape error deep in tracing); such policies train on the scan
    tier (ppo_rnn / run.rollout=scan), which runs model.apply directly."""
    p = params["params"] if "params" in params else params
    if "conv0" in p:
        from drone_tpu.ops.pallas_acting_cnn import infer_cnn_geom

        return "cnn", infer_cnn_geom(p)
    known = {"lstm", "actor_mean", "critic_value", "log_std", "trunk",
             "conv1"}
    unknown = sorted(k for k in p
                     if k not in known and not k.startswith("enc_h"))
    if unknown:
        raise ValueError(
            f"unrecognized LSTM encoder params {unknown}: the recurrent "
            "kernels support the dense enc_h* tower and the "
            "conv0/conv1/trunk patch-CNN tower; custom encoder_module "
            "policies run on the scan trainer (ppo_rnn with "
            "rollout='scan')")
    return "dense", None


def lstm_weights(params):
    """LSTMActorCritic params -> (enc [(W^T, b)...], wi[4] (H,in), wh[4]
    (H,H), bh[4] (H,), head (4, H) + b (4,)). For the pixel-recurrent
    CNNLSTMActorCritic, enc is the 3 MXU-ready conv-tower pairs
    [(W0, b0), (W1, b1), (Wt, bt)] with 1-D biases (columnized by the
    kernels exactly like the dense pairs)."""
    from drone_tpu.ops.pallas_acting import dense_tower

    p = params["params"] if "params" in params else params
    if "conv0" in p:
        from drone_tpu.ops.pallas_acting_cnn import (
            cnn_encoder_weights,
            infer_cnn_geom,
        )

        W0, b0, W1, b1, Wt, bt = cnn_encoder_weights(p, infer_cnn_geom(p))
        enc = [(W0, b0.reshape(-1)), (W1, b1.reshape(-1)),
               (Wt, bt.reshape(-1))]
    else:
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
            T, task, integrator, n_enc, encoder="dense", geom=None):
    # refs: 2*n_enc enc refs, 4 wi, 4 wh, 4 bh, head W, head b
    # [, gx, gy when encoder == "cnn"], then outputs: ofs, ous, ost, oh,
    # oc, stats
    n_w = 2 * n_enc + 14 + (2 if encoder == "cnn" else 0)
    w_refs, out_refs = refs[:n_w], refs[n_w:]
    ofs_ref, ous_ref, ost_ref, oh_ref, oc_ref, stats_ref = out_refs
    enc = [(w_refs[2 * i][:], w_refs[2 * i + 1][:]) for i in range(n_enc)]
    wi = [w_refs[2 * n_enc + g][:] for g in range(4)]
    wh = [w_refs[2 * n_enc + 4 + g][:] for g in range(4)]
    bh = [w_refs[2 * n_enc + 8 + g][:] for g in range(4)]
    head_w = w_refs[2 * n_enc + 12][:]
    head_b = w_refs[2 * n_enc + 13][:]
    gx = w_refs[2 * n_enc + 14][:] if encoder == "cnn" else None
    gy = w_refs[2 * n_enc + 15][:] if encoder == "cnn" else None

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

    enc_c = [(w, b[:, None]) for w, b in enc]
    bh_c = [b[:, None] for b in bh]

    def body(t, carry):
        s, h, cc, acc = carry
        x = encode_features(PR.obs_matrix(s, L), enc_c, encoder=encoder,
                            geom=geom, gx=gx, gy=gy)
        *_, cc2, _th, h2 = lstm_gates(x, h, cc, wi, wh, bh_c, dot)
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
                     "n_enc", "interpret", "encoder", "geom"),
    # donate only the env state: initial_carry aliases one zeros buffer as
    # both h and c, and donating the same buffer twice is a runtime error
    donate_argnums=(0,),
)
def _run(state, carry, weights, params, *, T, lanes_per_block, task,
         integrator, n_enc, interpret=False, encoder="dense", geom=None):
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
    if encoder == "cnn":
        from drone_tpu.pixels import patch_grid

        gx, gy = patch_grid(geom.res, geom.p0)
        w_flat += [gx, gy]
    kernel = functools.partial(_kernel, T=T, task=task, integrator=integrator,
                               n_enc=n_enc, encoder=encoder, geom=geom)
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
        # the CNN encoder's per-step working set (~12 MB at 1024 lanes)
        # overruns the conservative 16 MB scoped-vmem default (same raise
        # as the CNN kernels); the dense path keeps the default
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if encoder == "cnn"
            else None),
        interpret=interpret,
    )(pf, pi, fs, us, st, h0, c0, *w_flat)
    out_carry = (oc.reshape(hidden, n).T, oh.reshape(hidden, n).T)  # (c, h)
    return PR.unpack_state(ofs, ous, ost), out_carry, jnp.sum(stats, axis=(1, 2))


def lstm_all_weights(params):
    """lstm_weights + critic head + log_std row (the training surface)."""
    p = params["params"] if "params" in params else params
    enc, wi, wh, bh, head = lstm_weights(params)
    d = p["critic_value"]
    vhead = (jnp.asarray(d["kernel"], jnp.float32).T,
             jnp.asarray(d["bias"], jnp.float32))
    ls = jnp.asarray(p["log_std"], jnp.float32).reshape(1, 4)
    return enc, wi, wh, bh, head, vhead, ls


def _lstm_traj_kernel(pf_ref, pi_ref, fs_ref, us_ref, st_ref, h0_ref, c0_ref,
                      ls_ref, *refs, tc, bptt, task, integrator, n_enc,
                      stochastic, encoder="dense", geom=None):
    # refs: 2*n_enc enc, 4 wi, 4 wh, 4 bh, head W/b, vhead W/b
    # [, gx, gy when encoder == "cnn"], then outputs: traj, snap, ofs,
    # ous, ost, oh, oc, stats
    n_w = 2 * n_enc + 16 + (2 if encoder == "cnn" else 0)
    w_refs, out_refs = refs[:n_w], refs[n_w:]
    (traj_ref, snap_ref, ofs_ref, ous_ref, ost_ref, oh_ref, oc_ref,
     stats_ref) = out_refs
    enc = [(w_refs[2 * i][:], w_refs[2 * i + 1][:]) for i in range(n_enc)]
    wi = [w_refs[2 * n_enc + g][:] for g in range(4)]
    wh = [w_refs[2 * n_enc + 4 + g][:] for g in range(4)]
    bh = [w_refs[2 * n_enc + 8 + g][:] for g in range(4)]
    head_w = w_refs[2 * n_enc + 12][:]
    head_b = w_refs[2 * n_enc + 13][:]
    vh_w = w_refs[2 * n_enc + 14][:]
    vh_b = w_refs[2 * n_enc + 15][:]
    gx = w_refs[2 * n_enc + 16][:] if encoder == "cnn" else None
    gy = w_refs[2 * n_enc + 17][:] if encoder == "cnn" else None
    ls = [ls_ref[0, k] for k in range(4)]

    t = pl.program_id(1)

    # env-state planes + recurrent carry ride in revisited output refs
    # across time chunks (block index constant in t), as in the MLP
    # trajectory kernel
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
        oh_ref[:] = h0_ref[:]
        oc_ref[:] = c0_ref[:]

    P = PR._P(pf_ref, pi_ref)
    c0 = PR.read_carry(ofs_ref, ous_ref, ost_ref)
    shape = c0[0].shape
    L = shape[0] * 128
    acc0 = tuple(stats_ref[k] for k in range(PR.N_STATS))

    # BPTT anchor: the carry ENTERING the first step of each segment. tc
    # divides bptt, so segment starts land exactly on chunk starts — one
    # conditional write per chunk (AFTER _init seeds oh/oc at t == 0), not
    # a per-step where-select. The snap block revisits across the segment's
    # later chunks; Pallas preserves revisited output blocks that are not
    # written, flushing to HBM when the block index advances.
    @pl.when((t * tc) % bptt == 0)
    def _snap():
        snap_ref[0, 0] = oc_ref[:]
        snap_ref[0, 1] = oh_ref[:]

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    enc_c = [(w, b[:, None]) for w, b in enc]
    bh_c = [b[:, None] for b in bh]

    def body(s, carry):
        c, h, cc, acc = carry
        X = PR.obs_matrix(c, L)
        x = encode_features(X, enc_c, encoder=encoder, geom=geom,
                            gx=gx, gy=gy)
        *_, cc2, _th, h2 = lstm_gates(x, h, cc, wi, wh, bh_c, dot)
        mx = dot(head_w, h2) + head_b[:, None]     # (4, L)
        vx = dot(vh_w, h2) + vh_b[:, None]         # (1, L)
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
        # ppo_rnn._mask_carry: zero the recurrent state of done lanes
        keep = (1.0 - done.astype(jnp.float32)).reshape(1, L)
        return c2, h2 * keep, cc2 * keep, PR.accumulate(acc, r, done,
                                                        epret2, step2)

    c, h, cc, acc = jax.lax.fori_loop(
        0, tc, body, (c0, oh_ref[:], oc_ref[:], acc0))
    PR.write_back(c, acc, ofs_ref, ous_ref, ost_ref, stats_ref)
    oh_ref[:] = h
    oc_ref[:] = cc


@functools.partial(
    jax.jit,
    static_argnames=("T", "tc", "bptt", "lanes_per_block", "task",
                     "integrator", "n_enc", "interpret", "stochastic",
                     "encoder", "geom"),
    donate_argnums=(0,),
)
def _traj_run(state, carry, weights, ls, params, *, T, tc, bptt,
              lanes_per_block, task, integrator, n_enc, interpret=False,
              stochastic=True, encoder="dense", geom=None):
    n = state.pos.shape[0]
    fs, us, st = PR.pack_state(state, n // 128)
    pf, pi = PR._pack_params(params)
    enc, wi, wh, bh, head, vhead = weights
    hidden = wh[0].shape[0]
    c0 = jnp.asarray(carry[0], jnp.float32).T.reshape(hidden, n)  # (c, h)
    h0 = jnp.asarray(carry[1], jnp.float32).T.reshape(hidden, n)
    rows = fs.shape[1]
    rb = lanes_per_block // 128
    nb = rows // rb
    nt = T // tc
    n_seg = T // bptt
    plane = lambda nf: pl.BlockSpec((nf, rb, 128), lambda i, t: (0, i, 0),
                                    memory_space=pltpu.VMEM)
    hc_spec = pl.BlockSpec((hidden, lanes_per_block),
                           lambda i, t: (0, i), memory_space=pltpu.VMEM)

    def full(shp):
        return pl.BlockSpec(shp, lambda i, t: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    w_flat = ([m for wb in enc for m in wb] + list(wi) + list(wh) + list(bh)
              + [head[0], head[1], vhead[0], vhead[1]])
    if encoder == "cnn":
        from drone_tpu.pixels import patch_grid

        gx, gy = patch_grid(geom.res, geom.p0)
        w_flat += [gx, gy]
    kernel = functools.partial(_lstm_traj_kernel, tc=tc, bptt=bptt,
                               task=task, integrator=integrator, n_enc=n_enc,
                               stochastic=stochastic, encoder=encoder,
                               geom=geom)
    traj, snap, ofs, ous, ost, oh, oc, stats = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((1, PR._NP), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            plane(PR.NF), plane(PR.NU), plane(PR.NI),
            hc_spec, hc_spec,
            pl.BlockSpec((1, 4), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            *[full(m.shape) for m in w_flat],
        ],
        out_specs=(
            pl.BlockSpec((tc, N_TRAJ, rb, 128), lambda i, t: (t, 0, i, 0),
                         memory_space=pltpu.VMEM),
            # one (c, h) snapshot slot per BPTT segment; every chunk of a
            # segment revisits the same block, flushed when t advances past
            # the segment boundary (bptt % tc == 0 by construction)
            pl.BlockSpec((1, 2, hidden, lanes_per_block),
                         lambda i, t: ((t * tc) // bptt, 0, 0, i),
                         memory_space=pltpu.VMEM),
            plane(PR.NF), plane(PR.NU), plane(PR.NI),
            hc_spec, hc_spec, plane(PR.N_STATS),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, N_TRAJ, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_seg, 2, hidden, n), jnp.float32),
            jax.ShapeDtypeStruct(fs.shape, jnp.float32),
            jax.ShapeDtypeStruct(us.shape, jnp.uint32),
            jax.ShapeDtypeStruct(st.shape, jnp.int32),
            jax.ShapeDtypeStruct((hidden, n), jnp.float32),
            jax.ShapeDtypeStruct((hidden, n), jnp.float32),
            jax.ShapeDtypeStruct((PR.N_STATS, rows, 128), jnp.float32),
        ),
        # CNN-encoder working set over the conservative scoped-vmem default
        # (same raise as the CNN trajectory kernel); dense keeps the default
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if encoder == "cnn"
            else None),
        interpret=interpret,
    )(pf, pi, fs, us, st, h0, c0, ls, *w_flat)
    out_carry = (oc.reshape(hidden, n).T, oh.reshape(hidden, n).T)  # (c, h)
    return (PR.unpack_state(ofs, ous, ost), out_carry, traj, snap,
            jnp.sum(stats, axis=(1, 2)))


def traj_lstm_rollout_pallas(state: EnvState, policy_params, carry,
                             env_params: EnvParams, statics: EnvStatics,
                             T: int, bptt: int | None = None,
                             lanes_per_block: int | None = None,
                             time_chunk: int | None = None,
                             interpret: bool = False,
                             stochastic: bool = True,
                             seg_layout: str = "batch"):
    """Run T fused LSTM-policy + env steps on-chip, emitting the PPO
    training trajectory AND the truncated-BPTT carry anchors.

    carry: flax LSTM carry (c, h), each (N, hidden). bptt: segment length
    (default T); T % bptt == 0. Returns (final EnvState, final carry,
    planes (T, N_TRAJ, rows, 128), seg_carries, stats dict) with
    S = T // bptt segments. seg_layout picks the anchor form:
    "batch" — (c, h) tuple, each (S, N, hidden), what
    ppo_rnn.segmented_forward consumes; "planes" — the kernel-natural
    (S, 2, hidden, N) snapshot buffer, consumed as-is by the BPTT update
    kernel (ops/pallas_update_lstm.py) with no relayout in between.

    Exploration noise comes from the SAME counter stream as the MLP
    trajectory kernel (blocks NOISE_BLOCK0 + 2*episode-step), so rollouts
    are reproducible and collision-free across chained calls."""
    n = state.pos.shape[0]
    enc, wi, wh, bh, head, vhead, ls = lstm_all_weights(policy_params)
    encoder, geom = lstm_encoder_kind(policy_params)
    hidden = wh[0].shape[0]
    bptt = bptt if bptt else T
    assert T % bptt == 0, (T, bptt)
    # (h, c) carry + snapshot + trajectory block working set: same
    # hidden*lanes <= 128k f32 budget as the acting kernel (at H=128 /
    # L=1024 the whole set is ~5 MB incl. double-buffered traj chunks),
    # floored at 1024 so compiled runs always have a legal lane block.
    # The CNN encoder's per-step working set (~12 MB at 1024 lanes, Y0
    # dominating) pins the pixel-recurrent family at the compiled minimum.
    cap = (1024 if encoder == "cnn"
           else max(1024, (131072 // max(hidden, 1)) // 128 * 128))
    if lanes_per_block is not None:
        cap = min(cap, lanes_per_block)
    lanes_per_block = PR.pick_lanes_per_block(n, min(8192, cap))
    PR.check_compiled_lane_block(lanes_per_block, n, interpret)
    tc = time_chunk if time_chunk is not None else pick_time_chunk(bptt)
    assert bptt % tc == 0, (bptt, tc)
    if not interpret and tc != T and tc % 8:
        # the trajectory output blocks (tc, N_TRAJ, rb, 128) tile a T-long
        # axis, so Mosaic needs tc to be a multiple of 8 or the whole of T.
        # tc divides bptt (snapshots land on chunk boundaries), so when
        # bptt < T and bptt isn't a multiple of 8 there is NO legal chunk —
        # interpret-mode tests can't see this (pick_time_chunk's k == T
        # escape is relative to bptt here, not the array's T).
        raise ValueError(
            f"compiled LSTM trajectory kernel needs bptt_horizon to be a "
            f"multiple of 8, or equal to the rollout horizon (got "
            f"bptt={bptt}, horizon={T} -> time chunk {tc}, not a legal "
            f"Mosaic trailing block dim). Use bptt_horizon in "
            f"{{8, 16, 24, ...}} or bptt_horizon == horizon, or "
            f"interpret=True for CPU runs.")
    assert seg_layout in ("batch", "planes"), seg_layout
    final, out_carry, traj, snap, stats = _traj_run(
        state, tuple(carry), (tuple(enc), wi, wh, bh, head, vhead), ls,
        env_params, T=T, tc=tc, bptt=bptt, lanes_per_block=lanes_per_block,
        task=statics.task, integrator=statics.integrator, n_enc=len(enc),
        interpret=interpret, stochastic=stochastic, encoder=encoder,
        geom=geom)
    if seg_layout == "planes":
        seg = snap
    else:
        seg = (snap[:, 0].transpose(0, 2, 1), snap[:, 1].transpose(0, 2, 1))
    return final, out_carry, traj, seg, PR._stats_dict(stats)


def traj_lstm_rollout_reference(state: EnvState, policy_params, carry,
                                env_params: EnvParams, statics: EnvStatics,
                                T: int, bptt: int | None = None,
                                stochastic: bool = True,
                                seg_layout: str = "batch"):
    """jnp mirror of traj_lstm_rollout_pallas: same plane-space matmul
    formulation ((H, in) @ (in, L) with pre-transposed kernels), same noise
    stream, same expression order. In interpret mode on the CPU backend the
    kernel matches this bitwise (single lane block). Returns
    (final EnvState, final carry, Traj (T, B, ...), seg_carries, stats);
    seg_layout as in traj_lstm_rollout_pallas ("planes" -> (S, 2, H, N))."""
    n = state.pos.shape[0]
    enc, wi, wh, bh, head, vhead, ls_row = lstm_all_weights(policy_params)
    encoder, geom = lstm_encoder_kind(policy_params)
    if encoder == "cnn":
        from drone_tpu.pixels import patch_grid

        gx, gy = patch_grid(geom.res, geom.p0)
    else:
        gx = gy = None
    hidden = wh[0].shape[0]
    bptt = bptt if bptt else T
    assert T % bptt == 0, (T, bptt)
    ls = [ls_row[0, k] for k in range(4)]
    c0 = jnp.asarray(carry[0], jnp.float32).T   # (H, N)
    h0 = jnp.asarray(carry[1], jnp.float32).T

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    enc_c = [(w, b[:, None]) for w, b in enc]
    bh_c = [b[:, None] for b in bh]

    def body(c, _):
        s, h, cc = c
        obs = jax.vmap(env_mod.observe)(s)            # (B, OBS_DIM)
        X = obs.T
        x = encode_features(X, enc_c, encoder=encoder, geom=geom,
                            gx=gx, gy=gy)
        *_, cc2, _th, h2 = lstm_gates(x, h, cc, wi, wh, bh_c, dot)
        mx = dot(head[0], h2) + head[1][:, None]
        vx = dot(vhead[0], h2) + vhead[1][:, None]
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
        keep = (1.0 - done.astype(jnp.float32)).reshape(1, n)
        tr = Traj(obs=obs, action=action, logp=logp, value=value,
                  reward=out.reward, done=done)
        aux = (jnp.where(done, out.ep_return, 0.0),
               jnp.where(done, out.ep_length.astype(jnp.float32), 0.0),
               cc, h)  # the carry ENTERING this step (anchor candidates)
        return (s2, h2 * keep, cc2 * keep), (tr, aux)

    (final, hT, cT), (traj, (ep_ret, ep_len, cs, hs)) = jax.lax.scan(
        body, (state, h0, c0), None, length=T)
    donef = traj.done.astype(jnp.float32)
    stats = {
        "reward_sum": jnp.sum(traj.reward),
        "episodes": jnp.sum(donef),
        "ep_return_sum": jnp.sum(ep_ret),
        "ep_length_sum": jnp.sum(ep_len),
        "ep_return_sq_sum": jnp.sum(ep_ret * ep_ret),
    }
    # anchors: the carries entering steps 0, bptt, 2*bptt, ...
    assert seg_layout in ("batch", "planes"), seg_layout
    if seg_layout == "planes":
        seg = jnp.stack([cs[::bptt], hs[::bptt]], axis=1)  # (S, 2, H, N)
    else:
        seg = (cs[::bptt].transpose(0, 2, 1), hs[::bptt].transpose(0, 2, 1))
    out_carry = (cT.T, hT.T)
    return final, out_carry, traj, seg, stats


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
    encoder, geom = lstm_encoder_kind(policy_params)
    hidden = weights[1][0].shape[0]
    # floored at 1024 like traj_lstm_rollout_pallas: compiled runs need a
    # 1024-aligned lane block regardless of the hidden*lanes VMEM heuristic;
    # the CNN encoder's working set pins the pixel-recurrent family at the
    # compiled minimum
    cap = (1024 if encoder == "cnn"
           else max(1024, (131072 // max(hidden, 1)) // 128 * 128))
    if lanes_per_block is not None:
        cap = min(cap, lanes_per_block)
    lanes_per_block = PR.pick_lanes_per_block(n, min(8192, cap))
    PR.check_compiled_lane_block(lanes_per_block, n, interpret)
    final, out_carry, stats = _run(
        state, tuple(carry), weights, env_params, T=T,
        lanes_per_block=lanes_per_block, task=statics.task,
        integrator=statics.integrator, n_enc=len(weights[0]),
        interpret=interpret, encoder=encoder, geom=geom)
    return final, out_carry, PR._stats_dict(stats)
