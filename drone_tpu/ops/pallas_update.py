"""PPO minibatch update megakernel: fused forward+backward in VMEM.

The XLA PPO update materializes every tower activation to HBM — at 64k
lanes x 128 steps that is ~100 GB of activation traffic per update and
dominates the train step (~280 of ~300 ms on one v5e; DESIGN.md §3). This
kernel runs one SGD minibatch pass with hand-written backprop entirely in
VMEM: the grid streams (row-block, time-chunk) tiles of the KERNEL-NATURAL
(T, N_TRAJ, rows, 128) trajectory planes produced by
ops/pallas_acting_traj.py — the exact buffer the rollout kernel wrote, no
relayout in between — the actor/critic towers run forward AND backward per
tile on the MXU, and weight-gradient + loss-stat accumulators live in
revisited output refs. HBM traffic is exactly one read of the minibatch's
training planes (~84 B/sample) — activations never leave the chip.

Minibatch selection is free: a scalar-prefetched row-block permutation
drives the input BlockSpec index maps (pltpu.PrefetchScalarGridSpec), so
"shuffle the batch" costs a small int32 array instead of a 700 MB gather.
Shuffling is at row-block granularity — `rbu` 128-lane rows per block
(rbu=8, i.e. 1024 lanes, on compiled runs: the second-minor block dim
tiles (8, 128) natively and each DMA run is a full 4 KB row; rbu=1 for
small interpret-mode tests). Lanes are iid, so 1024-lane groups
decorrelate minibatches exactly as well at fleet scale.

All gradient math lives in `_block_grads`, shared verbatim by the kernel
and by the pure-jnp mirror `ppo_update_reference` (same ops, same shapes,
same accumulation order) — in interpret mode on the CPU backend the kernel
matches the mirror bitwise, and a separate test pins the hand-written
backprop against jax.grad of the same loss to 1e-6.

Gradient conventions (CleanRL/PuffeRL clipped PPO, as drone_tpu.ppo.loss_fn):
  total = mean(pg) + vf_coef * 0.5 * mean(vl) - ent_coef * ent
  pg    = max(-adv*ratio, -adv*clip(ratio, 1 +- clip_eps))
  vl    = max((v-ret)^2, (v_old+clip(v-v_old, +-vf_clip)-ret)^2)
  ent   = sum_k(log_std_k + (1+log(2pi))/2)      (state-independent)
max/clip subgradients: the first branch wins ties; clip passes gradient
inside the closed interval.

Reference: SURVEY.md §2.2 #9 (`[U] pufferlib/pufferl.py` minibatch PPO
update, the GPU hot loop #2 of §3.1); BASELINE.json:10.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drone_tpu.ops.pallas_acting_traj import (
    N_TRAJ,
    _dot32,
    TP_ACT0,
    TP_LOGP,
    TP_OBS0,
    TP_VAL,
    _HALF_LOG_2PI,
)
from drone_tpu.types import OBS_DIM

# update-stat planes accumulated per sample block (reduced to scalars by
# the caller): policy loss, value loss terms, approx-KL, clip fraction,
# then the 4 per-dim log_std gradient contributions
ST_PG, ST_VL, ST_KL, ST_CF = 0, 1, 2, 3
ST_DLS0 = 4
N_UPSTATS = 8


@dataclasses.dataclass(frozen=True)
class UpdateConsts:
    """Static PPO constants baked into the kernel (recompile on change)."""

    clip_eps: float
    vf_clip: float
    vf_coef: float
    inv_m: float     # 1 / (samples per minibatch)


def _tower_fwd(x, weights, dtype=jnp.float32):
    """(in, S) -> (out, S) with the per-layer inputs retained for backprop.
    acts[i] is the input to layer i (acts[0] = x)."""
    acts = [x]
    n = len(weights)
    for li, (w, b) in enumerate(weights):
        x = _dot32(w, x, dtype) + (b if b.ndim == 2 else b[:, None])
        if li < n - 1:
            x = jnp.tanh(x)
        acts.append(x)
    return x, acts


def _tower_bwd(weights, acts, dy, dtype=jnp.float32):
    """Backprop dy (out, S) through the tower; returns [(dW, db), ...] with
    dW in the kernel's (out, in) orientation and db shaped (out, 1)."""
    grads = [None] * len(weights)
    for li in range(len(weights) - 1, -1, -1):
        w, _ = weights[li]
        dW = _dot32(dy, acts[li].T, dtype)
        db = jnp.sum(dy, axis=1, keepdims=True)
        grads[li] = (dW, db)
        if li > 0:
            dx = _dot32(w.T, dy, dtype)
            y = acts[li]  # tanh output of layer li-1
            dy = dx * (1.0 - y * y)
    return grads


def _head_grads(m, v, a, logp_old, v_old, adv, ret, ls, co):
    """PPO surrogate head gradients + stat planes for one sample block.

    m: 4 policy-mean planes; v: value plane; a: 4 stored action planes;
    logp_old/v_old/adv/ret: per-sample planes; ls: 4 log_std scalars.
    Elementwise and shape-agnostic — the ONE implementation of the clipped
    PPO loss derivative, shared by the MLP update kernel (`_block_grads`),
    the LSTM/BPTT update kernel (ops/pallas_update_lstm.py), and both jnp
    mirrors. Returns (dm[4] mean grads, g_v value grad, stats tuple of
    N_UPSTATS planes).
    """
    inv_m = jnp.float32(co.inv_m)
    C = jnp.float32(_HALF_LOG_2PI)

    # -- policy head: logp, ratio, clipped surrogate ------------------------
    z, lp = [], None
    for k in range(4):
        std_k = jnp.exp(ls[k])
        zk = (a[k] - m[k]) / std_k
        z.append(zk)
        term = jnp.float32(-0.5) * (zk * zk) - ls[k] - C
        lp = term if lp is None else lp + term
    ratio = jnp.exp(lp - logp_old)
    pg1 = -adv * ratio
    rclip = jnp.minimum(jnp.maximum(ratio, 1.0 - co.clip_eps),
                        1.0 + co.clip_eps)
    pg2 = -adv * rclip
    pg = jnp.maximum(pg1, pg2)
    use1 = pg1 >= pg2
    inclip = (ratio >= 1.0 - co.clip_eps) & (ratio <= 1.0 + co.clip_eps)
    dpg_dratio = jnp.where(use1 | inclip, -adv, 0.0)
    g_logp = inv_m * dpg_dratio * ratio

    # -- value head: clipped value loss -------------------------------------
    dv_raw = v - ret
    vdiff = jnp.minimum(jnp.maximum(v - v_old, -co.vf_clip), co.vf_clip)
    dv_c = (v_old + vdiff) - ret
    vl = jnp.maximum(dv_raw * dv_raw, dv_c * dv_c)
    use_raw = (dv_raw * dv_raw) >= (dv_c * dv_c)
    in_vclip = (v - v_old >= -co.vf_clip) & (v - v_old <= co.vf_clip)
    dvl_dv = jnp.where(use_raw, 2.0 * dv_raw,
                       jnp.where(in_vclip, 2.0 * dv_c, 0.0))
    g_v = jnp.float32(0.5 * co.vf_coef) * inv_m * dvl_dv

    dm = [g_logp * (z[k] / jnp.exp(ls[k])) for k in range(4)]
    stats = (pg, vl, logp_old - lp,
             (jnp.abs(ratio - 1.0) > co.clip_eps).astype(jnp.float32),
             g_logp * (z[0] * z[0] - 1.0), g_logp * (z[1] * z[1] - 1.0),
             g_logp * (z[2] * z[2] - 1.0), g_logp * (z[3] * z[3] - 1.0))
    return dm, g_v, stats


def _block_grads(X, a, logp_old, v_old, adv, ret, actor_w, critic_w, ls, co,
                 dtype=jnp.float32):
    """Forward + hand-written backward for one sample block.

    X: (OBS_DIM, S) obs matrix; a: 4 action planes; logp_old/v_old/adv/ret:
    per-sample planes; actor_w/critic_w: [(W (out,in), b (out,))]; ls: 4
    log_std scalars; co: UpdateConsts. Every op here runs identically inside
    the Mosaic kernel and in the jnp mirror — this function IS the bitwise
    contract (head math in `_head_grads`, shared with the LSTM update).

    Returns (actor grads, critic grads, stat planes tuple of N_UPSTATS).
    """
    S = X.shape[1]
    shape = a[0].shape

    mx, acts_a = _tower_fwd(X, actor_w, dtype)
    vx, acts_c = _tower_fwd(X, critic_w, dtype)
    m = [mx[k].reshape(shape) for k in range(4)]
    v = vx[0].reshape(shape)

    dm, g_v, stats = _head_grads(m, v, a, logp_old, v_old, adv, ret, ls, co)

    # -- backprop through the towers ----------------------------------------
    dmx = jnp.stack(dm).reshape(4, S)
    dvx = g_v.reshape(1, S)
    ga = _tower_bwd(actor_w, acts_a, dmx, dtype)
    gc = _tower_bwd(critic_w, acts_c, dvx, dtype)
    return ga, gc, stats


def _read_block(planes, ar):
    """Unpack one (Tc, N_TRAJ, rbu, 128) trajectory tile + (2, Tc, rbu, 128)
    adv/ret tile into _block_grads inputs (shared by kernel and mirror;
    plane-index slices on dim 1 are leading-dim slices of the tiled minor
    (rbu, 128) layout, so Mosaic relayouts them for free)."""
    Tc, rbu = planes.shape[0], planes.shape[2]
    S = Tc * rbu * 128
    X = jnp.stack([planes[:, TP_OBS0 + k] for k in range(OBS_DIM)]).reshape(
        OBS_DIM, S)
    a = [planes[:, TP_ACT0 + k] for k in range(4)]
    return (X, a, planes[:, TP_LOGP], planes[:, TP_VAL], ar[0], ar[1])


def _update_kernel(perm_ref, pl_ref, ar_ref, ls_ref, *refs,
                   n_actor, n_critic, co, compute_dtype):
    nw = 2 * (n_actor + n_critic)
    w_refs = refs[:nw]
    g_refs = refs[nw:2 * nw]
    stats_ref = refs[2 * nw]
    actor = [(w_refs[2 * i][:], w_refs[2 * i + 1][:]) for i in range(n_actor)]
    critic = [(w_refs[2 * (n_actor + i)][:], w_refs[2 * (n_actor + i) + 1][:])
              for i in range(n_critic)]
    ls = [ls_ref[0, k] for k in range(4)]

    g = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((g == 0) & (t == 0))
    def _init():
        for r in g_refs:
            r[:] = jnp.zeros_like(r)
        stats_ref[:] = jnp.zeros_like(stats_ref)

    planes = pl_ref[:, :, 0]    # (Tc, N_TRAJ, 1, rbu, 128) -> drop n_rb
    ar = ar_ref[:, :, 0]        # (2, Tc, 1, rbu, 128) -> (2, Tc, rbu, 128)
    X, a, logp_old, v_old, adv, ret = _read_block(planes, ar)
    ga, gc, stats = _block_grads(X, a, logp_old, v_old, adv, ret,
                                 actor, critic, ls, co, compute_dtype)
    flat = [m for wb in (*ga, *gc) for m in wb]
    for r, val in zip(g_refs, flat):
        r[:] += val
    for k in range(N_UPSTATS):
        stats_ref[k] += stats[k]


@functools.partial(
    jax.jit,
    static_argnames=("n_sel", "tc", "rbu", "n_actor", "n_critic", "co",
                     "interpret", "compute_dtype"),
)
def _update_call(planes, advret, perm_mb, actor_w, critic_w, log_std, *,
                 n_sel, tc, rbu, n_actor, n_critic, co, interpret=False,
                 compute_dtype="float32"):
    T, rows = planes.shape[0], planes.shape[2]
    nt = T // tc
    n_rb = rows // rbu
    # split rows -> (n_rb, rbu) so the block's trailing (rbu, 128) dims
    # EQUAL the array's (Mosaic's "divisible by 8 OR equal" rule: legal for
    # any rbu, including the small interpret-test shapes). The reshape
    # splits a major dim contiguously — layout-preserving, no copy.
    planes = planes.reshape(T, N_TRAJ, n_rb, rbu, 128)
    advret = advret.reshape(2, T, n_rb, rbu, 128)
    w_flat = [m for wb in (*actor_w, *critic_w) for m in wb]
    # gradient buffers: dW matches W (out, in); db is (out, 1) (2-D so the
    # VMEM accumulator tiles cleanly; the caller strips the column)
    g_shapes = [s for (w, b) in (*actor_w, *critic_w)
                for s in (w.shape, (w.shape[0], 1))]

    def full(shp):
        return pl.BlockSpec(shp, lambda g, t, p: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sel, nt),
        in_specs=[
            # kernel-natural (T, N_TRAJ, rows, 128) layout, straight from
            # the rollout kernel: one (time-chunk, all planes, row-block)
            # tile per grid step; the scalar-prefetched permutation p
            # drives the row-block index — minibatch gather for free
            pl.BlockSpec((tc, N_TRAJ, 1, rbu, 128),
                         lambda g, t, p: (t, 0, p[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tc, 1, rbu, 128),
                         lambda g, t, p: (0, t, p[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda g, t, p: (0, 0),
                         memory_space=pltpu.SMEM),
            *[full(m.shape) for m in w_flat],
        ],
        out_specs=(
            *[full(s) for s in g_shapes],
            pl.BlockSpec((N_UPSTATS, tc, rbu, 128),
                         lambda g, t, p: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(_update_kernel, n_actor=n_actor,
                               n_critic=n_critic, co=co,
                               compute_dtype=jnp.dtype(compute_dtype).type)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            *[jax.ShapeDtypeStruct(s, jnp.float32) for s in g_shapes],
            jax.ShapeDtypeStruct((N_UPSTATS, tc, rbu, 128), jnp.float32),
        ),
        interpret=interpret,
    )(perm_mb, planes, advret, log_std, *w_flat)
    grads_flat, stats = outs[:-1], outs[-1]
    return _fold_grads(grads_flat, n_actor, n_critic), jnp.sum(stats,
                                                               axis=(1, 2, 3))


def _fold_grads(flat, n_actor, n_critic):
    pairs = [(flat[2 * i], flat[2 * i + 1])
             for i in range(n_actor + n_critic)]
    return pairs[:n_actor], pairs[n_actor:]


def _grad_shapes(weights):
    return [(jnp.zeros_like(w), jnp.zeros((w.shape[0], 1), jnp.float32))
            for w, _ in weights]


def pick_row_block(mb_rows: int) -> int:
    """Rows per update tile: the largest power-of-two divisor of the
    minibatch's row count that is <= 8. 8 rows (1024 lanes) is the natural
    compiled tile — the (rbu, 128) minor dims are exactly one Mosaic tile
    and each plane's DMA run is a full 4 KB; smaller values serve the tiny
    interpret-mode test batches."""
    for k in (8, 4, 2):
        if mb_rows % k == 0:
            return k
    return 1


def pick_update_chunk(T: int, cap: int = 16) -> int:
    """Largest divisor of T that is <= cap. The time chunk is a LEADING
    block dim of the (tc, N_TRAJ, rbu, 128) update tile, so (unlike the
    rollout kernel's trailing chunk) it carries no multiple-of-8 rule; the
    caller shrinks cap so tc * rbu * 128 stays at the ~2048-sample compute
    tile the kernel was tuned at."""
    best = 1
    for k in range(1, min(cap, T) + 1):
        if T % k == 0:
            best = k
    return best


def ppo_update_reference(planes, advret, perm_mb, actor_w, critic_w,
                         log_std, *, tc, rbu, co: UpdateConsts,
                         compute_dtype="float32"):
    """Pure-jnp mirror of the update kernel: same block math
    (`_block_grads`), same (row-block, time-chunk) accumulation order.
    Bitwise contract for the interpret-mode tests; the CPU-backend update
    path."""
    T = planes.shape[0]
    nt = T // tc
    n_sel = perm_mb.shape[0]
    ls = [log_std[0, k] for k in range(4)]
    acc0 = ([tuple(g) for g in _grad_shapes(actor_w)],
            [tuple(g) for g in _grad_shapes(critic_w)],
            jnp.zeros((N_UPSTATS, tc, rbu, 128), jnp.float32))

    def body(acc, idx):
        ga_acc, gc_acc, st_acc = acc
        g = idx // nt
        t = idx % nt
        rb = perm_mb[g]
        blk = jax.lax.dynamic_slice(
            planes, (t * tc, 0, rb * rbu, 0), (tc, N_TRAJ, rbu, 128))
        ar = jax.lax.dynamic_slice(
            advret, (0, t * tc, rb * rbu, 0), (2, tc, rbu, 128))
        X, a, logp_old, v_old, adv, ret = _read_block(blk, ar)
        ga, gc, stats = _block_grads(X, a, logp_old, v_old, adv, ret,
                                     actor_w, critic_w, ls, co,
                                     jnp.dtype(compute_dtype).type)
        ga_acc = [(aw + w, ab + b) for (aw, ab), (w, b) in zip(ga_acc, ga)]
        gc_acc = [(aw + w, ab + b) for (aw, ab), (w, b) in zip(gc_acc, gc)]
        st_acc = st_acc + jnp.stack(stats)
        return (ga_acc, gc_acc, st_acc), None

    (ga, gc, st), _ = jax.lax.scan(body, acc0, jnp.arange(n_sel * nt))
    return (ga, gc), jnp.sum(st, axis=(1, 2, 3))


def ppo_update(planes, advret, perm_mb, actor_w, critic_w, log_std, *,
               tc, co: UpdateConsts, rbu: int = 1, mode: str = "kernel",
               interpret: bool = False, compute_dtype: str = "float32"):
    """One PPO minibatch gradient pass over the trajectory planes.

    planes: (T, N_TRAJ, rows, 128) straight from the trajectory rollout
    kernel (its natural layout — no relayout between the two kernels);
    advret: (2, T, rows, 128) stacked (normalized advantage, return);
    perm_mb: (n_sel,) int32 ROW-BLOCK indices of this minibatch — block i
    covers rows [i*rbu, (i+1)*rbu).
    Returns ((actor grads, critic grads), stat sums (N_UPSTATS,)).
    Gradients are SUMS scaled by inv_m (i.e. the mean-loss gradient);
    log_std's gradient lives in the stat sums (ST_DLS*) plus the caller's
    -ent_coef entropy term.
    """
    actor_w = tuple(actor_w)
    critic_w = tuple(critic_w)
    if mode == "kernel":
        return _update_call(planes, advret, perm_mb, actor_w, critic_w,
                            log_std, n_sel=perm_mb.shape[0], tc=tc, rbu=rbu,
                            n_actor=len(actor_w), n_critic=len(critic_w),
                            co=co, interpret=interpret,
                            compute_dtype=compute_dtype)
    return ppo_update_reference(planes, advret, perm_mb, actor_w, critic_w,
                                log_std, tc=tc, rbu=rbu, co=co,
                                compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# Fused clip+adam optimizer kernel: one launch per SGD step for the whole
# (clip_by_global_norm -> adam) pipeline that optax spreads over ~100 tiny
# XLA ops (~0.9 ms of launch glue per step on the tunneled v5e). All params
# are a few KB, so the kernel is a single grid step with every tensor in
# VMEM; the math mirrors optax.chain(clip_by_global_norm, adam(eps=1e-5))
# and is shared with the jnp mirror via _adam_math.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AdamConsts:
    """Static optimizer constants (match ppo.make_optimizer's chain)."""

    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-5
    clip_norm: float = 0.5


def _adam_math(tensors, grads, mus, nus, lr, count, ac: AdamConsts):
    """The one (clip+adam) implementation: lists of arrays -> updated lists.
    lr/count are traced scalars; runs identically in-kernel and in the
    mirror."""
    ss = None
    for g in grads:
        s = jnp.sum(g * g)
        ss = s if ss is None else ss + s
    gn = jnp.sqrt(ss)
    clip = jnp.float32(ac.clip_norm)
    scale = jnp.where(gn > clip, clip / gn, jnp.float32(1.0))
    c = count + 1.0
    bc1 = 1.0 - jnp.exp(c * jnp.float32(math.log(ac.b1)))
    bc2 = 1.0 - jnp.exp(c * jnp.float32(math.log(ac.b2)))
    b1 = jnp.float32(ac.b1)
    b2 = jnp.float32(ac.b2)
    eps = jnp.float32(ac.eps)
    out_w, out_mu, out_nu = [], [], []
    for w, g, mu, nu in zip(tensors, grads, mus, nus):
        gc_ = g * scale
        mu2 = b1 * mu + (1.0 - b1) * gc_
        nu2 = b2 * nu + (1.0 - b2) * (gc_ * gc_)
        upd = -lr * (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
        out_w.append(w + upd)
        out_mu.append(mu2)
        out_nu.append(nu2)
    return out_w, out_mu, out_nu


def _adam_kernel(sc_ref, *refs, n, ac):
    grads = [refs[i][:] for i in range(n)]
    tensors = [refs[n + i][:] for i in range(n)]
    mus = [refs[2 * n + i][:] for i in range(n)]
    nus = [refs[3 * n + i][:] for i in range(n)]
    ow = refs[4 * n:5 * n]
    omu = refs[5 * n:6 * n]
    onu = refs[6 * n:7 * n]
    lr = sc_ref[0, 0]
    count = sc_ref[0, 1]
    w2, mu2, nu2 = _adam_math(tensors, grads, mus, nus, lr, count, ac)
    for r, v in zip(ow, w2):
        r[:] = v
    for r, v in zip(omu, mu2):
        r[:] = v
    for r, v in zip(onu, nu2):
        r[:] = v


@functools.partial(jax.jit, static_argnames=("ac", "interpret"))
def _adam_call(grads, tensors, mus, nus, lr, count, *, ac: AdamConsts,
               interpret=False):
    n = len(tensors)
    sc = jnp.stack([jnp.float32(lr), jnp.float32(count)]).reshape(1, 2)

    def full(shp):
        return pl.BlockSpec(shp, lambda: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_adam_kernel, n=n, ac=ac),
        grid=(),
        in_specs=[
            pl.BlockSpec((1, 2), lambda: (0, 0), memory_space=pltpu.SMEM),
            *[full(t.shape) for t in (*grads, *tensors, *mus, *nus)],
        ],
        out_specs=tuple(full(t.shape) for t in (*tensors, *tensors, *tensors)),
        out_shape=tuple(jax.ShapeDtypeStruct(t.shape, jnp.float32)
                        for t in (*tensors, *tensors, *tensors)),
        interpret=interpret,
    )(sc, *grads, *tensors, *mus, *nus)
    return (list(outs[:n]), list(outs[n:2 * n]), list(outs[2 * n:]))


def fused_adam(grads, tensors, mus, nus, lr, count, *, ac: AdamConsts,
               mode: str = "kernel", interpret: bool = False):
    """clip_by_global_norm + adam over kernel-layout tensor lists.

    Returns (new tensors, new mu, new nu). mode="reference" runs the shared
    math as plain jnp (bitwise contract with the kernel in interpret mode).
    """
    if mode == "kernel":
        return _adam_call(tuple(grads), tuple(tensors), tuple(mus),
                          tuple(nus), lr, count, ac=ac, interpret=interpret)
    return _adam_math(list(tensors), list(grads), list(mus), list(nus),
                      jnp.float32(lr), jnp.float32(count), ac)
