"""CNN PPO update megakernel: patch-conv forward+backward in VMEM.

The CNN counterpart of ops/pallas_update.py: one SGD minibatch pass for the
PatchCNNActorCritic policy with HAND-WRITTEN backprop, entirely in VMEM.
The grid streams (row-block, time-chunk) tiles of the kernel-natural
(T, N_TRAJ, rows, 128) trajectory planes — the SAME 21-float/sample buffer
the MLP trainer uses: pixels are REMATERIALIZED in-kernel from the stored
observation planes (render_patch on the shared splat parameters), so the
2304-float image never touches HBM in either direction. Because both convs
are patchify convs (kernel == stride), their backward is dense matmuls
against static row reorderings — conv1's input-gradient scatter is a pure
per-patch row assignment (each conv0 patch feeds exactly one conv1
window), no overlapping-window accumulation exists.

All gradient math lives in `_cnn_block_grads` (built on `cnn_forward` /
`render_patch` and pallas_update's `_head_grads`), shared VERBATIM by the
kernel and the pure-jnp mirror `ppo_cnn_update_reference` — in interpret
mode on the CPU backend the kernel matches the mirror bitwise, and a
separate test pins the hand-written backprop against jax.grad of the same
loss.

Reference: SURVEY.md §2.2 #9-#10 (`[U] pufferlib/models.py` CNN policy
variants under the minibatch PPO trainer); BASELINE.json:10.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drone_tpu.ops.pallas_acting_cnn import (
    CnnGeom,
    cnn_forward,
    conv1_patches,
    render_patch,
)
from drone_tpu.ops.pallas_acting_traj import N_TRAJ
from drone_tpu.ops.pallas_update import (
    N_UPSTATS,
    UpdateConsts,
    _head_grads,
    _read_block,
)

# flat kernel-tensor order for the CNN policy (the fused-optimizer /
# gradient layout): W0, b0, W1, b1, Wt, bt, head W/b, vhead W/b, log_std.
# Biases are (out, 1) columns so every tensor is 2-D.
N_CNN_TENSORS = 11  # incl. the trailing (1, 4) log_std


def cnn_encoder_bwd(dh, acts, enc_weights, gx, gy, geom: CnnGeom, dtype):
    """Hand-written backward of the patchify-CNN encoder (cnn_encode):
    dh (hidden, S) = d loss / d encoder output -> [gW0, gb0, gW1, gb1,
    gWt, gbt]. acts = (sp, Y0, Y1, X2, h) from cnn_encode(want_acts=True).
    Shared VERBATIM by _cnn_block_grads (the feedforward CNN update) and
    the pixel-recurrent BPTT update (ops/pallas_update_lstm._segment_grads)
    — one evaluation order, the bitwise kernel/mirror contract."""
    from drone_tpu.ops.pallas_acting_traj import _dot32

    W0, b0, W1, b1, Wt, bt = enc_weights
    dot = lambda p, q: _dot32(p, q, dtype)
    sp, Y0, Y1, X2, h = acts
    c0 = W0.shape[0]
    c1 = W1.shape[0]
    pp = geom.p0 * geom.p0

    # -- trunk ---------------------------------------------------------------
    dzt = dh * (h > 0.0).astype(jnp.float32)
    gWt = dot(dzt, X2.T)
    gbt = jnp.sum(dzt, axis=1, keepdims=True)
    dX2 = dot(Wt.T, dzt)                       # (n_q1*c1, S)

    # -- conv1 backward: per conv1 patch, un-concat dX2, relu-mask, weight
    # grad against the regathered conv0 outputs, and route the input grad
    # to the feeding conv0 patches (pure row assignment — patchify convs
    # have no overlapping windows) ------------------------------------------
    gW1 = jnp.zeros_like(W1)
    gb1 = jnp.zeros_like(b1)
    dY0 = [None] * geom.n_q0
    for q1, ps in enumerate(conv1_patches(geom)):
        dz1 = (dX2[q1 * c1:(q1 + 1) * c1]
               * (Y1[q1] > 0.0).astype(jnp.float32))
        X1_q = jnp.concatenate([Y0[p] for p in ps], axis=0)
        gW1 = gW1 + dot(dz1, X1_q.T)
        gb1 = gb1 + jnp.sum(dz1, axis=1, keepdims=True)
        dX1 = dot(W1.T, dz1)                   # (p1^2*c0, S)
        for k, p in enumerate(ps):
            dY0[p] = dX1[k * c0:(k + 1) * c0]

    # -- conv0 backward: rematerialize each patch's render block ------------
    gW0 = jnp.zeros_like(W0)
    gb0 = jnp.zeros_like(b0)
    for p in range(geom.n_q0):
        dz0 = dY0[p] * (Y0[p] > 0.0).astype(jnp.float32)
        X0_p = render_patch(sp, gx[p * pp:(p + 1) * pp],
                            gy[p * pp:(p + 1) * pp])
        gW0 = gW0 + dot(dz0, X0_p.T)
        gb0 = gb0 + jnp.sum(dz0, axis=1, keepdims=True)

    return [gW0, gb0, gW1, gb1, gWt, gbt]


def _cnn_block_grads(X, a, logp_old, v_old, adv, ret, weights, gx, gy,
                     geom: CnnGeom, ls, co, dtype):
    """Forward + hand-written backward for one sample block.

    X: (OBS_DIM, S) obs planes (S = tc*rbu*128); a/logp_old/v_old/adv/ret:
    per-sample planes; weights: cnn_all_weights tuple (ls slot unused);
    gx/gy: (res^2, 1) patch-major pixel-coordinate columns; ls: 4 log_std
    scalars. Every op runs identically inside the Mosaic kernel and in the
    jnp mirror — this function IS the bitwise contract (head math in
    `_head_grads`, shared with the MLP/LSTM update kernels).

    Returns (grad list matching the kernel tensor order WITHOUT log_std,
    stat planes tuple of N_UPSTATS).
    """
    from drone_tpu.ops.pallas_acting_traj import _dot32

    W0, b0, W1, b1, Wt, bt, head, vhead, _ = weights
    dot = lambda p, q: _dot32(p, q, dtype)
    S = X.shape[1]
    shape = a[0].shape

    mx, vx, acts = cnn_forward(X, weights, gx, gy, geom, dtype,
                               want_acts=True)
    h = acts[-1]
    m = [mx[k].reshape(shape) for k in range(4)]
    v = vx[0].reshape(shape)
    dm, g_v, stats = _head_grads(m, v, a, logp_old, v_old, adv, ret, ls, co)

    # -- heads ---------------------------------------------------------------
    dmx = jnp.stack(dm).reshape(4, S)
    dvx = g_v.reshape(1, S)
    gHw = dot(dmx, h.T)
    gHb = jnp.sum(dmx, axis=1, keepdims=True)
    gVw = dot(dvx, h.T)
    gVb = jnp.sum(dvx, axis=1, keepdims=True)

    # -- encoder (trunk + conv1 + conv0, shared hand-written backward) ------
    dh = dot(head[0].T, dmx) + dot(vhead[0].T, dvx)
    enc_g = cnn_encoder_bwd(dh, acts, (W0, b0, W1, b1, Wt, bt), gx, gy,
                            geom, dtype)
    grads = enc_g + [gHw, gHb, gVw, gVb]
    return grads, stats


def _cnn_update_kernel(perm_ref, pl_ref, ar_ref, ls_ref, gx_ref, gy_ref,
                       *refs, geom, co, compute_dtype):
    n_t = N_CNN_TENSORS - 1
    w_refs = refs[:n_t]
    g_refs = refs[n_t:2 * n_t]
    stats_ref = refs[2 * n_t]
    weights = (w_refs[0][:], w_refs[1][:], w_refs[2][:], w_refs[3][:],
               w_refs[4][:], w_refs[5][:],
               (w_refs[6][:], w_refs[7][:]), (w_refs[8][:], w_refs[9][:]),
               None)
    ls = [ls_ref[0, k] for k in range(4)]

    g = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((g == 0) & (t == 0))
    def _init():
        for r in g_refs:
            r[:] = jnp.zeros_like(r)
        stats_ref[:] = jnp.zeros_like(stats_ref)

    planes = pl_ref[:, :, 0]    # (Tc, N_TRAJ, 1, rbu, 128) -> drop n_rb
    ar = ar_ref[:, :, 0]
    X, a, logp_old, v_old, adv, ret = _read_block(planes, ar)
    grads, stats = _cnn_block_grads(X, a, logp_old, v_old, adv, ret,
                                    weights, gx_ref[:], gy_ref[:], geom, ls,
                                    co, compute_dtype)
    for r, val in zip(g_refs, grads):
        r[:] += val
    for k in range(N_UPSTATS):
        stats_ref[k] += stats[k]


@functools.partial(
    jax.jit,
    static_argnames=("n_sel", "tc", "rbu", "geom", "co", "interpret",
                     "compute_dtype"),
)
def _cnn_update_call(planes, advret, perm_mb, tensors, log_std, gx, gy, *,
                     n_sel, tc, rbu, geom, co, interpret=False,
                     compute_dtype="float32"):
    T, rows = planes.shape[0], planes.shape[2]
    nt = T // tc
    n_rb = rows // rbu
    planes = planes.reshape(T, N_TRAJ, n_rb, rbu, 128)
    advret = advret.reshape(2, T, n_rb, rbu, 128)
    tensors = tuple(tensors)

    def full(shp):
        return pl.BlockSpec(shp, lambda g, t, p: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sel, nt),
        in_specs=[
            pl.BlockSpec((tc, N_TRAJ, 1, rbu, 128),
                         lambda g, t, p: (t, 0, p[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tc, 1, rbu, 128),
                         lambda g, t, p: (0, t, p[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda g, t, p: (0, 0),
                         memory_space=pltpu.SMEM),
            full(gx.shape), full(gy.shape),
            *[full(t_.shape) for t_ in tensors],
        ],
        out_specs=(
            *[full(t_.shape) for t_ in tensors],
            pl.BlockSpec((N_UPSTATS, tc, rbu, 128),
                         lambda g, t, p: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(_cnn_update_kernel, geom=geom, co=co,
                               compute_dtype=jnp.dtype(compute_dtype).type)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            *[jax.ShapeDtypeStruct(t_.shape, jnp.float32) for t_ in tensors],
            jax.ShapeDtypeStruct((N_UPSTATS, tc, rbu, 128), jnp.float32),
        ),
        # fwd+bwd working set (conv0 outputs for all patches + conv1/trunk
        # activations + their gradients, ~25 MB at 1024 samples) overruns
        # the conservative 16 MB scoped-vmem default; physical VMEM is far
        # larger (same raise as the LSTM update kernel)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(perm_mb, planes, advret, log_std, gx, gy, *tensors)
    grads, stats = list(outs[:-1]), outs[-1]
    return grads, jnp.sum(stats, axis=(1, 2, 3))


def ppo_cnn_update_reference(planes, advret, perm_mb, tensors, log_std,
                             gx, gy, *, tc, rbu, geom: CnnGeom,
                             co: UpdateConsts, compute_dtype="float32"):
    """Pure-jnp mirror of the CNN update kernel: same block math
    (`_cnn_block_grads`), same (row-block, time-chunk) accumulation order.
    Bitwise contract for the interpret-mode tests; the CPU-backend CNN
    update path."""
    T = planes.shape[0]
    nt = T // tc
    n_sel = perm_mb.shape[0]
    ls = [log_std[0, k] for k in range(4)]
    tensors = list(tensors)
    weights = (tensors[0], tensors[1], tensors[2], tensors[3], tensors[4],
               tensors[5], (tensors[6], tensors[7]),
               (tensors[8], tensors[9]), None)
    acc0 = ([jnp.zeros_like(t_) for t_ in tensors],
            jnp.zeros((N_UPSTATS, tc, rbu, 128), jnp.float32))

    def body(acc, idx):
        g_acc, st_acc = acc
        g = idx // nt
        t = idx % nt
        rb = perm_mb[g]
        blk = jax.lax.dynamic_slice(
            planes, (t * tc, 0, rb * rbu, 0), (tc, N_TRAJ, rbu, 128))
        ar = jax.lax.dynamic_slice(
            advret, (0, t * tc, rb * rbu, 0), (2, tc, rbu, 128))
        X, a, logp_old, v_old, adv, ret = _read_block(blk, ar)
        grads, stats = _cnn_block_grads(X, a, logp_old, v_old, adv, ret,
                                        weights, gx, gy, geom, ls, co,
                                        jnp.dtype(compute_dtype).type)
        g_acc = [p + q for p, q in zip(g_acc, grads)]
        st_acc = st_acc + jnp.stack(stats)
        return (g_acc, st_acc), None

    (grads, st), _ = jax.lax.scan(body, acc0, jnp.arange(n_sel * nt))
    return grads, jnp.sum(st, axis=(1, 2, 3))


def ppo_cnn_update(planes, advret, perm_mb, tensors, log_std, gx, gy, *,
                   tc, geom: CnnGeom, co: UpdateConsts, rbu: int = 1,
                   mode: str = "kernel", interpret: bool = False,
                   compute_dtype: str = "float32"):
    """One CNN-PPO minibatch gradient pass over the trajectory planes.

    planes: (T, N_TRAJ, rows, 128) straight from the CNN trajectory rollout
    kernel (identical layout to the MLP trainer's — pixels are not stored);
    advret: (2, T, rows, 128); perm_mb: (n_sel,) int32 row-block indices;
    tensors: flat kernel-tensor list WITHOUT log_std (order at module top);
    gx/gy: pixels.patch_grid columns.

    Returns (grad list matching `tensors`, stat sums (N_UPSTATS,)).
    Gradients are SUMS scaled by co.inv_m; log_std's gradient lives in the
    stat sums (ST_DLS*) plus the caller's -ent_coef entropy term, exactly
    as the MLP update kernel.
    """
    if mode == "kernel":
        return _cnn_update_call(
            planes, advret, perm_mb, tuple(tensors), log_std, gx, gy,
            n_sel=perm_mb.shape[0], tc=tc, rbu=rbu, geom=geom, co=co,
            interpret=interpret, compute_dtype=compute_dtype)
    return ppo_cnn_update_reference(
        planes, advret, perm_mb, tensors, log_std, gx, gy, tc=tc, rbu=rbu,
        geom=geom, co=co, compute_dtype=compute_dtype)
