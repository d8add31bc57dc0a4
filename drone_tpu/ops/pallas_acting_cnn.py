"""Fused CNN-policy + env trajectory megakernel (pixel training at kernel
speed).

The CNN counterpart of pallas_acting_traj.py: the PatchCNNActorCritic
policy (models/cnn.py — on-device pixel render + two NON-OVERLAPPING patch
convolutions + dense trunk + Gaussian/value heads) runs inside the
VMEM-resident rollout kernel, fused with the env step.

TPU-first structure (why this is fast, and why the model is shaped the way
it is):

  - The pixel image is NEVER stored or streamed: each 4x4 patch of the
    splat image is REMATERIALIZED in-kernel from the 13-float observation
    (drone_tpu.pixels.splat_inputs's 12 per-lane splat scalars + the
    patch's constant pixel-coordinate columns). The trajectory planes are
    the SAME 21 floats/sample as the MLP trainer — the 2304-float image
    costs zero HBM traffic.
  - Both convs have kernel == stride (patchify convs), so im2col is a pure
    static row reordering in the kernel's plane layout: conv0 consumes
    per-patch (p0*p0*C, L) render blocks, conv1 consumes concatenations of
    conv0's per-patch outputs, and every FLOP lands in a dense MXU matmul.
    No gathers, no strided windows, no halo exchange.
  - Everything stays in plane space: activations are (features, L)
    matrices per patch, the trunk/heads are exactly the MLP kernel's
    formulation.

All policy math lives in `cnn_forward` (built on `render_patch` and the
shared `_dot32`), used verbatim by this kernel, its pure-jnp mirror
`traj_cnn_rollout_reference`, the BPTT-free update kernel
(ops/pallas_update_cnn.py), and the trainer's last-value computation —
one evaluation order everywhere, so interpret-mode kernel-vs-mirror
comparisons are bitwise (the pallas_acting_traj contract).

Reference: SURVEY.md §2.2 #10 (`[U] pufferlib/models.py` CNN policy
variants trained by the same minibatch PPO trainer); BASELINE.json:10.
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

from drone_tpu.pixels import SPLAT_SIGMA as _SIGMA

N_CHAN = 4          # splat image channels (pixels.obs_to_pixels)


class CnnGeom:
    """Static patch geometry derived from the model hyperparameters.

    res: image side; p0/p1: conv kernel==stride sizes. g0 = res//p0 conv0
    patches per side (n_q0 = g0^2 patches), g1 = g0//p1 conv1 patches per
    side (n_q1 = g1^2). Hashable (kernel static arg)."""

    def __init__(self, res: int, p0: int, p1: int):
        assert res % p0 == 0 and (res // p0) % p1 == 0, (res, p0, p1)
        self.res, self.p0, self.p1 = res, p0, p1
        self.g0 = res // p0
        self.n_q0 = self.g0 * self.g0
        self.g1 = self.g0 // p1
        self.n_q1 = self.g1 * self.g1
        self.key = (res, p0, p1)

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return isinstance(other, CnnGeom) and self.key == other.key


def cnn_encoder_weights(p, geom: CnnGeom):
    """conv0/conv1/trunk params -> MXU-ready (W0 (c0, C*p0^2), b0 (c0, 1),
    W1 (c1, p1^2*c0), b1 (c1, 1), Wt (hidden, n_q1*c1), bt (hidden, 1)).
    The layout transforms documented on cnn_all_weights; shared by the CNN
    and pixel-recurrent (cnn_lstm) weight extractors."""
    k0 = jnp.asarray(p["conv0"]["kernel"], jnp.float32)   # (p0, p0, C, c0)
    c0 = k0.shape[-1]
    W0 = k0.transpose(2, 0, 1, 3).reshape(N_CHAN * geom.p0 * geom.p0, c0).T
    b0 = jnp.asarray(p["conv0"]["bias"], jnp.float32).reshape(-1, 1)
    k1 = jnp.asarray(p["conv1"]["kernel"], jnp.float32)   # (p1, p1, c0, c1)
    c1 = k1.shape[-1]
    W1 = k1.reshape(geom.p1 * geom.p1 * c0, c1).T
    b1 = jnp.asarray(p["conv1"]["bias"], jnp.float32).reshape(-1, 1)
    Wt = jnp.asarray(p["trunk"]["kernel"], jnp.float32).T
    bt = jnp.asarray(p["trunk"]["bias"], jnp.float32).reshape(-1, 1)
    return W0, b0, W1, b1, Wt, bt


def cnn_all_weights(params, geom: CnnGeom):
    """PatchCNNActorCritic params -> MXU-ready kernel tensors.

    Returns (W0 (c0, C*p0^2), b0 (c0, 1), W1 (c1, p1^2*c0), b1 (c1, 1),
    Wt (hidden, n_q1*c1), bt (hidden, 1), head (4, hidden) + (4, 1),
    vhead (1, hidden) + (1, 1), ls (1, 4)). Layout-only transforms:

    - conv0 within-patch row order is CHANNEL-major (w = c*p0^2 + s,
      s = di*p0 + dj): the kernel renders per-channel patch blocks and
      concatenates them, so the flax (di, dj, cin, cout) kernel is
      transposed to (cin, di, dj, cout) before flattening.
    - conv1 within order matches flax's C-order (di, dj, cin) flatten
      (the kernel concatenates conv0 patch outputs in (di, dj) order).
    - trunk consumes flax's flatten order (q = qi*g1 + qj, then channel).
    """
    p = params["params"] if "params" in params else params
    W0, b0, W1, b1, Wt, bt = cnn_encoder_weights(p, geom)
    d = p["actor_mean"]
    head = (jnp.asarray(d["kernel"], jnp.float32).T,
            jnp.asarray(d["bias"], jnp.float32).reshape(-1, 1))
    d = p["critic_value"]
    vhead = (jnp.asarray(d["kernel"], jnp.float32).T,
             jnp.asarray(d["bias"], jnp.float32).reshape(-1, 1))
    ls = jnp.asarray(p["log_std"], jnp.float32).reshape(1, 4)
    return W0, b0, W1, b1, Wt, bt, head, vhead, ls


def splat_planes(X):
    """Plane-space pixels.splat_inputs: X (OBS_DIM, L) obs planes ->
    4 x (u0 (1, L), u1 (1, L), amp (1, L)) splat parameters.

    Same formulas as pixels.splat_inputs re-expressed on (rows, L) planes
    (explicit left-associated 3-term sums instead of jnp.sum over a stacked
    axis); shared verbatim by the kernel, the mirror, and the update
    kernel's rematerializer — THE bitwise contract for the render."""
    rel = X[0:3]
    w, x, y, z = X[3:4], X[4:5], X[5:6], X[6:7]
    vel = X[7:10]
    om = X[10:13]
    # rows of R^T (world->body), as pixels.body_rotation_t
    r00, r01, r02 = 1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)
    r10, r11, r12 = 2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x)
    r20, r21, r22 = 2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)

    def body3(v):
        v0, v1, v2 = v[0:1], v[1:2], v[2:3]
        return (r00 * v0 + r01 * v1 + r02 * v2,
                r10 * v0 + r11 * v1 + r12 * v2,
                r20 * v0 + r21 * v1 + r22 * v2)

    rel_b = body3(rel)
    vel_b = body3(vel)
    up_b = (r02, r12, r22)   # R^T @ (0, 0, 1)

    def dir2(v0, v1, v2):
        n = jnp.sqrt(v0 * v0 + v1 * v1 + v2 * v2)
        inv = 1.0 / (1.0 + n)
        return v0 * inv, v1 * inv, n

    t0, t1, d_t = dir2(*rel_b)
    v0, v1, d_v = dir2(*vel_b)
    w0, w1, d_w = dir2(om[0:1], om[1:2], om[2:3])
    return (
        (t0, t1, 1.0 / (1.0 + d_t)),
        (up_b[0], up_b[1], 0.5 + 0.5 * up_b[2]),
        (v0, v1, d_v / (1.0 + d_v)),
        (w0, w1, d_w / (1.0 + d_w)),
    )


def render_patch(sp, gxp, gyp):
    """One conv0 input block: splat params `sp` (from splat_planes) + the
    patch's pixel-coordinate columns gxp/gyp (p0^2, 1) -> (C*p0^2, L)
    channel-major rows (channel c's p0^2 pixel rows, then channel c+1's)."""
    inv = jnp.float32(1.0 / (2.0 * _SIGMA * _SIGMA))
    rows = []
    for (u0, u1, amp) in sp:
        d2 = (gxp - u0) ** 2 + (gyp - u1) ** 2       # (p0^2, L)
        rows.append(amp * jnp.exp(-d2 * inv))
    return jnp.concatenate(rows, axis=0)


def conv1_patches(geom: CnnGeom):
    """Static conv0-patch index lists per conv1 patch: [(q1, [p...])] where
    the p's are in (di, dj) C-order — the conv1 within-row order."""
    out = []
    for pi in range(geom.g1):
        for pj in range(geom.g1):
            ps = [(pi * geom.p1 + di) * geom.g0 + (pj * geom.p1 + dj)
                  for di in range(geom.p1) for dj in range(geom.p1)]
            out.append(ps)
    return out


def cnn_encode(X, enc_weights, gx, gy, geom: CnnGeom, dtype,
               want_acts: bool = False):
    """THE shared patchify-CNN ENCODER (plane space): X (OBS_DIM, L) obs
    planes -> h (hidden, L) relu trunk features[, acts] where acts =
    (sp, Y0 (n_q0, c0, L), Y1 (n_q1, c1, L), X2 (n_q1*c1, L), h) — the
    residuals the conv backward needs (note acts[-1] is h, matching the
    dense lstm_encoder convention that acts[-1] is the tower output).
    enc_weights = (W0, b0, W1, b1, Wt, bt) with (out, 1) column biases;
    gx/gy: (res^2, 1) pixel-coordinate columns in patch-major row order
    (pixels.patch_grid). One evaluation order for every consumer — the CNN
    rollout/update kernels and mirrors AND the pixel-recurrent (cnn_lstm)
    kernels — change here only."""
    W0, b0, W1, b1, Wt, bt = enc_weights
    dot = lambda a, b: _dot32(a, b, dtype)
    pp = geom.p0 * geom.p0
    sp = splat_planes(X)
    Y0 = jnp.stack([
        jnp.maximum(dot(W0, render_patch(
            sp, gx[p * pp:(p + 1) * pp], gy[p * pp:(p + 1) * pp])) + b0, 0.0)
        for p in range(geom.n_q0)], axis=0)                 # (n_q0, c0, L)
    Y1 = jnp.stack([
        jnp.maximum(dot(W1, jnp.concatenate([Y0[p] for p in ps], axis=0))
                    + b1, 0.0)
        for ps in conv1_patches(geom)], axis=0)             # (n_q1, c1, L)
    X2 = jnp.concatenate([Y1[q] for q in range(geom.n_q1)], axis=0)
    h = jnp.maximum(dot(Wt, X2) + bt, 0.0)                  # (hidden, L)
    if want_acts:
        return h, (sp, Y0, Y1, X2, h)
    return h


def cnn_forward(X, weights, gx, gy, geom: CnnGeom, dtype,
                want_acts: bool = False):
    """THE shared CNN tower (plane space): X (OBS_DIM, L) obs planes ->
    (m (4, L) action means, v (1, L) values[, acts]) — cnn_encode plus the
    Gaussian/value heads. One evaluation order for the rollout kernel, its
    mirror, the update kernel, and the trainer's last-value — change the
    encoder in cnn_encode, the heads here."""
    W0, b0, W1, b1, Wt, bt, head, vhead, _ = weights
    dot = lambda a, b: _dot32(a, b, dtype)
    h, acts = cnn_encode(X, (W0, b0, W1, b1, Wt, bt), gx, gy, geom, dtype,
                         want_acts=True)
    m = dot(head[0], h) + head[1]                           # (4, L)
    v = dot(vhead[0], h) + vhead[1]                         # (1, L)
    if want_acts:
        return m, v, acts
    return m, v


def infer_cnn_geom(p) -> CnnGeom:
    """Patch geometry from parameter SHAPES (static at trace time): p is a
    param dict holding conv0/conv1/trunk. kernel == stride is the module's
    architectural invariant (models/cnn.py patch_cnn_trunk), so the shapes
    determine the geometry: p0/p1 from the conv kernels, the grid side from
    the trunk input. Used by the recurrent kernels to auto-detect the
    pixel encoder from CNNLSTMActorCritic params."""
    k0 = p["conv0"]["kernel"]
    k1 = p["conv1"]["kernel"]
    p0, p1, c1 = k0.shape[0], k1.shape[0], k1.shape[3]
    trunk_in = p["trunk"]["kernel"].shape[0]
    g1 = int(round((trunk_in // c1) ** 0.5))
    assert g1 * g1 * c1 == trunk_in, (trunk_in, c1)
    return CnnGeom(g1 * p1 * p0, p0, p1)


def _cnn_traj_kernel(pf_ref, pi_ref, fs_ref, us_ref, st_ref, ls_ref, gx_ref,
                     gy_ref, *refs, tc, task, integrator, geom, stochastic,
                     compute_dtype):
    # refs: W0 b0 W1 b1 Wt bt headW headb vheadW vheadb, then outputs:
    # traj, ofs, ous, ost, stats
    w_refs, out_refs = refs[:10], refs[10:]
    traj_ref, ofs_ref, ous_ref, ost_ref, stats_ref = out_refs
    weights = (w_refs[0][:], w_refs[1][:], w_refs[2][:], w_refs[3][:],
               w_refs[4][:], w_refs[5][:],
               (w_refs[6][:], w_refs[7][:]), (w_refs[8][:], w_refs[9][:]),
               None)
    ls = [ls_ref[0, k] for k in range(4)]
    gx = gx_ref[:]
    gy = gy_ref[:]

    t = pl.program_id(1)

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

    def body(s, carry):
        c, acc = carry
        X = PR.obs_matrix(c, L)
        mx, vx = cnn_forward(X, weights, gx, gy, geom, compute_dtype)
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
                     "geom", "interpret", "stochastic", "compute_dtype"),
    donate_argnums=(0,),
)
def _traj_run(state, env_params, weights, gx, gy, *, T, tc, lanes_per_block,
              task, integrator, geom, interpret=False, stochastic=True,
              compute_dtype="float32"):
    n = state.pos.shape[0]
    fs, us, st = PR.pack_state(state, n // 128)
    pf, pi = PR._pack_params(env_params)
    rows = fs.shape[1]
    rb = lanes_per_block // 128
    nb = rows // rb
    nt = T // tc
    ls = weights[-1]
    w_flat = [weights[0], weights[1], weights[2], weights[3], weights[4],
              weights[5], weights[6][0], weights[6][1], weights[7][0],
              weights[7][1]]
    plane = lambda nf: pl.BlockSpec((nf, rb, 128), lambda i, t: (0, i, 0),
                                    memory_space=pltpu.VMEM)

    def full(shp):
        return pl.BlockSpec(shp, lambda i, t: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_cnn_traj_kernel, tc=tc, task=task,
                               integrator=integrator, geom=geom,
                               stochastic=stochastic,
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
            full(gx.shape), full(gy.shape),
            *[full(m.shape) for m in w_flat],
        ],
        out_specs=(
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
        # the per-step working set (conv0 outputs for all patches + render
        # blocks + trunk activations, ~12 MB at 1024 lanes) overruns XLA's
        # conservative 16 MB scoped-vmem default once the double-buffered
        # trajectory blocks are added; physical VMEM is far larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(pf, pi, fs, us, st, ls, gx, gy, *w_flat)
    return traj, PR.unpack_state(ofs, ous, ost), jnp.sum(stats, axis=(1, 2))


def traj_cnn_rollout_pallas(state: EnvState, policy_params,
                            env_params: EnvParams, statics: EnvStatics,
                            T: int, geom: CnnGeom | None = None,
                            lanes_per_block: int | None = None,
                            time_chunk: int | None = None,
                            interpret: bool = False, stochastic: bool = True,
                            compute_dtype: str = "float32"):
    """Run T fused CNN-policy + env steps on-chip, emitting the PPO training
    planes (T, N_TRAJ, rows, 128) — the SAME buffer layout as the MLP
    trajectory kernel (pixels are rematerialized, never stored).

    Returns (final EnvState, planes, stats dict). geom defaults to the
    PatchCNNActorCritic defaults (24, 4, 2)."""
    n = state.pos.shape[0]
    geom = geom if geom is not None else CnnGeom(24, 4, 2)
    from drone_tpu.pixels import patch_grid

    gx, gy = patch_grid(geom.res, geom.p0)
    weights = cnn_all_weights(policy_params, geom)
    # per-step VMEM working set is ~12 MB at 1024 lanes (Y0 dominates:
    # n_q0 * c0 * L floats) — keep the lane block at the compiled minimum
    cap = 1024
    if lanes_per_block is not None:
        cap = min(cap, lanes_per_block)
    lanes_per_block = PR.pick_lanes_per_block(n, cap)
    PR.check_compiled_lane_block(lanes_per_block, n, interpret)
    tc = time_chunk if time_chunk is not None else pick_time_chunk(T, cap=8)
    assert T % tc == 0, (T, tc)
    traj, final, stats = _traj_run(
        state, env_params, weights, gx, gy, T=T, tc=tc,
        lanes_per_block=lanes_per_block, task=statics.task,
        integrator=statics.integrator, geom=geom, interpret=interpret,
        stochastic=stochastic, compute_dtype=compute_dtype)
    return final, traj, PR._stats_dict(stats)


def _cnn_act_kernel(pf_ref, pi_ref, fs_ref, us_ref, st_ref, ls_ref, gx_ref,
                    gy_ref, *refs, T, task, integrator, geom, stochastic,
                    compute_dtype):
    # refs: W0 b0 W1 b1 Wt bt headW headb vheadW vheadb, then outputs:
    # ofs, ous, ost, stats
    w_refs, out_refs = refs[:10], refs[10:]
    ofs_ref, ous_ref, ost_ref, stats_ref = out_refs
    weights = (w_refs[0][:], w_refs[1][:], w_refs[2][:], w_refs[3][:],
               w_refs[4][:], w_refs[5][:],
               (w_refs[6][:], w_refs[7][:]), (w_refs[8][:], w_refs[9][:]),
               None)
    ls = [ls_ref[0, k] for k in range(4)]
    gx = gx_ref[:]
    gy = gy_ref[:]

    P = PR._P(pf_ref, pi_ref)
    c0 = PR.read_carry(fs_ref, us_ref, st_ref)
    shape = c0[0].shape
    L = shape[0] * 128
    zero = jnp.zeros(shape, jnp.float32)
    acc0 = (zero,) * PR.N_STATS

    def body(t, carry):
        c, acc = carry
        X = PR.obs_matrix(c, L)
        mx, _ = cnn_forward(X, weights, gx, gy, geom, compute_dtype)
        m = [mx[k].reshape(shape) for k in range(4)]
        if stochastic:
            rc, k0, k1, stp = c[22], c[23], c[24], c[19]
            z = _gauss4_planes(k0, k1, rc, stp, PR._uniform)
            a, _ = _sample_logp(m, z, ls, stochastic)
        else:
            a = m
        c2, r, done, epret2, step2 = PR._env_step(c, a[0], a[1], a[2], a[3],
                                                  P, task, integrator)
        return c2, PR.accumulate(acc, r, done, epret2, step2)

    c, acc = jax.lax.fori_loop(0, T, body, (c0, acc0))
    PR.write_back(c, acc, ofs_ref, ous_ref, ost_ref, stats_ref)


@functools.partial(
    jax.jit,
    static_argnames=("T", "lanes_per_block", "task", "integrator", "geom",
                     "interpret", "stochastic", "compute_dtype"),
    donate_argnums=(0,),
)
def _act_run(state, env_params, weights, gx, gy, *, T, lanes_per_block,
             task, integrator, geom, interpret=False, stochastic=False,
             compute_dtype="float32"):
    n = state.pos.shape[0]
    fs, us, st = PR.pack_state(state, n // 128)
    pf, pi = PR._pack_params(env_params)
    rows = fs.shape[1]
    rb = lanes_per_block // 128
    nb = rows // rb
    ls = weights[-1]
    w_flat = [weights[0], weights[1], weights[2], weights[3], weights[4],
              weights[5], weights[6][0], weights[6][1], weights[7][0],
              weights[7][1]]
    plane = lambda nf: pl.BlockSpec((nf, rb, 128), lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)

    def full(shp):
        return pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_cnn_act_kernel, T=T, task=task,
                               integrator=integrator, geom=geom,
                               stochastic=stochastic,
                               compute_dtype=jnp.dtype(compute_dtype).type)
    ofs, ous, ost, stats = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, PR._NP), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            plane(PR.NF), plane(PR.NU), plane(PR.NI),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full(gx.shape), full(gy.shape),
            *[full(m.shape) for m in w_flat],
        ],
        out_specs=(plane(PR.NF), plane(PR.NU), plane(PR.NI),
                   plane(PR.N_STATS)),
        out_shape=(
            jax.ShapeDtypeStruct(fs.shape, jnp.float32),
            jax.ShapeDtypeStruct(us.shape, jnp.uint32),
            jax.ShapeDtypeStruct(st.shape, jnp.int32),
            jax.ShapeDtypeStruct((PR.N_STATS, rows, 128), jnp.float32),
        ),
        # same scoped-VMEM story as the trajectory kernel: the per-step
        # working set (all conv0 patch outputs + render blocks + trunk
        # activations, ~12 MB at 1024 lanes) overruns the conservative
        # 16 MB default; physical VMEM is far larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(pf, pi, fs, us, st, ls, gx, gy, *w_flat)
    return PR.unpack_state(ofs, ous, ost), jnp.sum(stats, axis=(1, 2))


def cnn_act_rollout_pallas(state: EnvState, policy_params,
                           env_params: EnvParams, statics: EnvStatics,
                           T: int, geom: CnnGeom | None = None,
                           lanes_per_block: int | None = None,
                           interpret: bool = False, stochastic: bool = False,
                           compute_dtype: str = "float32"):
    """Run T fused CNN-policy + env steps entirely on-chip, stats-only —
    the pixel family's serving/eval configuration (the CNN twin of
    ops/pallas_acting.act_rollout_pallas, wired into train.evaluate()).

    Deterministic by default (action = policy mean); stochastic=True draws
    exploration noise from the same counter stream as the trajectory
    kernel. Pixels are rematerialized in-kernel from the 13-float obs —
    serving costs zero image HBM traffic. Returns (final EnvState, stats
    dict) — same contract as act_rollout_pallas.
    Reference: SURVEY.md §3.3 (`puffer eval` serves every policy family
    through the same rollout loop)."""
    n = state.pos.shape[0]
    geom = geom if geom is not None else CnnGeom(24, 4, 2)
    from drone_tpu.pixels import patch_grid

    gx, gy = patch_grid(geom.res, geom.p0)
    weights = cnn_all_weights(policy_params, geom)
    # per-step VMEM working set ~12 MB at 1024 lanes (Y0 dominates) — keep
    # the lane block at the compiled minimum, as the trajectory kernel does
    cap = 1024
    if lanes_per_block is not None:
        cap = min(cap, lanes_per_block)
    lanes_per_block = PR.pick_lanes_per_block(n, cap)
    PR.check_compiled_lane_block(lanes_per_block, n, interpret)
    final, stats = _act_run(
        state, env_params, weights, gx, gy, T=T,
        lanes_per_block=lanes_per_block, task=statics.task,
        integrator=statics.integrator, geom=geom, interpret=interpret,
        stochastic=stochastic, compute_dtype=compute_dtype)
    return final, PR._stats_dict(stats)


def traj_cnn_rollout_reference(state: EnvState, policy_params,
                               env_params: EnvParams, statics: EnvStatics,
                               T: int, geom: CnnGeom | None = None,
                               stochastic: bool = True,
                               compute_dtype: str = "float32"):
    """jnp mirror of traj_cnn_rollout_pallas: same plane-space formulation
    (cnn_forward on (OBS_DIM, B) obs planes), same noise stream, same
    expression order. In interpret mode on the CPU backend the kernel
    matches this bitwise (single lane block). Returns (final EnvState,
    Traj, stats)."""
    geom = geom if geom is not None else CnnGeom(24, 4, 2)
    from drone_tpu.pixels import patch_grid

    gx, gy = patch_grid(geom.res, geom.p0)
    weights = cnn_all_weights(policy_params, geom)
    cdt = jnp.dtype(compute_dtype).type
    ls_row = weights[-1]
    ls = [ls_row[0, k] for k in range(4)]

    def body(carry, _):
        s = carry
        obs = jax.vmap(env_mod.observe)(s)            # (B, OBS_DIM)
        X = obs.T
        mx, vx = cnn_forward(X, weights, gx, gy, geom, cdt)
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

    final, (traj, (ep_ret, ep_len)) = jax.lax.scan(body, state, None,
                                                   length=T)
    donef = traj.done.astype(jnp.float32)
    stats = {
        "reward_sum": jnp.sum(traj.reward),
        "episodes": jnp.sum(donef),
        "ep_return_sum": jnp.sum(ep_ret),
        "ep_length_sum": jnp.sum(ep_len),
        "ep_return_sq_sum": jnp.sum(ep_ret * ep_ret),
    }
    return final, traj, stats
