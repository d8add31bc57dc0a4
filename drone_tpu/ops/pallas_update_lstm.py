"""Recurrent PPO update megakernel: truncated-BPTT LSTM fwd+bwd in VMEM.

The recurrent counterpart of ops/pallas_update.py: one SGD minibatch pass
for the LSTMActorCritic policy with HAND-WRITTEN backprop through time,
entirely in VMEM. The grid streams (row-block, BPTT-segment) tiles of the
kernel-natural (T, N_TRAJ, rows, 128) trajectory planes plus the
(S, 2, hidden, N) carry anchors that ops/pallas_acting_lstm.py's rollout
kernel recorded at each segment start; for every tile the kernel re-runs
the encoder+LSTM+heads forward over the segment from its anchor and walks
the gates backward through time, accumulating weight gradients in
revisited output refs. Gradients STOP at segment boundaries (each segment
starts from stored carry data) — exactly ppo_rnn.segmented_forward's
truncation semantics, kernelized.

Memory plan (the part that makes BPTT fit in ~16 MB of VMEM): storing
every per-step activation for a 16-step segment at 1024 lanes would need
>50 MB, so the kernel checkpoints instead of storing — the forward pass
keeps only the (c, h) carries entering every `sc`-step chunk, and the
backward pass recomputes each step's entering carry from its chunk
boundary, then the gates from (c_in, h_in, obs), as it walks backward.
The per-STEP loops are `lax.fori_loop`s, not Python unrolls: Mosaic
stack-allocates every live SSA value, and the unrolled bptt=16 body
needed a 101 MB scoped-VMEM stack (the exact compile failure BENCH_r03
recorded at 64k envs) — rolled, the live set is one step's activations
plus the (bptt/sc) boundary pairs, ~12 MB at the production geometry.
Cost: ~sc/2 extra forward steps per chunk vs storing per-step carries;
both working-set terms are minimized at sc ~= sqrt(bptt).

All math lives in `_segment_grads` (built on `_lstm_step_fwd` and
pallas_update's `_head_grads`), shared VERBATIM by the kernel and the
pure-jnp mirror `ppo_lstm_update_reference` — in interpret mode on the
CPU backend the kernel matches the mirror bitwise, and a separate test
pins the hand-written BPTT against jax.grad of the equivalent
segmented-forward loss.

Reference: SURVEY.md §2.2 #9-#10 (`[U] pufferlib/pufferl.py` LSTM mode is
part of the trainer — minibatch PPO update with truncated BPTT;
`[U] pufferlib/models.py` LSTMWrapper); BASELINE.json:10.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drone_tpu.ops.pallas_acting_traj import (
    N_TRAJ,
    TP_ACT0,
    TP_DONE,
    TP_LOGP,
    TP_OBS0,
    TP_VAL,
    _dot32,
)
from drone_tpu.ops.pallas_update import (
    N_UPSTATS,
    UpdateConsts,
    _head_grads,
)
from drone_tpu.types import OBS_DIM

# flat kernel-tensor order for the recurrent policy (the fused-optimizer /
# gradient layout): enc (W, b) pairs, wi[4], wh[4], bh[4], actor head
# (W, b), critic head (W, b), log_std (1, 4). Biases are (out, 1) columns
# so every parameter/gradient/adam-moment tensor is 2-D.
_N_LSTM_FIXED = 16  # wi4 + wh4 + bh4 + head W/b + vhead W/b


def _unflatten(tensors, n_enc):
    """Flat kernel-tensor list -> (enc, wi, wh, bh, head, vhead) structure
    (log_std, if present as the trailing (1, 4) tensor, is NOT consumed
    here — slice it off first)."""
    enc = [(tensors[2 * i], tensors[2 * i + 1]) for i in range(n_enc)]
    o = 2 * n_enc
    wi = [tensors[o + g] for g in range(4)]
    wh = [tensors[o + 4 + g] for g in range(4)]
    bh = [tensors[o + 8 + g] for g in range(4)]
    head = (tensors[o + 12], tensors[o + 13])
    vhead = (tensors[o + 14], tensors[o + 15])
    return enc, wi, wh, bh, head, vhead


def _lstm_step_fwd(X, c, h, enc, wi, wh, bh, dtype, encoder="dense",
                   geom=None, gx=None, gy=None):
    """One encoder+LSTM step in plane space: X (OBS_DIM, L), c/h (H, L).

    Returns (acts, gi, gf, gg, go, c2, th, h2) where acts[-1] = the LSTM
    input x (for the dense encoder acts[i] is the input to layer i; for the
    CNN encoder acts is cnn_encode's residual tuple, whose last entry is
    likewise the trunk output). Built on the SHARED encoder/gate blocks
    (ops/pallas_acting_lstm.lstm_encoder + pallas_acting_cnn.cnn_encode /
    lstm_gates — one evaluation order across rollout and update), so
    recomputed activations match the rollout's bitwise at the first
    minibatch."""
    from drone_tpu.ops.pallas_acting_lstm import lstm_encoder, lstm_gates

    dot = lambda a, b: _dot32(a, b, dtype)
    if encoder == "cnn":
        from drone_tpu.ops.pallas_acting_cnn import cnn_encode

        from drone_tpu.ops.pallas_acting_lstm import enc_flat

        _, acts = cnn_encode(X, enc_flat(enc), gx, gy, geom, dtype,
                             want_acts=True)
    else:
        acts = lstm_encoder(X, enc, dot)
    gi, gf, gg, go, c2, th, h2 = lstm_gates(acts[-1], h, c, wi, wh, bh, dot)
    return acts, gi, gf, gg, go, c2, th, h2


def _zero_grads(tensors):
    return [jnp.zeros_like(t) for t in tensors]


def _segment_grads(rp, ra, c0, h0, tensors, ls, co, sc, bptt, dtype,
                   encoder="dense", geom=None, gx=None, gy=None):
    """Truncated-BPTT forward + hand-written backward for ONE segment.

    rp(t) -> the (N_TRAJ, rbu, 128) trajectory tile at segment step t
    (kernel-natural layout, straight from the LSTM rollout kernel); ra(t)
    -> the (2, rbu, 128) stacked (normalized advantage, return) at t —
    reader closures so the SAME function indexes a Mosaic ref in the
    kernel and a jnp array in the mirror, one dynamic load per step.
    c0/h0: (H, L) carry entering the segment (L = rbu * 128); tensors:
    flat kernel-tensor list WITHOUT the trailing log_std; ls: 4 log_std
    scalars; sc: checkpoint chunk length (divides bptt). Every op runs
    identically inside the Mosaic kernel and in the jnp mirror — this
    function IS the bitwise contract.

    The per-step loops are `lax.fori_loop`s (NOT Python unrolls) so the
    Mosaic stack holds one step's live values, not bptt of them — see the
    module docstring's memory plan.

    Returns (grad list matching `tensors` order, stat planes tuple of
    N_UPSTATS (rbu, 128) arrays).
    """
    H, L = c0.shape
    rbu = L // 128
    shape = (rbu, 128)
    n_enc = (len(tensors) - _N_LSTM_FIXED) // 2
    enc, wi, wh, bh, head, vhead = _unflatten(tensors, n_enc)
    head_w, head_b = head
    vh_w, vh_b = vhead
    n_ck = bptt // sc
    o = 2 * n_enc  # grad-list offset of the gate tensors

    def fwd(pt, c, h):
        """One forward step from the trajectory tile pt = rp(t)."""
        X = pt[TP_OBS0:TP_OBS0 + OBS_DIM].reshape(OBS_DIM, L)
        acts, gi, gf, gg, go, c2, th, h2 = _lstm_step_fwd(
            X, c, h, enc, wi, wh, bh, dtype, encoder=encoder, geom=geom,
            gx=gx, gy=gy)
        keep = (1.0 - pt[TP_DONE]).reshape(1, L)
        return acts, gi, gf, gg, go, c2, th, h2, keep

    def fwd_carry(t, ch):
        c, h = ch
        *_, c2, th, h2, keep = fwd(rp(t), c, h)
        return c2 * keep, h2 * keep

    # -- pass A: forward, keeping only chunk-boundary carries (at
    # sc == bptt pass A is empty — the anchor is the only boundary) --------
    bounds = [(c0, h0)]
    ch = (c0, h0)
    for ck in range(n_ck - 1):
        ch = jax.lax.fori_loop(ck * sc, (ck + 1) * sc, fwd_carry, ch)
        bounds.append(ch)

    # -- pass B: chunks in reverse (Python — n_ck is small and each chunk
    # anchors a different boundary value); steps within a chunk in a
    # reverse fori_loop, each step's entering carry recomputed from the
    # chunk boundary (a dynamic-bound fori_loop of < sc steps) ------------
    grads0 = tuple(jnp.zeros_like(t) for t in tensors)
    st0 = tuple(jnp.zeros(shape, jnp.float32) for _ in range(N_UPSTATS))
    dzero = jnp.zeros((H, L), jnp.float32)
    carry = (grads0, dzero, dzero, st0)

    for ck in range(n_ck - 1, -1, -1):
        boundary = bounds[ck]

        def bwd_body(j, carry, ck=ck, boundary=boundary):
            grads, dh_nxt, dc_nxt, st_acc = carry
            i = sc - 1 - j
            t = ck * sc + i
            c_in, h_in = jax.lax.fori_loop(ck * sc, t, fwd_carry, boundary)
            pt = rp(t)
            acts, gi, gf, gg, go, c2, th, h2, keep = fwd(pt, c_in, h_in)
            x = acts[-1]
            g = list(grads)

            # heads + PPO surrogate gradient (shared with the MLP kernel)
            mx = _dot32(head_w, h2, dtype) + head_b
            vx = _dot32(vh_w, h2, dtype) + vh_b
            m = [mx[k].reshape(shape) for k in range(4)]
            v = vx[0].reshape(shape)
            a = [pt[TP_ACT0 + k] for k in range(4)]
            art = ra(t)
            dm, g_v, st = _head_grads(m, v, a, pt[TP_LOGP], pt[TP_VAL],
                                      art[0], art[1], ls, co)
            st_acc = tuple(sa + sv for sa, sv in zip(st_acc, st))
            dmx = jnp.stack(dm).reshape(4, L)
            dvx = g_v.reshape(1, L)
            g[o + 12] = g[o + 12] + _dot32(dmx, h2.T, dtype)
            g[o + 13] = g[o + 13] + jnp.sum(dmx, axis=1, keepdims=True)
            g[o + 14] = g[o + 14] + _dot32(dvx, h2.T, dtype)
            g[o + 15] = g[o + 15] + jnp.sum(dvx, axis=1, keepdims=True)

            # backprop through the LSTM cell. The carry leaving step t was
            # masked by keep(t) before entering step t+1, so the incoming
            # through-time gradient is masked by THIS step's keep.
            dh2 = (_dot32(head_w.T, dmx, dtype) + _dot32(vh_w.T, dvx, dtype)
                   + dh_nxt * keep)
            dc2 = dc_nxt * keep + dh2 * go * (1.0 - th * th)
            dgo = dh2 * th
            dgi = dc2 * gg
            dgf = dc2 * c_in
            dgg = dc2 * gi
            dc_nxt = dc2 * gf
            dz = (dgi * (gi * (1.0 - gi)), dgf * (gf * (1.0 - gf)),
                  dgg * (1.0 - gg * gg), dgo * (go * (1.0 - go)))
            dh_nxt = None
            dx = None
            for k in range(4):
                g[o + k] = g[o + k] + _dot32(dz[k], x.T, dtype)
                g[o + 4 + k] = g[o + 4 + k] + _dot32(dz[k], h_in.T, dtype)
                g[o + 8 + k] = g[o + 8 + k] + jnp.sum(dz[k], axis=1,
                                                      keepdims=True)
                hterm = _dot32(wh[k].T, dz[k], dtype)
                xterm = _dot32(wi[k].T, dz[k], dtype)
                dh_nxt = hterm if dh_nxt is None else dh_nxt + hterm
                dx = xterm if dx is None else dx + xterm

            # encoder backward (activations recomputed above)
            if encoder == "cnn":
                # the shared hand-written conv backward (trunk + conv1 +
                # conv0), dx = d loss / d trunk output at this step
                from drone_tpu.ops.pallas_update_cnn import cnn_encoder_bwd

                from drone_tpu.ops.pallas_acting_lstm import enc_flat

                enc_g = cnn_encoder_bwd(dx, acts, enc_flat(enc), gx, gy,
                                        geom, dtype)
                for k in range(6):
                    g[k] = g[k] + enc_g[k]
            else:
                for li in range(n_enc - 1, -1, -1):
                    y = acts[li + 1]
                    dpre = dx * (1.0 - y * y)
                    g[2 * li] = g[2 * li] + _dot32(dpre, acts[li].T, dtype)
                    g[2 * li + 1] = g[2 * li + 1] + jnp.sum(
                        dpre, axis=1, keepdims=True)
                    if li > 0:
                        dx = _dot32(enc[li][0].T, dpre, dtype)
            return tuple(g), dh_nxt, dc_nxt, st_acc

        carry = jax.lax.fori_loop(0, sc, bwd_body, carry)
        # dh_nxt/dc_nxt now hold d(carry entering this chunk) and flow into
        # the previous chunk's last step; at ck == 0 they are discarded —
        # the segment anchor is stored data, not a function of params
        # (truncation).

    grads, _, _, st_acc = carry
    return list(grads), st_acc


def _lstm_update_kernel(perm_ref, pl_ref, ar_ref, snap_ref, ls_ref, *refs,
                        n_enc, co, sc, compute_dtype, encoder="dense",
                        geom=None):
    n_t = 2 * n_enc + _N_LSTM_FIXED
    n_in = n_t + (2 if encoder == "cnn" else 0)
    w_refs = refs[:n_t]
    gx = refs[n_t][:] if encoder == "cnn" else None
    gy = refs[n_t + 1][:] if encoder == "cnn" else None
    g_refs = refs[n_in:n_in + n_t]
    stats_ref = refs[n_in + n_t]
    tensors = [w_refs[i][:] for i in range(n_t)]
    ls = [ls_ref[0, k] for k in range(4)]

    g = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when((g == 0) & (s == 0))
    def _init():
        for r in g_refs:
            r[:] = jnp.zeros_like(r)
        stats_ref[:] = jnp.zeros_like(stats_ref)

    bptt = pl_ref.shape[0]
    hidden = snap_ref.shape[1] // 2
    rbu = pl_ref.shape[3]
    L = rbu * 128
    # per-step readers: one dynamic VMEM load per step, dropping the n_rb
    # block axis ((bptt, N_TRAJ, 1, rbu, 128) tiles)
    rp = lambda t: pl_ref[t, :, 0]
    ra = lambda t: ar_ref[:, t, 0]
    # snap block is (1, 2H, 1, rbu, 128): the (2, H) pair flattened into one
    # axis to keep every BlockSpec at rank <= 5 (the rank the rest of the
    # Mosaic surface is proven at); static slices split it back
    c0 = snap_ref[0, :hidden, 0].reshape(hidden, L)
    h0 = snap_ref[0, hidden:, 0].reshape(hidden, L)
    grads, stats = _segment_grads(rp, ra, c0, h0, tensors, ls, co, sc, bptt,
                                  compute_dtype, encoder=encoder, geom=geom,
                                  gx=gx, gy=gy)
    for r, val in zip(g_refs, grads):
        r[:] += val
    for k in range(N_UPSTATS):
        stats_ref[k] += stats[k]


@functools.partial(
    jax.jit,
    static_argnames=("n_sel", "bptt", "rbu", "n_enc", "co", "sc",
                     "interpret", "compute_dtype", "encoder", "geom"),
)
def _lstm_update_call(planes, advret, snap, perm_mb, tensors, log_std, *,
                      n_sel, bptt, rbu, n_enc, co, sc, interpret=False,
                      compute_dtype="float32", encoder="dense", geom=None):
    T, rows = planes.shape[0], planes.shape[2]
    n_seg = T // bptt
    n_rb = rows // rbu
    hidden = snap.shape[2]
    # split rows -> (n_rb, rbu) and lanes -> (n_rb, rbu, 128) so the
    # trailing block dims EQUAL the array's (Mosaic's "divisible by 8 OR
    # equal" rule — legal for any rbu; rbu=8 is the production tile) and
    # the row-block index lands third-minor or higher. Both reshapes split
    # a major dim contiguously: layout-preserving, no copy.
    planes = planes.reshape(T, N_TRAJ, n_rb, rbu, 128)
    advret = advret.reshape(2, T, n_rb, rbu, 128)
    # (S, 2, H, N): merge (2, H) -> 2H (contiguous, layout-preserving) so
    # the anchor BlockSpec stays rank 5
    snap = snap.reshape(n_seg, 2 * hidden, n_rb, rbu, 128)
    tensors = tuple(tensors)
    if encoder == "cnn":
        from drone_tpu.pixels import patch_grid

        gx, gy = patch_grid(geom.res, geom.p0)
        grid_extra = (gx, gy)
    else:
        grid_extra = ()

    def full(shp):
        return pl.BlockSpec(shp, lambda g, s, p: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sel, n_seg),
        in_specs=[
            # one (segment, all planes, row-block) tile per grid step; the
            # scalar-prefetched permutation p drives the row-block index —
            # recurrent minibatch gather (lanes whole, sequences whole) for
            # free, straight from the rollout kernel's natural layout
            pl.BlockSpec((bptt, N_TRAJ, 1, rbu, 128),
                         lambda g, s, p: (s, 0, p[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bptt, 1, rbu, 128),
                         lambda g, s, p: (0, s, p[g], 0, 0),
                         memory_space=pltpu.VMEM),
            # the carry anchor recorded by the rollout kernel for (segment,
            # row-block) — its natural (S, 2, H, N) layout ((2, H) merged),
            # lane-sliced
            pl.BlockSpec((1, 2 * hidden, 1, rbu, 128),
                         lambda g, s, p: (s, 0, p[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda g, s, p: (0, 0),
                         memory_space=pltpu.SMEM),
            *[full(t.shape) for t in tensors],
            *[full(x.shape) for x in grid_extra],
        ],
        out_specs=(
            *[full(t.shape) for t in tensors],
            pl.BlockSpec((N_UPSTATS, rbu, 128), lambda g, s, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(_lstm_update_kernel, n_enc=n_enc, co=co,
                               sc=sc,
                               compute_dtype=jnp.dtype(compute_dtype).type,
                               encoder=encoder, geom=geom)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            *[jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in tensors],
            jax.ShapeDtypeStruct((N_UPSTATS, rbu, 128), jnp.float32),
        ),
        # the BPTT working set (chunk-boundary carries + one step's live
        # activations + grad accumulators) measures ~19 MB of Mosaic stack
        # at the production geometry (bptt=16, rbu=8, H=128) — over XLA's
        # conservative 16 MB default scoped-vmem limit but far under the
        # chip's physical VMEM; 64 MB also covers the bptt=32 envelope.
        # The CNN encoder's per-step recompute adds its ~12 MB activation
        # set on top (Y0 dominates) — 128 MB covers it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(128 if encoder == "cnn" else 64)
            * 1024 * 1024),
        interpret=interpret,
    )(perm_mb, planes, advret, snap, log_std, *tensors, *grid_extra)
    grads, stats = list(outs[:-1]), outs[-1]
    return grads, jnp.sum(stats, axis=(1, 2))


def ppo_lstm_update_reference(planes, advret, snap, perm_mb, tensors,
                              log_std, *, bptt, rbu, co: UpdateConsts, sc,
                              compute_dtype="float32", encoder="dense",
                              geom=None):
    """Pure-jnp mirror of the LSTM update kernel: same segment math
    (`_segment_grads`), same (row-block, segment) accumulation order.
    Bitwise contract for the interpret-mode tests; the CPU-backend
    recurrent update path."""
    T = planes.shape[0]
    n_seg = T // bptt
    n_sel = perm_mb.shape[0]
    hidden = snap.shape[2]
    L = rbu * 128
    ls = [log_std[0, k] for k in range(4)]
    tensors = list(tensors)
    if encoder == "cnn":
        from drone_tpu.pixels import patch_grid

        gx, gy = patch_grid(geom.res, geom.p0)
    else:
        gx = gy = None
    acc0 = (_zero_grads(tensors),
            jnp.zeros((N_UPSTATS, rbu, 128), jnp.float32))

    def body(acc, idx):
        g_acc, st_acc = acc
        g = idx // n_seg
        s = idx % n_seg
        rb = perm_mb[g]
        blk = jax.lax.dynamic_slice(
            planes, (s * bptt, 0, rb * rbu, 0), (bptt, N_TRAJ, rbu, 128))
        arb = jax.lax.dynamic_slice(
            advret, (0, s * bptt, rb * rbu, 0), (2, bptt, rbu, 128))
        anchor = jax.lax.dynamic_slice(
            snap, (s, 0, 0, rb * L), (1, 2, hidden, L))
        c0 = anchor[0, 0]
        h0 = anchor[0, 1]
        rp = lambda t: jax.lax.dynamic_index_in_dim(blk, t, 0, keepdims=False)
        ra = lambda t: jax.lax.dynamic_index_in_dim(arb, t, 1, keepdims=False)
        grads, stats = _segment_grads(rp, ra, c0, h0, tensors, ls, co, sc,
                                      bptt, jnp.dtype(compute_dtype).type,
                                      encoder=encoder, geom=geom, gx=gx,
                                      gy=gy)
        g_acc = [a + g_ for a, g_ in zip(g_acc, grads)]
        st_acc = st_acc + jnp.stack(stats)
        return (g_acc, st_acc), None

    (grads, st), _ = jax.lax.scan(body, acc0, jnp.arange(n_sel * n_seg))
    return grads, jnp.sum(st, axis=(1, 2))


def pick_sc(bptt: int, max_chunks: int = 8, min_sc: int = 1) -> int:
    """Checkpoint chunk length: the divisor of bptt minimizing the BPTT
    recompute overhead — pass A re-forwards (bptt - sc) steps and pass B
    recomputes an average (sc-1)/2 entering carries per step, so the cost
    in forward-equivalents is (bptt-sc)/bptt + (sc-1)/2 — subject to the
    chunk count bptt/sc <= max_chunks: the pass-B chunk loop is
    Python-level, so Mosaic stack-allocates one boundary carry pair plus
    one unrolled chunk body PER CHUNK (measured: 16 chunks at
    bptt=16/sc=1 fails to compile at the production geometry; 8 compile
    at every production shape, dense and cnn encoders).

    min_sc exists because sc == 1 removes the per-step lax loops entirely
    (fori_loop with a 0- or 1-step trip count lowers to inline code), so
    each Python-level chunk's recompute body lands on the Mosaic stack
    CUMULATIVELY instead of sharing one loop-body allocation — the exact
    failure mode the CLAUDE.md "rolled loops" invariant documents. The
    dense encoder's inline body is small enough (measured: bptt=8 sc=1
    compiles and is 1.4x faster than sc=2 at the production geometry); the
    CNN encoder's conv backward is not (bptt=8 sc=1 exceeds even the
    128 MB vmem cap), so the caller passes min_sc=2 for encoder="cnn".

    Measured on v5e at 64k envs / H=128 / rbu=8 (the roofline pass,
    DESIGN.md §3): bptt=16 sc=2 33.2 ms/minibatch vs the old sqrt-balanced
    sc=4's 38.1 ms (1.15x); bptt=8 sc=1 24.4 ms vs sc=2's 34.4 ms (1.4x);
    cnn_lstm bptt=16 sc=2 114.4 ms vs sc=4's 126.4 ms (1.10x).
    Gradients are bitwise sc-invariant (every recomputed carry is produced
    by the same op chain from the segment anchor), so this is a pure
    performance knob."""
    best, best_cost = bptt, None
    for sc in range(max(1, min_sc), bptt + 1):
        if bptt % sc or bptt // sc > max_chunks:
            continue
        cost = (bptt - sc) / bptt + (sc - 1) / 2.0
        if best_cost is None or cost < best_cost:
            best, best_cost = sc, cost
    return best


MAX_KERNEL_BPTT = 32


def ppo_lstm_update(planes, advret, snap, perm_mb, tensors, log_std, *,
                    bptt, co: UpdateConsts, rbu: int = 1, sc: int | None = None,
                    mode: str = "kernel", interpret: bool = False,
                    compute_dtype: str = "float32", encoder: str = "dense",
                    geom=None):
    """One recurrent-PPO minibatch gradient pass (truncated BPTT).

    planes: (T, N_TRAJ, rows, 128) straight from the LSTM trajectory
    rollout kernel; advret: (2, T, rows, 128) stacked (normalized
    advantage, return); snap: (T//bptt, 2, hidden, rows*128) carry anchors
    in the rollout kernel's natural layout (seg_layout="planes");
    perm_mb: (n_sel,) int32 ROW-BLOCK indices of this minibatch — the
    recurrent convention: minibatches split the env axis, sequences stay
    whole, so a row block selects 128*rbu full-horizon lanes.
    tensors: flat kernel-tensor list (see lstm tensor order at module top)
    WITHOUT log_std; log_std: (1, 4).

    Returns (grad list matching `tensors`, stat sums (N_UPSTATS,)).
    Gradients are SUMS scaled by co.inv_m (the mean-loss gradient);
    log_std's gradient lives in the stat sums (ST_DLS*) plus the caller's
    -ent_coef entropy term, exactly as the MLP update kernel.
    """
    T = planes.shape[0]
    assert T % bptt == 0, (T, bptt)
    if sc is None:
        sc = pick_sc(bptt, min_sc=2 if encoder == "cnn" else 1)
    assert bptt % sc == 0, (bptt, sc)
    if mode == "kernel" and not interpret and bptt > MAX_KERNEL_BPTT:
        raise ValueError(
            f"the compiled LSTM update kernel supports bptt_horizon <= "
            f"{MAX_KERNEL_BPTT} (VMEM working set scales with the segment "
            f"length; got {bptt}). Use a shorter bptt_horizon or the "
            f"segmented_forward XLA update (ppo_rnn rollout='pallas').")
    if mode == "kernel":
        return _lstm_update_call(
            planes, advret, snap, perm_mb, tuple(tensors), log_std,
            n_sel=perm_mb.shape[0], bptt=bptt, rbu=rbu,
            n_enc=(len(tensors) - _N_LSTM_FIXED) // 2, co=co, sc=sc,
            interpret=interpret, compute_dtype=compute_dtype,
            encoder=encoder, geom=geom)
    return ppo_lstm_update_reference(
        planes, advret, snap, perm_mb, tensors, log_std, bptt=bptt, rbu=rbu,
        co=co, sc=sc, compute_dtype=compute_dtype, encoder=encoder,
        geom=geom)
