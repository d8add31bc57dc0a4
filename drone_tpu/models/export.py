"""Flat-weight export for the C inference runtime (native/dronenet.c).

Rebuild of the reference's PufferNet weight path (SURVEY.md §2.2 #12:
`[U] pufferlib/puffernet.h` runs trained policies from exported flat weights
with zero Python). Format ("DRNW" v1, little-endian):

    int32 magic 0x44524E57 ('DRNW')
    int32 version (1)
    int32 n_layers
    per layer: int32 in_dim, int32 out_dim, int32 activation
               (0=none, 1=tanh), float32 W[in*out] (row-major, W[i*out+j]),
               float32 b[out]

The exported network is the deterministic actor: obs -> encoder ->
[optional LSTM] -> action mean (log_std is not needed for deployment).

v2 adds recurrent policies: each layer is prefixed by an int32 kind
(0=dense as in v1; 1=lstm: int32 in_dim, int32 hidden, then the flax
LSTMCell kernels in gate order i,f,g,o — input kernels Wi[in*hidden] x4
(flax OptimizedLSTMCell has no input bias), recurrent kernels
Wh[hidden*hidden] x4, recurrent biases bh[hidden] x4).

v3 adds the pixel-CNN policy (PatchCNNActorCritic — the megakernel-trainable
patchify configuration; overlapping-conv policies have no C runtime):
kind 2 render (int32 res, int32 n_chan=4, float32 sigma — the C runtime
mirrors pixels.obs_to_pixels) and kind 3 conv (int32 h, w, cin, patch,
cout, act, then W[patch*patch*cin*cout] in flax (kh, kw, cin, cout)
C-order and b[cout] — kernel == stride over a row-major HWC image).
Layer kinds chain freely, so the pixel-RECURRENT policy (CNNLSTMActorCritic:
render + convs + trunk + lstm + head) is also a v3 file — the C runtime's
layer loop (native/dronenet.c dronenet_forward) needs no new kinds.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 0x44524E57
ACT_NONE = 0
ACT_TANH = 1
ACT_RELU = 2
KIND_DENSE = 0
KIND_LSTM = 1
KIND_RENDER = 2
KIND_CONV = 3
N_CHAN = 4  # render channels (pixels.obs_to_pixels)
_GATES = ("i", "f", "g", "o")  # flax LSTMCell gate order


def _dense(p, name, act):
    d = p[name]
    return ("dense", np.asarray(d["kernel"], np.float32),
            np.asarray(d["bias"], np.float32), act)


def _conv_tower_layers(p, model):
    """PatchCNN tower params -> [render, conv0, conv1, trunk-dense] layer
    list (shared by the feedforward PatchCNNActorCritic and the recurrent
    CNNLSTMActorCritic exports). Geometry is inferred from parameter shapes
    and cross-checked; when `model` is given its res/patch0/patch1 are
    authoritative (strides are not recorded in params — see
    export_flat_weights)."""
    from drone_tpu.pixels import SPLAT_SIGMA

    if "conv2" in p or "conv1" not in p:
        raise ValueError(
            "CNN params are not a PatchCNNActorCritic tower (exactly "
            "two patchify convs); overlapping-conv policies have no C "
            "runtime — conv stride isn't recorded in params, so only "
            "the known kernel==stride architecture is exportable")
    k0 = np.asarray(p["conv0"]["kernel"], np.float32)
    k1 = np.asarray(p["conv1"]["kernel"], np.float32)
    p0, c_in, c0 = k0.shape[0], k0.shape[2], k0.shape[3]
    p1, c1 = k1.shape[0], k1.shape[3]
    trunk_in = np.asarray(p["trunk"]["kernel"]).shape[0]
    if (k0.shape[1] != p0 or k1.shape[1] != p1 or c_in != N_CHAN
            or k1.shape[2] != c0 or trunk_in % c1 != 0):
        raise ValueError(
            "CNN params are not a PatchCNNActorCritic tower "
            f"(conv0 {k0.shape}, conv1 {k1.shape}, trunk_in {trunk_in})")
    g1 = int(round((trunk_in // c1) ** 0.5))
    if g1 * g1 * c1 != trunk_in:
        raise ValueError(
            f"trunk input {trunk_in} is not a square patch grid x {c1} "
            "channels; only kernel==stride (patchify) CNNs have a C "
            "runtime")
    g0 = g1 * p1
    res = g0 * p0
    if model is not None:
        # geometry from the model itself, not shape inference: conv
        # STRIDES are not recorded in params, so an overlapping-conv
        # tower can pass every shape cross-check above while computing
        # a different function than the exported patchify network
        m_res = getattr(model, "res", None)
        m_p0 = getattr(model, "patch0", None)
        m_p1 = getattr(model, "patch1", None)
        if m_res is None or m_p0 is None or m_p1 is None:
            raise ValueError(
                f"model {type(model).__name__} has no patch geometry "
                "(res/patch0/patch1): only kernel==stride "
                "(PatchCNNActorCritic-family) policies have a C "
                "runtime — overlapping-conv towers are not exportable")
        if (m_res, m_p0, m_p1) != (res, p0, p1):
            raise ValueError(
                f"model geometry (res={m_res}, patch0={m_p0}, "
                f"patch1={m_p1}) disagrees with the parameter shapes "
                f"(inferred res={res}, p0={p0}, p1={p1}); params do "
                "not belong to this model")
    return [
        ("render", res, N_CHAN, float(SPLAT_SIGMA)),
        ("conv", res, res, N_CHAN, p0, c0, ACT_RELU,
         k0.reshape(-1, c0), np.asarray(p["conv0"]["bias"], np.float32)),
        ("conv", g0, g0, c0, p1, c1, ACT_RELU,
         k1.reshape(-1, c1), np.asarray(p["conv1"]["bias"], np.float32)),
        _dense(p, "trunk", ACT_RELU),
    ]


def _lstm_layer(p):
    lp = p["lstm"]
    wi = [np.asarray(lp[f"i{g}"]["kernel"], np.float32) for g in _GATES]
    wh = [np.asarray(lp[f"h{g}"]["kernel"], np.float32) for g in _GATES]
    bh = [np.asarray(lp[f"h{g}"]["bias"], np.float32) for g in _GATES]
    return ("lstm", wi, wh, bh)


def export_flat_weights(params, path: str, hidden=None, model=None) -> None:
    """Export the actor tower of a params pytree to `path`.

    MLP (ActorCritic) params -> DRNW v1; LSTM (LSTMActorCritic) params ->
    DRNW v2 (detected by the presence of the 'lstm' collection). The tower
    depth is probed from the params themselves (`hidden` is accepted for
    backward compatibility and ignored — trusting a caller-supplied depth
    silently exported truncated networks when it understated the trained
    depth, since equal-width layers still chain without a shape error).

    `model`: the flax module the params were trained with, when the caller
    has it (the CLI does). For conv towers the render/patch geometry is then
    taken FROM THE MODEL (res/patch0/patch1 attributes) instead of being
    inferred from parameter shapes — shape inference can false-accept an
    overlapping-conv tower whose strides happen to satisfy the
    cross-checks (strides aren't recorded in params), silently exporting a
    wrong kernel==stride network. A model without patch geometry (e.g.
    CNNActorCritic / PixelActorCritic) is rejected here with the real
    reason rather than by luck of the shape checks.
    """
    del hidden
    p = params["params"] if "params" in params else params
    layers = []
    if "lstm" in p and "conv0" in p:
        # CNNLSTMActorCritic (pixel-recurrent): render + patchify convs +
        # relu trunk + LSTM + actor head -> DRNW v3 (the C runtime chains
        # layer kinds freely; the LSTM layer carries the recurrent state)
        layers += _conv_tower_layers(p, model)
        layers.append(_lstm_layer(p))
        layers.append(_dense(p, "actor_mean", ACT_NONE))
        version = 3
    elif "lstm" in p:
        i = 0
        while f"enc_h{i}" in p:
            layers.append(_dense(p, f"enc_h{i}", ACT_TANH))
            i += 1
        layers.append(_lstm_layer(p))
        layers.append(_dense(p, "actor_mean", ACT_NONE))
        version = 2
    elif "conv0" in p:
        # PatchCNNActorCritic: render + two patchify convs + relu trunk.
        # Geometry is inferred from the kernels and cross-checked against
        # the trunk input size — an overlapping-conv CNNActorCritic (whose
        # stride != kernel isn't recorded in the params) fails the check
        # instead of silently exporting a wrong network.
        layers += _conv_tower_layers(p, model)
        layers.append(_dense(p, "actor_mean", ACT_NONE))
        version = 3
    else:
        if "actor_h0" not in p:
            raise ValueError(
                "params are not an exportable ActorCritic/LSTMActorCritic/"
                f"PatchCNNActorCritic tower (found {sorted(p)}); "
                "overlapping-conv CNN policies have no C runtime"
            )
        i = 0
        while f"actor_h{i}" in p:
            layers.append(_dense(p, f"actor_h{i}", ACT_TANH))
            i += 1
        layers.append(_dense(p, "actor_mean", ACT_NONE))
        version = 1

    with open(path, "wb") as f:
        f.write(struct.pack("<iii", MAGIC, version, len(layers)))
        for layer in layers:
            if layer[0] == "dense":
                _, w, b, act = layer
                if version >= 2:
                    f.write(struct.pack("<i", KIND_DENSE))
                in_dim, out_dim = w.shape
                f.write(struct.pack("<iii", in_dim, out_dim, act))
                f.write(w.astype("<f4").tobytes(order="C"))
                f.write(b.astype("<f4").tobytes(order="C"))
            elif layer[0] == "lstm":
                _, wi, wh, bh = layer
                in_dim, hid = wi[0].shape
                f.write(struct.pack("<iii", KIND_LSTM, in_dim, hid))
                for m in wi:
                    f.write(m.astype("<f4").tobytes(order="C"))
                for m in wh:
                    f.write(m.astype("<f4").tobytes(order="C"))
                for v in bh:
                    f.write(v.astype("<f4").tobytes(order="C"))
            elif layer[0] == "render":
                _, res, n_chan, sigma = layer
                f.write(struct.pack("<iiif", KIND_RENDER, res, n_chan,
                                    sigma))
            else:
                _, h, wdt, cin, patch, cout, act, w, b = layer
                f.write(struct.pack("<iiiiiii", KIND_CONV, h, wdt, cin,
                                    patch, cout, act))
                f.write(w.astype("<f4").tobytes(order="C"))
                f.write(b.astype("<f4").tobytes(order="C"))


def load_flat_weights(path: str):
    """Read a DRNW file back into a layer list: ('dense', W, b, act),
    ('lstm', wi[4], wh[4], bh[4]), ('render', res, n_chan, sigma) and
    ('conv', h, w, cin, patch, cout, act, W, b) entries."""
    layers = []
    with open(path, "rb") as f:
        magic, version, n = struct.unpack("<iii", f.read(12))
        if magic != MAGIC:
            raise ValueError(f"bad magic {magic:#x}")
        if version not in (1, 2, 3):
            raise ValueError(f"unsupported version {version}")

        def floats(shape):
            count = int(np.prod(shape))
            return np.frombuffer(f.read(4 * count), "<f4").reshape(shape)

        for _ in range(n):
            kind = KIND_DENSE
            if version >= 2:
                (kind,) = struct.unpack("<i", f.read(4))
            if kind == KIND_DENSE:
                in_dim, out_dim, act = struct.unpack("<iii", f.read(12))
                layers.append(("dense", floats((in_dim, out_dim)),
                               floats((out_dim,)), act))
            elif kind == KIND_LSTM:
                in_dim, hid = struct.unpack("<ii", f.read(8))
                wi = [floats((in_dim, hid)) for _ in _GATES]
                wh = [floats((hid, hid)) for _ in _GATES]
                bh = [floats((hid,)) for _ in _GATES]
                layers.append(("lstm", wi, wh, bh))
            elif kind == KIND_RENDER:
                res, n_chan, sigma = struct.unpack("<iif", f.read(12))
                layers.append(("render", res, n_chan, sigma))
            elif kind == KIND_CONV:
                h, wdt, cin, patch, cout, act = struct.unpack(
                    "<iiiiii", f.read(24))
                layers.append(("conv", h, wdt, cin, patch, cout, act,
                               floats((patch * patch * cin, cout)),
                               floats((cout,))))
            else:
                raise ValueError(f"unknown layer kind {kind}")
    return layers
