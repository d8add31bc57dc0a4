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
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 0x44524E57
ACT_NONE = 0
ACT_TANH = 1
KIND_DENSE = 0
KIND_LSTM = 1
_GATES = ("i", "f", "g", "o")  # flax LSTMCell gate order


def _dense(p, name, act):
    d = p[name]
    return ("dense", np.asarray(d["kernel"], np.float32),
            np.asarray(d["bias"], np.float32), act)


def export_flat_weights(params, path: str, hidden=None) -> None:
    """Export the actor tower of a params pytree to `path`.

    MLP (ActorCritic) params -> DRNW v1; LSTM (LSTMActorCritic) params ->
    DRNW v2 (detected by the presence of the 'lstm' collection). The tower
    depth is probed from the params themselves (`hidden` is accepted for
    backward compatibility and ignored — trusting a caller-supplied depth
    silently exported truncated networks when it understated the trained
    depth, since equal-width layers still chain without a shape error).
    """
    del hidden
    p = params["params"] if "params" in params else params
    layers = []
    if "lstm" in p:
        i = 0
        while f"enc_h{i}" in p:
            layers.append(_dense(p, f"enc_h{i}", ACT_TANH))
            i += 1
        lp = p["lstm"]
        wi = [np.asarray(lp[f"i{g}"]["kernel"], np.float32) for g in _GATES]
        wh = [np.asarray(lp[f"h{g}"]["kernel"], np.float32) for g in _GATES]
        bh = [np.asarray(lp[f"h{g}"]["bias"], np.float32) for g in _GATES]
        layers.append(("lstm", wi, wh, bh))
        layers.append(_dense(p, "actor_mean", ACT_NONE))
        version = 2
    else:
        if "actor_h0" not in p:
            raise ValueError(
                "params are not an exportable ActorCritic/LSTMActorCritic "
                f"tower (found {sorted(p)}); CNN policies have no C runtime"
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
            else:
                _, wi, wh, bh = layer
                in_dim, hid = wi[0].shape
                f.write(struct.pack("<iii", KIND_LSTM, in_dim, hid))
                for m in wi:
                    f.write(m.astype("<f4").tobytes(order="C"))
                for m in wh:
                    f.write(m.astype("<f4").tobytes(order="C"))
                for v in bh:
                    f.write(v.astype("<f4").tobytes(order="C"))


def load_flat_weights(path: str):
    """Read a DRNW file back into a layer list: ('dense', W, b, act) and
    ('lstm', wi[4], wh[4], bh[4]) entries."""
    layers = []
    with open(path, "rb") as f:
        magic, version, n = struct.unpack("<iii", f.read(12))
        if magic != MAGIC:
            raise ValueError(f"bad magic {magic:#x}")
        if version not in (1, 2):
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
            else:
                raise ValueError(f"unknown layer kind {kind}")
    return layers
