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

The exported network is the deterministic actor: obs -> tanh MLP ->
action mean (log_std is not needed for deployment).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 0x44524E57
ACT_NONE = 0
ACT_TANH = 1


def export_flat_weights(params, path: str, hidden=(64, 64)) -> None:
    """Export the actor tower of an ActorCritic params pytree to `path`."""
    p = params["params"] if "params" in params else params
    layers = []
    for i, _ in enumerate(hidden):
        d = p[f"actor_h{i}"]
        layers.append((np.asarray(d["kernel"], np.float32),
                       np.asarray(d["bias"], np.float32), ACT_TANH))
    d = p["actor_mean"]
    layers.append((np.asarray(d["kernel"], np.float32),
                   np.asarray(d["bias"], np.float32), ACT_NONE))

    with open(path, "wb") as f:
        f.write(struct.pack("<iii", MAGIC, 1, len(layers)))
        for w, b, act in layers:
            in_dim, out_dim = w.shape
            f.write(struct.pack("<iii", in_dim, out_dim, act))
            f.write(w.astype("<f4").tobytes(order="C"))
            f.write(b.astype("<f4").tobytes(order="C"))


def load_flat_weights(path: str):
    """Read a DRNW file back into a list of (W, b, activation)."""
    layers = []
    with open(path, "rb") as f:
        magic, version, n = struct.unpack("<iii", f.read(12))
        if magic != MAGIC:
            raise ValueError(f"bad magic {magic:#x}")
        if version != 1:
            raise ValueError(f"unsupported version {version}")
        for _ in range(n):
            in_dim, out_dim, act = struct.unpack("<iii", f.read(12))
            w = np.frombuffer(f.read(4 * in_dim * out_dim), "<f4").reshape(
                in_dim, out_dim
            )
            b = np.frombuffer(f.read(4 * out_dim), "<f4")
            layers.append((w, b, act))
    return layers
