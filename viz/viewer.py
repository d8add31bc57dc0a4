"""Trajectory viewer: renders trajectory dumps from the C demo or the
Python dumper to a 3-D plot.

Replaces the reference's raylib 3-D client (SURVEY.md §2.3: "host-side
visualizer ... renderer is not on the perf path"; raylib is not available in
this image). Usage:

    python -m viz.viewer trajectory.csv [out.png]
    python -m viz.viewer trajectory.csv out.gif    # animated flight (the
                                                   # reference's demo-video
                                                   # artifact, README.md:9-11)
    python -m viz.viewer lap.csv lap.gif --params policy.drnw.params
        # racing: draws the numbered gate circuit from the exported params
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path


def load_csv(path):
    rows = []
    with open(path) as f:
        for row in csv.DictReader(f):
            rows.append({k: float(v) for k, v in row.items()})
    return rows


def load_gates(params_path):
    """Gate circuit from a versioned .params dump (the file `cli export`
    writes next to the DRNW weights; native/demo.c reads the same bytes).
    Returns [(x, y, z), ...] — empty for non-racing params."""
    import ctypes as ct
    import struct as _struct

    from oracle.oracle import CParams

    raw = Path(params_path).read_bytes()
    magic, version, size = _struct.unpack_from("<III", raw)
    if magic != 0x44524E50 or size != ct.sizeof(CParams):
        raise ValueError(f"{params_path}: not a DRNP params dump "
                         f"(magic={magic:#x}, size={size})")
    if version != 1:  # same gate as native/demo.c: size alone can't catch
        raise ValueError(f"{params_path}: unsupported params version "
                         f"{version} (this reader knows 1)")
    c = CParams.from_buffer_copy(raw, 12)
    return [(c.gates[3 * g], c.gates[3 * g + 1], c.gates[3 * g + 2])
            for g in range(int(c.n_gates))]


def _draw_gates(ax, gates):
    """Draw the racing circuit: numbered gate markers + the lap loop."""
    if not gates:
        return
    gx = [g[0] for g in gates]
    gy = [g[1] for g in gates]
    gz = [g[2] for g in gates]
    ax.scatter(gx, gy, gz, marker="s", s=120, facecolors="none",
               edgecolors="darkorange", linewidths=1.6, label="gate")
    loop = gates + [gates[0]]
    ax.plot([g[0] for g in loop], [g[1] for g in loop],
            [g[2] for g in loop], ls="--", lw=0.8, c="darkorange",
            alpha=0.6)
    for i, (x, y, z) in enumerate(gates):
        ax.text(x, y, z + 0.12, str(i), color="darkorange", fontsize=9)


def render(rows, out_path="trajectory.png", title="drone trajectory",
           gates=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = [r["x"] for r in rows]
    ys = [r["y"] for r in rows]
    zs = [r["z"] for r in rows]
    txs = [r["tx"] for r in rows]
    tys = [r["ty"] for r in rows]
    tzs = [r["tz"] for r in rows]

    fig = plt.figure(figsize=(10, 7))
    ax = fig.add_subplot(111, projection="3d")
    # a done=1 row holds the NEXT episode's spawn (auto-reset): break the
    # trail there so episode boundaries don't render as teleports
    starts = [0] + [i for i, r in enumerate(rows) if r.get("done", 0) == 1]
    segs = list(zip(starts, starts[1:] + [len(rows)]))
    for k, (lo, hi) in enumerate(segs):
        ax.plot(xs[lo:hi], ys[lo:hi], zs[lo:hi], lw=0.8,
                label="drone" if k == 0 else None)
    ax.scatter(txs[:: max(1, len(txs) // 50)], tys[:: max(1, len(tys) // 50)],
               tzs[:: max(1, len(tzs) // 50)], marker="x", s=40, c="red",
               label="target")
    ax.scatter([xs[0]], [ys[0]], [zs[0]], c="green", s=60, label="start")
    _draw_gates(ax, gates)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)  # as in render_gif: no figure leak across repeated calls
    return out_path


def render_gif(rows, out_path="trajectory.gif", title="drone flight",
               fps=25, stride=4, trail=120, gates=None):
    """Animated 3-D flight — the reference repo's user-facing artifact is a
    demo video of exactly this (SURVEY.md §2.2 #3)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    xs = [r["x"] for r in rows]
    ys = [r["y"] for r in rows]
    zs = [r["z"] for r in rows]

    def lim(lo, hi, pad=0.5):
        # a constant coordinate (stable hover) would give identical limits;
        # pad the range instead of relying on falsy-zero special cases
        return (lo - pad, hi + pad) if hi - lo < pad else (lo, hi)

    fig = plt.figure(figsize=(7, 5))
    ax = fig.add_subplot(111, projection="3d")
    ax.set_xlim(*lim(min(xs), max(xs)))
    ax.set_ylim(*lim(min(ys), max(ys)))
    ax.set_zlim(*lim(0.0, max(zs)))
    ax.set_title(title)
    _draw_gates(ax, gates)
    (trail_ln,) = ax.plot([], [], [], lw=1.0, c="tab:blue")
    (dot,) = ax.plot([], [], [], "o", c="tab:blue", ms=6)
    (tgt,) = ax.plot([], [], [], "x", c="red", ms=8)

    frames = range(0, len(rows), stride)
    # episode start index for each row (done=1 rows begin a new episode)
    ep_start = []
    start = 0
    for i, r in enumerate(rows):
        if r.get("done", 0) == 1:
            start = i
        ep_start.append(start)

    def update(i):
        lo = max(ep_start[i], i - trail)
        trail_ln.set_data(xs[lo:i + 1], ys[lo:i + 1])
        trail_ln.set_3d_properties(zs[lo:i + 1])
        dot.set_data([xs[i]], [ys[i]])
        dot.set_3d_properties([zs[i]])
        tgt.set_data([rows[i]["tx"]], [rows[i]["ty"]])
        tgt.set_3d_properties([rows[i]["tz"]])
        return trail_ln, dot, tgt

    anim = animation.FuncAnimation(fig, update, frames=frames, blit=False)
    anim.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path


def dump_rollout(env, params_pytree, policy_fn, steps, out_csv, seed=0):
    """Python-side trajectory dumper (same CSV schema as native/demo.c).

    policy_fn(obs, done) -> action; `done` is 1 when the PREVIOUS step
    terminated (the env auto-resets), so recurrent policies can zero their
    carry at episode boundaries exactly like the training/eval paths
    (ppo_rnn's carry keep-masking)."""
    import jax
    import numpy as np

    state = env.init(seed, 0, params=params_pytree)
    obs = env.observe(state)
    # params as a TRACED argument, not a closure (CLAUDE.md invariant:
    # closed-over EnvParams become XLA constants and divisions get
    # strength-reduced — the rendered rollout must match eval bitwise)
    step_j = jax.jit(lambda s, a, p: env.step(s, a, p))
    done = 0
    with open(out_csv, "w") as f:
        f.write("t,x,y,z,tx,ty,tz,reward,done\n")
        for t in range(steps):
            a = policy_fn(np.asarray(obs), done)
            state, out = step_j(state, a, params_pytree)
            obs = out.obs
            p = np.asarray(state.pos)
            tg = np.asarray(state.target)
            done = int(bool(out.terminated) or bool(out.truncated))
            f.write(f"{t},{p[0]:.4f},{p[1]:.4f},{p[2]:.4f},"
                    f"{tg[0]:.4f},{tg[1]:.4f},{tg[2]:.4f},"
                    f"{float(out.reward):.4f},{done}\n")
    return out_csv


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    gates = None
    if "--params" in argv:
        i = argv.index("--params")
        if i + 1 >= len(argv):
            print("error: --params needs a path (policy.drnw.params)",
                  file=sys.stderr)
            print(__doc__)
            return 2
        gates = load_gates(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if not argv:
        print(__doc__)
        return 2
    src = argv[0]
    out = argv[1] if len(argv) > 1 else "trajectory.png"
    rows = load_csv(src)
    title = f"{Path(src).name} ({len(rows)} steps)"
    if out.endswith(".gif"):
        path = render_gif(rows, out, title=title, gates=gates)
    else:
        path = render(rows, out, title=title, gates=gates)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
