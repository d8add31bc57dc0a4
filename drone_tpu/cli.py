"""CLI: `python -m drone_tpu.cli {train,eval,bench,sweep,export} [config.toml]
[section.key=value ...]`.

Rebuild of the reference's `puffer` console entry point (SURVEY.md §1 L4,
§3.1/§3.3/§3.4: `puffer train puffer_drone`, `puffer eval`, `puffer sweep`,
INI config + dotted overrides).
"""

from __future__ import annotations

import argparse
import json
import sys

from drone_tpu.utils.config import Config


def _load_config(args) -> Config:
    config_path = args.config
    overrides = list(args.overrides)
    # `config` is optional; if the first positional looks like an override
    # (contains '='), it is one — argparse can't disambiguate for us.
    if config_path and "=" in config_path:
        overrides.insert(0, config_path)
        config_path = None
    cfg = Config.from_toml(config_path) if config_path else Config.default()
    return cfg.with_overrides(overrides)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="drone_tpu",
        description="TPU-native quadrotor RL environment + trainer",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name, helptext in (
        ("train", "run PPO training"),
        ("eval", "evaluate a checkpoint"),
        ("bench", "measure env throughput"),
        ("sweep", "hyperparameter sweep ([sweep] section)"),
        ("export", "export actor weights for the C runtime (DRNW)"),
        ("autotune", "measure train-SPS over batch shapes, report the best"),
        ("watch", "roll out the latest checkpoint and render a PNG/GIF"),
    ):
        p = sub.add_parser(name, help=helptext)
        p.add_argument("config", nargs="?", default=None,
                       help="TOML config file (optional)")
        p.add_argument("overrides", nargs="*",
                       help="dotted overrides, e.g. train.lr=1e-4 env.task=waypoint")
        if name == "export":
            p.add_argument("--out", default="policy.drnw")
        if name == "autotune":
            p.add_argument("--iters", type=int, default=3,
                           help="timed updates per candidate (after warmup)")
        if name == "watch":
            p.add_argument("--out", default="flight.gif",
                           help=".gif (animated) or .png (static)")
            p.add_argument("--steps", type=int, default=0,
                           help="rollout length (default: env horizon)")
        if name == "sweep":
            p.add_argument("--out", default=None,
                           help="results JSON path (default: "
                                "<checkpoint_dir>/<run_name>-sweep.json)")
            p.add_argument("--resume", action="store_true",
                           help="replay the sweep journal and continue an "
                                "interrupted sweep")
    args = parser.parse_args(argv)
    cfg = _load_config(args)

    if args.cmd == "train":
        from drone_tpu.train import train

        train(cfg)
    elif args.cmd == "eval":
        from drone_tpu.train import evaluate

        stats = evaluate(cfg)
        print(json.dumps(stats, indent=2))
    elif args.cmd == "bench":
        try:
            import bench  # repo-root bench.py (cwd == repo root)
        except ImportError:  # run from anywhere: load it next to the package
            import importlib.util
            from pathlib import Path

            import drone_tpu

            path = Path(drone_tpu.__file__).resolve().parent.parent / "bench.py"
            spec = importlib.util.spec_from_file_location("bench", path)
            bench = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(bench)
        bench.main(cfg)
    elif args.cmd == "sweep":
        from pathlib import Path

        from drone_tpu.sweep import run_sweep

        out = args.out or str(Path(cfg.run.checkpoint_dir)
                              / f"{cfg.run.run_name}-sweep.json")
        results = run_sweep(cfg, out_path=out, resume=args.resume)
        best = results[0]
        print("best:", json.dumps(best))
        print(f"results: {out} (journal: {out}.jsonl)")
    elif args.cmd == "autotune":
        from drone_tpu.autotune import autotune

        results = autotune(cfg, iters=args.iters)
        if not results:
            print("autotune: no candidate shape succeeded", file=sys.stderr)
            return 1
        best = results[0]
        print(json.dumps(results))
        print(f"best: {best['sps'] / 1e6:.2f}M SPS ({best['trainer']}) -> "
              f"{best['overrides']}")
    elif args.cmd == "watch":
        # render an episode of the latest checkpoint — the reference's
        # `puffer eval --render human` workflow (SURVEY.md §3.3), with the
        # raylib window replaced by a PNG/GIF artifact (viz/viewer.py).
        # Pure Python path: checkpoint -> policy rollout -> CSV -> render
        # (the C-demo route to the same artifact is scripts/
        # racing_artifact.sh).
        from pathlib import Path

        import jax
        import jax.numpy as jnp
        import numpy as np

        from drone_tpu.train import build_env_and_model, restore_dir
        from drone_tpu.utils.checkpoint import Checkpointer
        from viz.viewer import dump_rollout, load_csv, render, render_gif

        # the shared factory: watch renders EXACTLY the model training
        # built (hidden sizes, compute dtype) — no re-implemented switch
        env, model = build_env_and_model(cfg)
        ckpt = Checkpointer(restore_dir(cfg))
        raw, _ = ckpt.restore_raw()
        params = jax.tree_util.tree_map(jnp.asarray, raw["params"])
        if cfg.run.policy == "lstm":
            fwd = jax.jit(model.apply)
            carry_box = [model.initial_carry((1,))]

            def policy_fn(obs, done):
                if done:  # episode boundary: zero the carry, as in training
                    carry_box[0] = model.initial_carry((1,))
                mean, _, _, c2 = fwd(params, jnp.asarray(obs)[None],
                                     carry_box[0])
                carry_box[0] = c2
                return np.asarray(mean[0])
        else:
            fwd = jax.jit(lambda p, o: model.apply(p, o[None])[0][0])
            policy_fn = lambda obs, done: np.asarray(
                fwd(params, jnp.asarray(obs)))
        steps = args.steps or int(env.params.horizon)
        csv_path = str(Path(args.out).with_suffix(".csv"))
        dump_rollout(env, env.params, policy_fn, steps, csv_path,
                     seed=cfg.run.seed)
        gates = None
        if env.statics.task == "racing":
            g = np.asarray(env.params.gates)
            gates = [tuple(map(float, row))
                     for row in g[: int(env.params.n_gates)]]
        rows = load_csv(csv_path)
        out = (render_gif(rows, args.out, gates=gates)
               if args.out.endswith(".gif")
               else render(rows, args.out, gates=gates))
        print(f"wrote {out} (trajectory: {csv_path})")
    elif args.cmd == "export":
        from drone_tpu.models import export_flat_weights
        from drone_tpu.train import build_env_and_model, restore_dir
        from drone_tpu.utils.checkpoint import Checkpointer

        ckpt = Checkpointer(restore_dir(cfg))
        raw, _ = ckpt.restore_raw()
        # the model carries the authoritative conv geometry (strides are
        # not recorded in params — see export_flat_weights)
        _, model = build_env_and_model(cfg)
        export_flat_weights(raw["params"], args.out,
                            hidden=tuple(cfg.run.hidden), model=model)
        # also dump the env params struct for the C demo (native/demo.c),
        # behind a versioned header (magic, version, struct size) so a
        # stale dump can never be silently reinterpreted if DroneParams
        # ever grows
        import ctypes
        import struct

        from oracle.oracle import params_to_c

        statics, env_params = cfg.env.build()
        cstruct = params_to_c(env_params)
        with open(args.out + ".params", "wb") as f:
            f.write(struct.pack("<III", 0x44524E50, 1,
                                ctypes.sizeof(cstruct)))
            f.write(bytes(cstruct))
        print(f"wrote {args.out} and {args.out}.params")
    return 0


if __name__ == "__main__":
    sys.exit(main())
