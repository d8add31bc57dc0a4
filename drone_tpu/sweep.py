"""Hyperparameter sweep engine.

Rebuild of the reference's Protein sweep (SURVEY.md §2.2 #11, §3.4:
`[U] pufferlib/sweep.py` — suggests hyperparams from [sweep] ranges, runs a
training, scores it, updates a model, repeats). This implementation keeps
the same workflow with a random-search + successive-halving core (no GP —
zero extra deps, and on TPU a short fidelity run is cheap enough to brute
force):

  [sweep] section format (TOML):
      metric = "ep_return_mean"       # maximized
      trials = 16
      rungs = [50, 200]               # updates per fidelity rung
      keep = 0.5                      # fraction promoted per rung
      [sweep.space]
      "train.lr" = {log = [1e-4, 1e-2]}
      "train.ent_coef" = {log = [1e-5, 1e-2]}
      "train.clip_eps" = {lin = [0.1, 0.3]}
      "train.num_minibatches" = {choice = [2, 4, 8]}
"""

from __future__ import annotations

import json
import math
import random
from pathlib import Path

from drone_tpu.utils.config import Config


def sample_point(space: dict, rng: random.Random) -> dict:
    point = {}
    for key, spec in space.items():
        if "log" in spec:
            lo, hi = spec["log"]
            point[key] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
        elif "lin" in spec:
            lo, hi = spec["lin"]
            point[key] = rng.uniform(lo, hi)
        elif "choice" in spec:
            point[key] = rng.choice(spec["choice"])
        else:
            raise ValueError(f"unknown space spec for {key}: {spec}")
    return point


def apply_point(cfg: Config, point: dict) -> Config:
    overrides = [f"{k}={v}" for k, v in point.items()]
    return cfg.with_overrides(overrides)


def run_sweep(cfg: Config, out_path: str | Path | None = None,
              train_fn=None) -> list[dict]:
    """Random search with successive halving. Returns trial records sorted
    best-first. train_fn(cfg) -> final metrics dict (injectable for tests)."""
    from drone_tpu.train import train as _train

    train_fn = train_fn or (lambda c: _train(c)[1])
    sweep = dict(cfg.sweep)
    metric = sweep.get("metric", "ep_return_mean")
    trials = int(sweep.get("trials", 8))
    rungs = list(sweep.get("rungs", [50]))
    keep = float(sweep.get("keep", 0.5))
    space = sweep.get("space", {})
    if not space:
        raise ValueError("[sweep.space] is empty — nothing to search")

    rng = random.Random(cfg.run.seed)
    population = [{"point": sample_point(space, rng), "scores": []}
                  for _ in range(trials)]

    for rung_idx, updates in enumerate(rungs):
        for i, trial in enumerate(population):
            c = apply_point(cfg, trial["point"])  # with_overrides copies cfg
            c.run.total_updates = int(updates)
            c.run.run_name = f"{cfg.run.run_name}-sweep-r{rung_idx}-t{i}"
            c.run.checkpoint_interval = 10**9  # no checkpoints during sweep
            c.run.save_final = False
            final = train_fn(c)
            score = float(final.get(metric, float("-inf"))) if final else float("-inf")
            if math.isnan(score):
                score = float("-inf")  # diverged trial; NaN keys break sort
            trial["scores"].append(score)
            print(f"[sweep] rung {rung_idx} trial {i}: {metric}={score:.3f} "
                  f"point={trial['point']}")
        population.sort(key=lambda t: -t["scores"][-1])
        if rung_idx < len(rungs) - 1:
            population = population[: max(1, int(len(population) * keep))]

    results = [{"point": t["point"], "scores": t["scores"]} for t in population]
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        Path(out_path).write_text(json.dumps(results, indent=2))
    return results
