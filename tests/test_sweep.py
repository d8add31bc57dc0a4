"""Sweep engine tests: GP-EI suggester, Pareto front, parallel launcher.

The reference's Protein sweep is model-based and Pareto-aware (SURVEY.md
§2.2 #11); these tests pin the capability: the surrogate beats random
search on a known objective at equal trial budget, the front is the
non-dominated set, and the process-parallel launcher produces the same
record structure as the sequential path.
"""

import math
import random

import numpy as np

from drone_tpu.sweep import (
    GPSuggester,
    pareto_front,
    run_sweep,
    sample_point,
)
from drone_tpu.utils.config import Config

SPACE = {
    "train.lr": {"log": [1e-5, 1e-1]},
    "train.clip_eps": {"lin": [0.0, 1.0]},
}


def _objective(point):
    """Smooth bowl with the optimum at lr=1e-3, clip=0.3 (maximized)."""
    u = (math.log10(point["train.lr"]) + 3.0) / 2.0   # 0 at optimum, +-2
    v = (point["train.clip_eps"] - 0.3) / 0.35
    return -(u * u + v * v)


def test_gp_suggester_beats_random_search():
    """Equal budget (24 trials), same seed: the GP's best found value must
    beat random search's on the bowl — the Protein-parity gate."""
    budget = 24

    def best_with(sug, seed):
        rng = random.Random(seed)
        best = -np.inf
        for _ in range(budget):
            p = sug.suggest() if sug else sample_point(SPACE, rng)
            s = _objective(p)
            if sug:
                sug.observe(p, s)
            best = max(best, s)
        return best

    wins = 0
    for seed in (0, 1, 2):
        b_gp = best_with(GPSuggester(SPACE, seed=seed), seed)
        b_rand = best_with(None, seed)
        wins += b_gp > b_rand
        assert b_gp > -0.15, (seed, b_gp)  # near the optimum regardless
    assert wins >= 2  # model-based search wins the budget comparison


def test_gp_suggester_api_roundtrip():
    sug = GPSuggester(SPACE, seed=3, n_init=2)
    for _ in range(6):
        p = sug.suggest()
        assert 1e-5 <= p["train.lr"] <= 1e-1
        assert 0.0 <= p["train.clip_eps"] <= 1.0
        sug.observe(p, _objective(p))
    # encode/decode are inverse on the grid the suggester emits
    u = sug._encode(p)
    p2 = sug._decode(u)
    assert abs(math.log(p2["train.lr"]) - math.log(p["train.lr"])) < 1e-9
    # NaN/-inf observations don't poison the surrogate
    sug.observe(sug.suggest(), float("nan"))
    sug.observe(sug.suggest(), float("-inf"))
    assert all(math.isfinite(y) for y in sug.y)
    assert np.isfinite(sug._encode(sug.suggest())).all()


def test_gp_suggester_categorical():
    space = dict(SPACE)
    space["train.num_minibatches"] = {"choice": [2, 4, 8]}
    sug = GPSuggester(space, seed=0, n_init=2)
    for _ in range(8):
        p = sug.suggest()
        assert p["train.num_minibatches"] in (2, 4, 8)
        sug.observe(p, _objective(p) - 0.1 * p["train.num_minibatches"])


def test_pareto_front():
    rs = [
        {"cost": 1, "score": 0.5},   # front (cheapest)
        {"cost": 2, "score": 0.4},   # dominated by the first
        {"cost": 2, "score": 0.9},   # front
        {"cost": 5, "score": 0.9},   # dominated (same score, pricier)
        {"cost": 5, "score": 1.2},   # front (best score)
    ]
    front = pareto_front(rs)
    assert [r["cost"] for r in front] == [1, 2, 5]
    assert [r["score"] for r in front] == [0.5, 0.9, 1.2]


def _fake_train(cfg):
    """Module-level (picklable) trial: deterministic score from the point."""
    return {"score": _objective({
        "train.lr": cfg.train.lr,
        "train.clip_eps": cfg.train.clip_eps,
    })}


def test_run_sweep_parallel_workers():
    cfg = Config.default()
    cfg.sweep = {"metric": "score", "trials": 4, "rungs": [1], "keep": 0.5,
                 "space": SPACE, "suggester": "random", "workers": 2}
    results = run_sweep(cfg, train_fn=_fake_train)
    assert len(results) == 4
    assert all(math.isfinite(r["score"]) for r in results)
    assert results[0]["score"] == max(r["score"] for r in results)


def test_cost_aware_acquisition_prefers_cheap_region():
    """gp_pareto parity gate: with a FLAT objective (equal EI everywhere)
    and observed costs 10x higher in one half of the space, suggestions
    concentrate in the cheap half — the cost model drives suggestion, not
    just reporting."""
    rng = random.Random(0)
    sug = GPSuggester(SPACE, seed=0, n_init=2, cost_aware=True)
    for _ in range(12):
        p = sample_point(SPACE, rng)
        cost = 10.0 if p["train.clip_eps"] > 0.5 else 1.0
        sug.observe(p, 0.0, cost=cost)
    cheap = sum(sug.suggest()["train.clip_eps"] <= 0.5 for _ in range(10))
    assert cheap >= 8, cheap
    # and the plain-EI suggester shows no such preference on the same data
    base = GPSuggester(SPACE, seed=0, n_init=2, cost_aware=False)
    rng = random.Random(0)
    for _ in range(12):
        p = sample_point(SPACE, rng)
        base.observe(p, 0.0)
    cheap_base = sum(base.suggest()["train.clip_eps"] <= 0.5
                     for _ in range(10))
    assert cheap_base < cheap


def test_failure_penalty_does_not_ratchet():
    """Consecutive failures all map to (worst real score - 1), not a
    staircase down through prior penalties."""
    sug = GPSuggester(SPACE, seed=1, n_init=2)
    sug.observe(sample_point(SPACE, random.Random(1)), -2.0)
    for _ in range(4):
        sug.observe(sample_point(SPACE, random.Random(2)), float("nan"))
    assert sug.y[1:] == [-3.0, -3.0, -3.0, -3.0]


def test_diverged_trial_does_not_abort_sweep(tmp_path):
    """A trial that raises an ordinary Exception (diverged run, bad config)
    scores -inf and the sweep carries on — batch-mates and later trials
    still train and the failed point is journaled."""
    cfg = Config.default()
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.sweep = {"metric": "score", "trials": 4, "rungs": [1],
                 "keep": 0.5, "space": SPACE, "suggester": "random"}
    out = tmp_path / "results.json"
    n = []

    def flaky(c):
        n.append(1)
        if len(n) == 2:
            raise RuntimeError("diverged")
        return _fake_train(c)

    results = run_sweep(cfg, out_path=out, train_fn=flaky)
    assert len(results) == 4
    assert sum(r["score"] == float("-inf") for r in results) == 1
    assert sum(math.isfinite(r["score"]) for r in results) == 3
    journal = tmp_path / "results.json.jsonl"
    assert len(journal.read_text().splitlines()) == 4


def test_sweep_journal_and_resume(tmp_path):
    """A sweep interrupted mid-run resumes from its journal: completed
    trials are replayed, only the remainder re-trains."""
    cfg = Config.default()
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.sweep = {"metric": "score", "trials": 6, "rungs": [1, 2],
                 "keep": 0.5, "space": SPACE, "suggester": "gp"}
    out = tmp_path / "results.json"

    calls = []

    def crashy(c):
        if len(calls) >= 4:
            # a HARD crash (SIGINT/OOM-kill class) — BaseException escapes
            # _timed_call's Exception net, which exists to keep mere
            # diverged trials from aborting the sweep
            raise KeyboardInterrupt("simulated crash at trial 4")
        calls.append(c.run.run_name)
        return _fake_train(c)

    try:
        run_sweep(cfg, out_path=out, train_fn=crashy)
        raise AssertionError("crash did not fire")
    except KeyboardInterrupt:
        pass
    journal = tmp_path / "results.json.jsonl"
    assert journal.exists()
    assert len(journal.read_text().splitlines()) == 4

    def counting(c):
        calls.append(c.run.run_name)
        return _fake_train(c)

    results = run_sweep(cfg, out_path=out, train_fn=counting, resume=True)
    # 6 rung-0 + 3 survivors = 9 trainings total; 4 were journaled
    assert len(calls) == 9
    assert len(results) == 6
    assert out.exists()
    assert len(journal.read_text().splitlines()) == 9
    # and the journal replays cleanly: resuming a COMPLETE sweep retrains 0
    n_before = len(calls)
    results2 = run_sweep(cfg, out_path=out, train_fn=counting, resume=True)
    assert len(calls) == n_before
    assert [r["point"] for r in results2] == [r["point"] for r in results]


def test_resume_never_attaches_mismatched_journal_records(tmp_path):
    """Survivor identity across resume is positional, and a parallel
    original run inserts tied trials into the population in COMPLETION
    order while replay inserts in index order — so a journaled later-rung
    record is only attached when its point matches the survivor at that
    position; a mismatch (simulated here by swapping the two rung-1
    records' points) re-trains instead of crediting the wrong trial."""
    import json as _json

    cfg = Config.default()
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.sweep = {"metric": "score", "trials": 4, "rungs": [1, 2],
                 "keep": 0.5, "space": SPACE, "suggester": "random"}
    out = tmp_path / "results.json"
    results = run_sweep(cfg, out_path=out, train_fn=_fake_train)
    journal = tmp_path / "results.json.jsonl"
    recs = [_json.loads(l) for l in journal.read_text().splitlines()]
    r1 = [r for r in recs if r["rung"] == 1]
    assert len(r1) == 2
    r1[0]["point"], r1[1]["point"] = r1[1]["point"], r1[0]["point"]
    journal.write_text("\n".join(_json.dumps(r) for r in recs) + "\n")

    calls = []

    def counting(c):
        calls.append(c.run.run_name)
        return _fake_train(c)

    res2 = run_sweep(cfg, out_path=out, train_fn=counting, resume=True)
    # both tampered rung-1 records mismatch their survivors -> re-trained
    assert len(calls) == 2
    assert all("-r1-" in name for name in calls)
    # and the results match the untampered run (deterministic objective)
    key = lambda rs: sorted((_json.dumps(r["point"], sort_keys=True),
                             tuple(r["scores"])) for r in rs)
    assert key(res2) == key(results)


def test_final_ranking_is_fidelity_aware(tmp_path):
    """A noisy rung-0 score can't outrank a survivor's top-rung score: the
    ranking orders by rungs completed first."""
    cfg = Config.default()
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.sweep = {"metric": "score", "trials": 8, "rungs": [1, 3],
                 "keep": 0.25, "space": SPACE, "suggester": "random"}

    def decaying(c):
        # top-rung scores come out LOWER than every rung-0 score
        base = _fake_train(c)["score"]
        return {"score": base - (100.0 if c.run.total_updates > 1 else 0.0)}

    results = run_sweep(cfg, train_fn=decaying)
    assert results[0]["rungs_completed"] == 2
    assert results[0]["score"] < min(
        r["score"] for r in results if r["rungs_completed"] == 1)


def test_run_sweep_gp_end_to_end():
    """GP-driven sweep through the real run_sweep plumbing (fake trainer):
    finds a near-optimal point within 12 cheap trials."""
    cfg = Config.default()
    cfg.sweep = {"metric": "score", "trials": 12, "rungs": [1, 2],
                 "keep": 0.25, "space": SPACE, "suggester": "gp"}
    results = run_sweep(cfg, train_fn=_fake_train)
    assert len(results) == 12
    assert results[0]["score"] > -0.5
    front = [r for r in results if r["pareto"]]
    assert front and max(r["score"] for r in front) == results[0]["score"]
