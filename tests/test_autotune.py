"""Autotune: candidate-shape generation + the real measurement path.

Reference parity: `puffer autotune` searches vectorization shapes for peak
SPS on the user's machine (SURVEY.md §2.2 #11 CLI surface); here the
knobs are train.num_envs / train.num_minibatches (drone_tpu/autotune.py).
"""

import jax

from drone_tpu.autotune import autotune, candidate_shapes, measure_train_sps
from drone_tpu.utils.config import Config


def _cfg(num_envs=512, mb=2, horizon=8):
    import dataclasses

    cfg = Config.default()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, num_envs=num_envs, num_minibatches=mb, horizon=horizon,
        epochs=1))
    cfg.run.total_updates = 4
    return cfg


def test_candidate_shapes_alignment_and_baseline():
    cfg = _cfg(num_envs=4096, mb=4)
    cands = candidate_shapes(cfg)
    lane_mult = 128 if jax.default_backend() == "cpu" else 1024
    assert (4096, 4) in cands  # the current config is always measured
    for n, mb in cands:
        assert n % (lane_mult * mb) == 0 or (n, mb) == (4096, 4), (n, mb)
    # the sweep actually explores: multiple env counts and minibatch counts
    assert len({n for n, _ in cands}) >= 3
    assert len({mb for _, mb in cands}) >= 2


def test_candidate_shapes_keeps_misaligned_baseline():
    cfg = _cfg(num_envs=384, mb=3)  # misaligned on any backend's kernel rule
    cands = candidate_shapes(cfg)
    assert (384, 3) in cands
    # num_envs below the lane multiple: the powers-of-two scaling set clamps
    # it out entirely, so only the unconditional baseline entry covers it
    cfg = _cfg(num_envs=96, mb=2)
    cands = candidate_shapes(cfg)
    assert (96, 2) in cands
    assert cands.count((96, 2)) == 1


def test_autotune_ranks_with_stub_measure():
    cfg = _cfg()
    # stub: throughput grows with num_envs, scan label for odd minibatches
    fake = lambda c: (float(c.train.num_envs * 10 - c.train.num_minibatches),
                      "stub")
    res = autotune(cfg, candidates=[(256, 2), (1024, 2), (512, 4)],
                   measure_fn=fake, verbose=False)
    assert [r["num_envs"] for r in res] == [1024, 512, 256]
    assert res[0]["overrides"] == "train.num_envs=1024 train.num_minibatches=2"
    assert all(r["trainer"] == "stub" for r in res)


def test_autotune_skips_failing_candidates():
    cfg = _cfg()

    def flaky(c):
        if c.train.num_envs == 512:
            raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")
        return 1.0, "stub"

    res = autotune(cfg, candidates=[(256, 2), (512, 2)], measure_fn=flaky,
                   verbose=False)
    assert [r["num_envs"] for r in res] == [256]


def test_autotune_real_measurement_tiny():
    """One real candidate through train.build + the timed loop on CPU —
    the measurement path itself (compile, warmup, value-fetch sync)."""
    cfg = _cfg(num_envs=256, mb=2, horizon=8)
    sps, label = measure_train_sps(cfg, iters=1)
    assert sps > 0
    assert label in ("megakernel", "scan/hybrid")
