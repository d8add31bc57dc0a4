"""Framework-layer tests: config/CLI/checkpoint/metrics/sweep/export/native
inference — the L4/L5 components (SURVEY.md §2.2 #11-13, §5)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu.models import ActorCritic, export_flat_weights, load_flat_weights
from drone_tpu.utils.config import Config, RunConfig


REPO = Path(__file__).resolve().parent.parent


def test_config_default_and_overrides():
    cfg = Config.default()
    cfg = cfg.with_overrides([
        "train.lr=0.001", "train.num_envs=128", "env.task=waypoint",
        "env.params.mass=0.5", "run.seed=7", "run.hidden=(32,32)",
    ])
    assert cfg.train.lr == 0.001
    assert cfg.train.num_envs == 128
    assert cfg.env.task == "waypoint"
    assert cfg.env.params["mass"] == 0.5
    assert cfg.run.seed == 7
    assert cfg.run.hidden == (32, 32)
    statics, params = cfg.env.build()
    assert statics.task == "waypoint"
    assert float(params.mass) == 0.5


def test_config_from_toml():
    cfg = Config.from_toml(REPO / "configs" / "hover.toml")
    assert cfg.env.task == "hover"
    assert cfg.train.num_envs == 65536
    cfg2 = Config.from_toml(REPO / "configs" / "sweep_hover.toml")
    assert "train.lr" in cfg2.sweep["space"]


def test_config_overrides_never_mutate_base():
    """Regression: with_overrides used to share the mutable run/env dataclasses
    with the base config, so sweep trials renamed each other's run dirs
    (run_name grew like 'x-sweep-r0-t0-sweep-r0-t1-...')."""
    base = Config.default()
    derived = base.with_overrides(["train.lr=0.001"])
    derived.run.run_name = "trial-0"
    derived.run.total_updates = 7
    derived.env.task = "waypoint"
    derived.env.params["mass"] = 0.5
    assert base.run.run_name == "run"
    assert base.run.total_updates == RunConfig().total_updates
    assert base.env.task == "hover"
    assert "mass" not in base.env.params

    # simulate two sweep trials derived from the same base
    names = []
    for i in range(3):
        c = base.with_overrides([])
        c.run.run_name = f"{base.run.run_name}-t{i}"
        names.append(c.run.run_name)
    assert names == ["run-t0", "run-t1", "run-t2"]


def test_config_bad_override_rejected():
    with pytest.raises(ValueError):
        Config.default().with_overrides(["nosection.key=1"])
    with pytest.raises(ValueError):
        Config.default().with_overrides(["noequals"])


def test_weight_export_roundtrip(tmp_path):
    model = ActorCritic(hidden=(16, 16))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    path = tmp_path / "w.drnw"
    export_flat_weights(params, str(path), hidden=(16, 16))
    layers = load_flat_weights(str(path))
    assert [l[1].shape for l in layers] == [(13, 16), (16, 16), (16, 4)]
    # numpy forward == flax forward (same tanh, fp32; tight tolerance)
    obs = np.random.RandomState(0).randn(5, 13).astype(np.float32)
    x = obs
    for _, w, b, act in layers:
        x = x @ w + b
        if act == 1:
            x = np.tanh(x)
    mean, _, _ = model.apply(params, jnp.asarray(obs))
    np.testing.assert_allclose(x, np.asarray(mean), rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def demo_binary():
    subprocess.run(["make", "-C", str(REPO / "native")], check=True,
                   capture_output=True)
    return REPO / "native" / "drone_demo"


def _ctypes_net(path):
    """ctypes handle to libdronenet + a loaded DroneNet for `path`."""
    import ctypes as ct

    lib = ct.CDLL(str(REPO / "native" / "libdronenet.so"))
    net = ct.create_string_buffer(16 * 1024)  # > sizeof(DroneNet)
    assert lib.dronenet_load(net, str(path).encode()) == 0
    lib.dronenet_scratch_size.restype = ct.c_int
    return lib, net


def _c_forward(lib, net, obs, state=None):
    import ctypes as ct

    scratch = np.zeros(lib.dronenet_scratch_size(net), np.float32)
    out = np.zeros(4, np.float32)
    obs = np.ascontiguousarray(obs, np.float32)
    fp = ct.POINTER(ct.c_float)
    st = state.ctypes.data_as(fp) if state is not None else None
    lib.dronenet_forward(net, obs.ctypes.data_as(fp),
                         out.ctypes.data_as(fp),
                         scratch.ctypes.data_as(fp), st)
    return out


def test_c_forward_matches_flax_mlp(tmp_path, demo_binary):
    """libdronenet dense forward == flax ActorCritic actor mean."""
    model = ActorCritic(hidden=(16, 16))
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 13)))
    path = tmp_path / "w.drnw"
    export_flat_weights(params, str(path), hidden=(16, 16))
    lib, net = _ctypes_net(path)
    obs = np.random.RandomState(1).randn(8, 13).astype(np.float32)
    mean, _, _ = model.apply(params, jnp.asarray(obs))
    for i in range(8):
        np.testing.assert_allclose(
            _c_forward(lib, net, obs[i]), np.asarray(mean[i]),
            rtol=1e-5, atol=1e-6)


def test_c_forward_matches_flax_lstm(tmp_path, demo_binary):
    """libdronenet LSTM forward (DRNW v2) tracks flax LSTMActorCritic over a
    multi-step sequence, including a mid-sequence state reset."""
    from drone_tpu.models import LSTMActorCritic

    model = LSTMActorCritic(hidden=8, encoder=(16,))
    carry = model.initial_carry((1,))
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 13)), carry)
    path = tmp_path / "w.drnw"
    export_flat_weights(params, str(path))
    lib, net = _ctypes_net(path)

    state = np.zeros(2 * 8, np.float32)  # h + c for hidden=8

    obs = np.random.RandomState(2).randn(12, 13).astype(np.float32)
    for t in range(12):
        if t == 6:  # episode boundary: both sides reset their carry
            state[:] = 0.0
            carry = model.initial_carry((1,))
        mean, _, _, carry = model.apply(params, jnp.asarray(obs[t : t + 1]), carry)
        c_out = _c_forward(lib, net, obs[t], state)
        np.testing.assert_allclose(
            c_out, np.asarray(mean[0]), rtol=2e-5, atol=2e-6,
            err_msg=f"diverged at t={t}")


def test_c_forward_matches_flax_cnn(tmp_path, demo_binary):
    """libdronenet pixel-CNN forward (DRNW v3: render + patchify convs +
    relu trunk) == flax PatchCNNActorCritic actor mean — the third policy
    family deployable to the pure-C demo."""
    from drone_tpu.models import PatchCNNActorCritic

    model = PatchCNNActorCritic(res=8, patch0=2, patch1=2, channels=(8, 8),
                                hidden=16)
    params = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 13)))
    path = tmp_path / "w.drnw"
    export_flat_weights(params, str(path))
    lib, net = _ctypes_net(path)
    rng = np.random.RandomState(3)
    obs = rng.randn(8, 13).astype(np.float32)
    obs[:, 3:7] /= np.linalg.norm(obs[:, 3:7], axis=1, keepdims=True)
    mean, _, _ = model.apply(params, jnp.asarray(obs))
    for i in range(8):
        np.testing.assert_allclose(
            _c_forward(lib, net, obs[i]), np.asarray(mean[i]),
            rtol=1e-5, atol=1e-6)


def test_c_forward_matches_flax_cnn_lstm(tmp_path, demo_binary):
    """libdronenet pixel-recurrent forward (DRNW v3: render + patchify
    convs + relu trunk + LSTM + head) tracks flax CNNLSTMActorCritic over a
    multi-step sequence with a mid-sequence reset — the fourth policy
    family deployable to the pure-C demo (LSTMWrapper-over-CNN parity,
    SURVEY.md:158)."""
    from drone_tpu.models import CNNLSTMActorCritic

    model = CNNLSTMActorCritic(res=8, patch0=2, patch1=2, channels=(8, 8),
                               trunk_hidden=16, hidden=8)
    carry = model.initial_carry((1,))
    params = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 13)), carry)
    path = tmp_path / "w.drnw"
    export_flat_weights(params, str(path), model=model)
    layers = load_flat_weights(str(path))
    assert [l[0] for l in layers] == ["render", "conv", "conv", "dense",
                                      "lstm", "dense"]
    lib, net = _ctypes_net(path)

    state = np.zeros(2 * 8, np.float32)  # h + c for hidden=8
    rng = np.random.RandomState(4)
    obs = rng.randn(12, 13).astype(np.float32)
    obs[:, 3:7] /= np.linalg.norm(obs[:, 3:7], axis=1, keepdims=True)
    for t in range(12):
        if t == 6:  # episode boundary: both sides reset their carry
            state[:] = 0.0
            carry = model.initial_carry((1,))
        mean, _, _, carry = model.apply(params, jnp.asarray(obs[t:t + 1]),
                                        carry)
        c_out = _c_forward(lib, net, obs[t], state)
        np.testing.assert_allclose(
            c_out, np.asarray(mean[0]), rtol=2e-5, atol=2e-5,
            err_msg=f"diverged at t={t}")


def test_export_rejects_overlapping_cnn(tmp_path):
    """Conv stride isn't recorded in flax params, so only the known
    PatchCNNActorCritic architecture (exactly two patchify convs) is
    exportable — a Nature-CNN-shaped CNNActorCritic must fail export
    validation, not write a wrong network."""
    from drone_tpu.models import CNNActorCritic

    model = CNNActorCritic(hidden=16)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 36, 36, 4)))
    with pytest.raises(ValueError, match="PatchCNN"):
        export_flat_weights(params, str(tmp_path / "bad.drnw"))


def test_export_model_geometry_is_authoritative(tmp_path):
    """ADVICE r4: shape inference can false-accept a 2-conv overlapping
    tower — e.g. channels=(32,64), kernels=(8,4), strides=(4,2) on a
    36x36x4 input passes every shape cross-check and would silently export
    a wrong kernel==stride network at an inferred res=96. Passing the model
    makes the geometry authoritative: a model without patch attributes is
    rejected, and a geometry mismatch is rejected."""
    from drone_tpu.models import CNNActorCritic, PatchCNNActorCritic

    model = CNNActorCritic(channels=(32, 64), kernels=(8, 4), strides=(4, 2),
                           hidden=16)
    params = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 36, 36, 4)))
    with pytest.raises(ValueError, match="no patch geometry"):
        export_flat_weights(params, str(tmp_path / "bad2.drnw"), model=model)

    patch = PatchCNNActorCritic(res=8, patch0=2, patch1=2, channels=(8, 8),
                                hidden=16)
    pparams = patch.init(jax.random.PRNGKey(10), jnp.zeros((1, 13)))
    # correct model: exports fine
    export_flat_weights(pparams, str(tmp_path / "ok.drnw"), model=patch)
    # wrong geometry claimed by the model: rejected
    other = PatchCNNActorCritic(res=16, patch0=4, patch1=2, channels=(8, 8),
                                hidden=16)
    with pytest.raises(ValueError, match="disagrees"):
        export_flat_weights(pparams, str(tmp_path / "mis.drnw"), model=other)


def test_old_pixel_cnn_checkpoint_fails_with_rename_hint():
    """ADVICE r4: run.policy='cnn' now builds PatchCNNActorCritic; a
    checkpoint written when 'cnn' meant PixelActorCritic (params nested
    under a 'cnn' submodule) must fail with a pointer at
    run.policy=cnn_overlap, not an opaque orbax tree mismatch."""
    import dataclasses

    from drone_tpu.models import PatchCNNActorCritic, PixelActorCritic
    from drone_tpu.train import _check_cnn_checkpoint_layout

    cfg = dataclasses.replace(Config.default(), run=RunConfig(policy="cnn"))
    old = PixelActorCritic(channels=(4, 4), hidden=8)
    old_params = old.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    with pytest.raises(RuntimeError, match="cnn_overlap"):
        _check_cnn_checkpoint_layout(cfg, dict(old_params))

    new = PatchCNNActorCritic(res=8, patch0=2, patch1=2, channels=(8, 8),
                              hidden=16)
    new_params = new.init(jax.random.PRNGKey(1), jnp.zeros((1, 13)))
    _check_cnn_checkpoint_layout(cfg, dict(new_params))  # fine
    # and cnn_overlap evaluating its own checkpoint is fine
    cfg2 = dataclasses.replace(cfg, run=RunConfig(policy="cnn_overlap"))
    _check_cnn_checkpoint_layout(cfg2, dict(old_params))


def test_export_probes_depth_from_params(tmp_path):
    """Regression: export used to trust a caller-supplied hidden tuple and
    silently truncated deeper towers (equal widths chain without error)."""
    model = ActorCritic(hidden=(8, 8, 8))
    params = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 13)))
    path = tmp_path / "deep.drnw"
    export_flat_weights(params, str(path))  # no depth hint
    layers = load_flat_weights(str(path))
    assert [l[1].shape for l in layers] == [(13, 8), (8, 8), (8, 8), (8, 4)]
    obs = np.random.RandomState(3).randn(3, 13).astype(np.float32)
    x = obs
    for _, w, b, act in layers:
        x = x @ w + b
        if act == 1:
            x = np.tanh(x)
    mean, _, _ = model.apply(params, jnp.asarray(obs))
    np.testing.assert_allclose(x, np.asarray(mean), rtol=1e-5, atol=1e-6)


def test_drnw_v2_roundtrip(tmp_path):
    from drone_tpu.models import LSTMActorCritic

    model = LSTMActorCritic(hidden=8, encoder=(16,))
    params = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 13)),
                        model.initial_carry((1,)))
    path = tmp_path / "w2.drnw"
    export_flat_weights(params, str(path))
    layers = load_flat_weights(str(path))
    kinds = [l[0] for l in layers]
    assert kinds == ["dense", "lstm", "dense"]
    _, wi, wh, bh = layers[1]
    assert wi[0].shape == (16, 8) and wh[0].shape == (8, 8) and bh[0].shape == (8,)


def test_native_inference_matches_flax(tmp_path, demo_binary):
    """C dronenet forward == flax forward (via a tiny C harness run through
    the demo's net loader is complex; instead compare demo episode behavior
    deterministically: run demo twice -> identical output)."""
    model = ActorCritic(hidden=(16, 16))
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 13)))
    path = tmp_path / "w.drnw"
    export_flat_weights(params, str(path), hidden=(16, 16))
    r1 = subprocess.run([str(demo_binary), str(path), "-", "2", "0", "7"],
                        capture_output=True, text=True, cwd=tmp_path)
    r2 = subprocess.run([str(demo_binary), str(path), "-", "2", "0", "7"],
                        capture_output=True, text=True, cwd=tmp_path)
    assert r1.returncode == 0, r1.stderr
    assert r1.stdout == r2.stdout
    assert "episodes, pure C" in r1.stdout
    assert (tmp_path / "trajectory.csv").exists()


def test_native_demo_python_cross_check(tmp_path, demo_binary):
    """C demo vs Python rollout of the same policy through the oracle env
    (same seed/lane). Two tiers:

    1. bounded-horizon ACTION agreement: the demo dumps its per-step
       actions into trajectory.csv; the first K steps must match the flax
       policy replayed through the oracle to 1e-5 — this pins the exported
       weights + C forward pass hard, before chaotic divergence.
    2. whole-episode return: loose (tanhf vs XLA tanh ulps compound
       chaotically over hundreds of steps)."""
    from oracle import Oracle

    model = ActorCritic(hidden=(16, 16))
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 13)))
    path = tmp_path / "w.drnw"
    export_flat_weights(params, str(path), hidden=(16, 16))

    r = subprocess.run([str(demo_binary), str(path), "-", "1", "0", "11"],
                       capture_output=True, text=True, cwd=tmp_path)
    line = [l for l in r.stdout.splitlines() if l.startswith("episode 0")][0]
    c_return = float(line.split("return ")[1].split(" ")[0])

    import csv

    with open(tmp_path / "trajectory.csv") as f:
        rows = list(csv.DictReader(f))
    c_actions = np.asarray(
        [[float(row[f"a{k}"]) for k in range(4)] for row in rows],
        np.float32)

    env = drone_tpu.DroneEnv()
    o = Oracle(env.params)
    fs, ist, keys = o.reset(11, 0)
    obs = o.observe(fs)
    ep_ret = 0.0
    py_actions = []
    for _ in range(2000):
        mean, _, _ = model.apply(params, jnp.asarray(obs[None]))
        py_actions.append(np.asarray(mean[0]))
        obs, rew, term, trunc, epret, eplen = o.step(fs, ist, np.asarray(mean[0]), keys)
        if term or trunc:
            ep_ret = epret
            break
    py_actions = np.stack(py_actions)

    K = min(20, len(c_actions), len(py_actions))
    assert K >= 10  # the comparison window must really exist
    np.testing.assert_allclose(c_actions[:K], py_actions[:K],
                               rtol=1e-5, atol=1e-5)
    # tanhf (C) vs XLA tanh differ in ulps, trajectories can diverge
    # chaotically; whole-episode return compares loosely
    assert abs(c_return - ep_ret) / (abs(ep_ret) + 1.0) < 0.5, (c_return, ep_ret)


def test_native_demo_params_header_and_integrator(tmp_path, demo_binary):
    """The params file is version-guarded (bad magic / size rejected) and
    the integrator CLI argument changes the physics."""
    import ctypes
    import struct

    from oracle.oracle import params_to_c

    model = ActorCritic(hidden=(16, 16))
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 13)))
    path = tmp_path / "w.drnw"
    export_flat_weights(params, str(path), hidden=(16, 16))

    env = drone_tpu.DroneEnv()
    cstruct = params_to_c(env.params)
    good = tmp_path / "p.params"
    good.write_bytes(struct.pack("<III", 0x44524E50, 1,
                                 ctypes.sizeof(cstruct)) + bytes(cstruct))
    run = lambda *extra: subprocess.run(
        [str(demo_binary), str(path), *extra], capture_output=True,
        text=True, cwd=tmp_path)

    ok = run(str(good), "1", "0", "11")
    assert ok.returncode == 0, ok.stderr

    # raw struct without the header -> rejected, not misread
    bad = tmp_path / "raw.params"
    bad.write_bytes(bytes(cstruct))
    r = run(str(bad), "1", "0", "11")
    assert r.returncode != 0 and "bad magic" in r.stderr

    # size mismatch -> rejected
    short = tmp_path / "short.params"
    short.write_bytes(struct.pack("<III", 0x44524E50, 1, 4) + b"\x00" * 4)
    r = run(str(short), "1", "0", "11")
    assert r.returncode != 0 and "out of sync" in r.stderr

    # euler vs rk4 produce different (both finite) trajectories
    outs = {}
    for integ in ("0", "1"):
        r = run(str(good), "1", "0", "11", integ)
        assert r.returncode == 0, r.stderr
        line = [l for l in r.stdout.splitlines()
                if l.startswith("episode 0")][0]
        outs[integ] = float(line.split("return ")[1].split(" ")[0])
    assert outs["0"] != outs["1"]


def test_metrics_jsonl(tmp_path):
    from drone_tpu.utils.metrics import MetricsLogger, dashboard_line

    log = MetricsLogger(tmp_path / "m.jsonl")
    rec = log.log(100, {"loss": jnp.float32(1.5), "ep_return_mean": 2.0}, sps=1e6)
    log.close()
    lines = (tmp_path / "m.jsonl").read_text().splitlines()
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["global_step"] == 100 and parsed["SPS"] == 1e6
    assert "loss" in dashboard_line(1, 10, rec)


def test_checkpoint_roundtrip(tmp_path):
    from drone_tpu.utils.checkpoint import Checkpointer

    env = drone_tpu.DroneEnv()
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=32, epochs=1, num_minibatches=1)
    model = ActorCritic(hidden=(16,))
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)

    ckpt = Checkpointer(tmp_path / "ck")
    ckpt.save(5, runner)
    ckpt.wait()
    restored, step = ckpt.restore(runner)
    assert step == 5
    for a, b in zip(jax.tree_util.tree_leaves(runner),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    raw, _ = ckpt.restore_raw()
    assert "params" in raw


def test_sweep_machinery():
    from drone_tpu.sweep import apply_point, run_sweep, sample_point
    import random

    space = {"train.lr": {"log": [1e-4, 1e-2]},
             "train.clip_eps": {"lin": [0.1, 0.3]},
             "train.num_minibatches": {"choice": [2, 4]}}
    pt = sample_point(space, random.Random(0))
    assert 1e-4 <= pt["train.lr"] <= 1e-2
    assert pt["train.num_minibatches"] in (2, 4)

    cfg = Config.default()
    cfg.sweep = {"metric": "score", "trials": 4, "rungs": [1, 2],
                 "keep": 0.5, "space": space}

    calls = []

    def fake_train(c):
        calls.append(c)
        # score favors low lr deterministically
        return {"score": -c.train.lr}

    results = run_sweep(cfg, train_fn=fake_train)
    assert len(results) == 4           # every trial is recorded
    promoted = [r for r in results if len(r["scores"]) == 2]
    assert len(promoted) == 2          # halved once
    # best (first) has the lowest lr overall (score = -lr, deterministic)
    lrs = [r["point"]["train.lr"] for r in results]
    assert results[0]["point"]["train.lr"] == min(lrs)
    assert len(calls) == 4 + 2         # rung0: 4 trials, rung1: 2 survivors
    # cost bookkeeping + Pareto flags present
    assert all(r["cost"] in (1, 3) for r in results)
    assert any(r["pareto"] for r in results)


def test_cli_train_eval_smoke(tmp_path):
    """End-to-end CLI on CPU: tiny train -> eval -> export."""
    import os

    envv = dict(os.environ)
    envv["PYTHONPATH"] = str(REPO)
    # subprocess does not source the shell profile, so the env var route to
    # the CPU backend works here (unlike interactive shells; see conftest)
    envv["JAX_PLATFORMS"] = "cpu"
    run = lambda *a: subprocess.run(
        [sys.executable, "-m", "drone_tpu.cli", *a],
        capture_output=True, text=True, cwd=REPO, env=envv,
    )
    common = [
        "run.total_updates=2", "run.log_interval=1",
        f"run.checkpoint_dir={tmp_path}", "run.run_name=clismoke",
        "train.num_envs=64", "train.horizon=8", "train.epochs=1",
        "train.num_minibatches=1", "run.hidden=(16,)", "run.mesh=false",
    ]
    r = run("train", *common)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "upd 2/2" in r.stdout
    r = run("eval", *common)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout[r.stdout.index("{"):])
    assert "ep_return_mean" in stats
    out = str(tmp_path / "p.drnw")
    r = run("export", *common, "--out", out)
    assert r.returncode == 0, r.stderr[-2000:]
    assert Path(out).exists() and Path(out + ".params").exists()


def test_train_profile_dir_writes_trace(tmp_path):
    """run.profile_dir captures an XProf trace of warmed-up updates."""
    cfg = Config.default().with_overrides([
        "train.num_envs=32", "train.horizon=4", "train.epochs=1",
        "train.num_minibatches=1", "run.mesh=false", "run.total_updates=6",
        "run.log_interval=10", "run.checkpoint_interval=100",
        "run.save_final=false",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.run.hidden = (8,)
    cfg.run.profile_dir = str(tmp_path / "prof")
    from drone_tpu.train import train

    train(cfg)
    trace_dir = tmp_path / "prof" / "trace"
    assert trace_dir.exists()
    assert any(trace_dir.rglob("*"))  # xplane/trace artifacts written


def test_train_aborts_on_nan_loss(tmp_path, monkeypatch):
    """Divergence detection: a NaN loss raises instead of silently burning
    the rest of the run."""
    import drone_tpu.train as train_mod

    cfg = Config.default().with_overrides([
        "train.num_envs=16", "train.horizon=4", "train.epochs=1",
        "train.num_minibatches=1", "run.mesh=false", "run.total_updates=3",
        "run.log_interval=1", "run.checkpoint_interval=100",
        "run.save_final=false",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.run.hidden = (8,)
    real_build = train_mod.build

    def poisoned_build(c):
        env, model, opt, runner, step, mesh = real_build(c)

        def bad_step(r):
            r2, m = step(r)
            m = dict(m)
            m["loss"] = jnp.float32(float("nan"))
            return r2, m

        return env, model, opt, runner, bad_step, mesh

    monkeypatch.setattr(train_mod, "build", poisoned_build)
    with pytest.raises(RuntimeError, match="diverged"):
        train_mod.train(cfg)


def test_racing_artifact_loop(tmp_path, demo_binary):
    """The scripts/racing_artifact.sh pipeline at test scale: train racing
    via the CLI -> export DRNW + params -> pure-C demo rolls a lap and
    dumps trajectory.csv -> viz.viewer renders the GIF with the gate
    circuit parsed from the params dump (the reference's demo-video
    artifact, [R] README.md:9-11)."""
    import os

    envv = dict(os.environ)
    envv["PYTHONPATH"] = str(REPO)
    envv["JAX_PLATFORMS"] = "cpu"
    run = lambda *a, **kw: subprocess.run(
        [sys.executable, "-m", "drone_tpu.cli", *a],
        capture_output=True, text=True, cwd=kw.get("cwd", REPO), env=envv,
    )
    common = [
        "env.task=racing", "env.integrator=rk4",
        "run.total_updates=2", "run.log_interval=1",
        f"run.checkpoint_dir={tmp_path}", "run.run_name=racelap",
        "train.num_envs=64", "train.horizon=8", "train.epochs=1",
        "train.num_minibatches=1", "run.hidden=(16,)", "run.mesh=false",
    ]
    r = run("train", *common)
    assert r.returncode == 0, r.stderr[-2000:]
    out = str(tmp_path / "racing.drnw")
    r = run("export", *common, "--out", out)
    assert r.returncode == 0, r.stderr[-2000:]

    # C demo: 1 episode, task 2 (racing), seed 0, integrator 1 (rk4);
    # writes trajectory.csv into cwd
    r = subprocess.run(
        [str(demo_binary), out, out + ".params", "1", "2", "0", "1"],
        capture_output=True, text=True, cwd=tmp_path, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    csv_path = tmp_path / "trajectory.csv"
    assert csv_path.exists()

    # keep the GIF quick: first 120 steps are enough to prove the render
    lines = csv_path.read_text().splitlines()
    (tmp_path / "short.csv").write_text("\n".join(lines[:121]) + "\n")

    from viz.viewer import load_csv, load_gates, render_gif

    gates = load_gates(out + ".params")
    assert len(gates) == 4  # the default 4-gate circuit rode the export
    gif = render_gif(load_csv(tmp_path / "short.csv"),
                     str(tmp_path / "lap.gif"), gates=gates, stride=8)
    assert Path(gif).stat().st_size > 1000


def test_cli_watch_renders_artifact(tmp_path):
    """`cli watch`: checkpoint -> python rollout -> rendered PNG + CSV (the
    reference's eval-with-render workflow, SURVEY.md §3.3, raylib window
    replaced by the file artifact)."""
    import os

    envv = dict(os.environ)
    envv["PYTHONPATH"] = str(REPO)
    envv["JAX_PLATFORMS"] = "cpu"
    run = lambda *a: subprocess.run(
        [sys.executable, "-m", "drone_tpu.cli", *a],
        capture_output=True, text=True, cwd=REPO, env=envv,
    )
    common = [
        "env.task=racing",  # exercises the gate-circuit overlay path too
        "run.total_updates=1", "run.log_interval=1",
        f"run.checkpoint_dir={tmp_path}", "run.run_name=watchme",
        "train.num_envs=64", "train.horizon=8", "train.epochs=1",
        "train.num_minibatches=1", "run.hidden=(16,)", "run.mesh=false",
    ]
    r = run("train", *common)
    assert r.returncode == 0, r.stderr[-2000:]
    out = str(tmp_path / "flight.png")
    r = run("watch", *common, "--out", out, "--steps", "40")
    assert r.returncode == 0, r.stderr[-2000:]
    assert Path(out).stat().st_size > 1000
    assert (tmp_path / "flight.csv").exists()


def test_dump_rollout_signals_episode_boundaries(tmp_path):
    """dump_rollout feeds policy_fn the previous step's done flag so
    recurrent policies can zero their carry at auto-reset boundaries (the
    `cli watch` LSTM path relies on this — without it the rendered rollout
    would carry hidden state across episodes, unlike every training and
    eval path)."""
    from drone_tpu.types import default_params
    from viz.viewer import dump_rollout, load_csv

    params = default_params("hover", horizon=jnp.float32(5))
    env = drone_tpu.DroneEnv(task="hover", params=params)
    dones_seen = []

    def policy(obs, done):
        dones_seen.append(int(done))
        return np.zeros(4, np.float32)  # motors off: fall/crash/truncate

    csv_path = tmp_path / "traj.csv"
    dump_rollout(env, params, policy, 12, str(csv_path), seed=0)
    rows = load_csv(csv_path)
    done_col = [int(r["done"]) for r in rows]
    assert sum(done_col) >= 1  # the 5-step horizon fired inside 12 steps
    # policy_fn sees done exactly one step after the env reported it
    assert dones_seen[0] == 0
    assert dones_seen[1:] == done_col[:-1]


def test_load_gates_rejects_unknown_params_version(tmp_path):
    """The versioned .params header is actually enforced: a version bump
    with an unchanged struct size must not be silently reinterpreted
    (native/demo.c applies the same gate)."""
    import ctypes as ct
    import struct

    from oracle.oracle import CParams
    from viz.viewer import load_gates

    blob = struct.pack("<III", 0x44524E50, 2, ct.sizeof(CParams))
    blob += bytes(ct.sizeof(CParams))
    p = tmp_path / "future.params"
    p.write_bytes(blob)
    with pytest.raises(ValueError, match="version"):
        load_gates(str(p))


def test_cli_watch_lstm_resets_carry(tmp_path):
    """`cli watch` with the recurrent policy: renders through the carry
    branch (including the episode-boundary zeroing) without error."""
    import os

    envv = dict(os.environ)
    envv["PYTHONPATH"] = str(REPO)
    envv["JAX_PLATFORMS"] = "cpu"
    run = lambda *a: subprocess.run(
        [sys.executable, "-m", "drone_tpu.cli", *a],
        capture_output=True, text=True, cwd=REPO, env=envv,
    )
    common = [
        "run.policy=lstm", "run.lstm_hidden=16", "run.hidden=(16,)",
        "run.total_updates=1", "run.log_interval=1",
        f"run.checkpoint_dir={tmp_path}", "run.run_name=watchrnn",
        "train.num_envs=64", "train.horizon=8", "train.epochs=1",
        "train.num_minibatches=1", "run.mesh=false",
        "env.params.horizon=6",  # several auto-resets inside --steps 20
    ]
    r = run("train", *common)
    assert r.returncode == 0, r.stderr[-2000:]
    out = str(tmp_path / "rnn.png")
    r = run("watch", *common, "--out", out, "--steps", "20")
    assert r.returncode == 0, r.stderr[-2000:]
    assert Path(out).stat().st_size > 1000
    # the short horizon really did terminate episodes mid-watch
    from viz.viewer import load_csv
    assert sum(int(row["done"]) for row in
               load_csv(tmp_path / "rnn.csv")) >= 2


def test_checkpointer_restore_only_creates_nothing(tmp_path):
    """A restore-only Checkpointer on a wrong path raises FileNotFoundError
    WITHOUT creating an empty checkpoint tree (a typo'd run name must not
    leave a fake run directory on disk)."""
    from drone_tpu.utils.checkpoint import Checkpointer

    missing = tmp_path / "no" / "such" / "run"
    ck = Checkpointer(missing)
    with pytest.raises(FileNotFoundError):
        ck.restore_raw()
    with pytest.raises(FileNotFoundError):
        ck.restore(None)
    assert not missing.exists()
    assert not (tmp_path / "no").exists()


def test_dronenet_rejects_malformed_files(tmp_path, demo_binary):
    """dronenet_load refuses files whose layer chain is inconsistent or
    whose dims are absurd — a corrupt .drnw must fail loading, not overrun
    the scratch buffer inside the forward loops."""
    import ctypes as ct
    import struct

    lib = ct.CDLL(str(REPO / "native" / "libdronenet.so"))
    net = ct.create_string_buffer(16 * 1024)

    def dense(i, o, act=1):
        return (struct.pack("<iii", i, o, act)
                + np.zeros(i * o + o, np.float32).tobytes())

    # chain mismatch: layer1 claims in=4096 after layer0's out=16
    bad_chain = struct.pack("<iii", 0x44524E57, 1, 2) + dense(13, 16) \
        + dense(4096, 4)
    p = tmp_path / "chain.drnw"
    p.write_bytes(bad_chain)
    assert lib.dronenet_load(net, str(p).encode()) != 0

    # absurd dims: negative / oversized
    bad_dims = struct.pack("<iii", 0x44524E57, 1, 1) + struct.pack(
        "<iii", -13, 1 << 20, 1)
    p2 = tmp_path / "dims.drnw"
    p2.write_bytes(bad_dims)
    assert lib.dronenet_load(net, str(p2).encode()) != 0

    # unknown activation id: activate_() would silently degrade it to
    # identity, so format drift must fail the LOAD (ADVICE r4)
    bad_act = struct.pack("<iii", 0x44524E57, 1, 2) + dense(13, 16) \
        + dense(16, 4, act=7)
    p4 = tmp_path / "act.drnw"
    p4.write_bytes(bad_act)
    assert lib.dronenet_load(net, str(p4).encode()) != 0

    # and a well-formed 2-layer file still loads
    ok = struct.pack("<iii", 0x44524E57, 1, 2) + dense(13, 16) + dense(16, 4)
    p3 = tmp_path / "ok.drnw"
    p3.write_bytes(ok)
    assert lib.dronenet_load(net, str(p3).encode()) == 0


def test_demo_rejects_bad_task_and_integrator(tmp_path, demo_binary):
    """The demo validates its task/integrator arguments instead of running
    an inconsistent hybrid environment (reset takes the racing branch but
    step's task checks never fire for ids >= 3)."""
    model = ActorCritic(hidden=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 13)))
    out = tmp_path / "p.drnw"
    export_flat_weights(params, out, hidden=(16,))
    r = subprocess.run([str(demo_binary), str(out), "-", "1", "3", "0", "0"],
                       capture_output=True, text=True, cwd=tmp_path)
    assert r.returncode == 2 and "task" in r.stderr
    r = subprocess.run([str(demo_binary), str(out), "-", "1", "0", "0", "7"],
                       capture_output=True, text=True, cwd=tmp_path)
    assert r.returncode == 2 and "integrator" in r.stderr
