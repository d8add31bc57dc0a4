"""Config-5 tier (BASELINE.json:11): distributed — gradient-psum equivalence
and the sharded actor-learner on an 8-device virtual CPU mesh (the
conftest sets --xla_force_host_platform_device_count=8; this replaces the
reference's nonexistent multi-node test rig, SURVEY.md §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map
import pytest

import drone_tpu
from drone_tpu import ppo as ppo_mod
from drone_tpu.models import ActorCritic
from drone_tpu.parallel import make_mesh, make_sharded_train_step
from drone_tpu.parallel.mesh import place_runner


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_gradient_pmean_equivalence():
    """grad of mean-loss over a global batch == pmean of per-shard grads —
    the N-host == 1-host gradient check (BASELINE.json:11), up to reduction
    order (allclose, not bitwise)."""
    mesh = make_mesh()
    model = ActorCritic(hidden=(32, 32))
    obs = jax.random.normal(jax.random.PRNGKey(0), (64, 13), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(1), (64, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(2), obs[:1])

    def loss(params, obs, tgt):
        mean, _, _ = model.apply(params, obs)
        return jnp.mean((mean - tgt) ** 2)

    g_global = jax.grad(loss)(params, obs, tgt)

    def sharded_grad(params, obs, tgt):
        g = jax.grad(loss)(params, obs, tgt)
        return jax.lax.pmean(g, "data")

    g_sharded = jax.jit(
        shard_map(
            sharded_grad,
            mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(), params), P("data"), P("data")),
            out_specs=jax.tree_util.tree_map(lambda _: P(), params),
            check_vma=False,
        )
    )(params, obs, tgt)

    for a, b in zip(jax.tree_util.tree_leaves(g_global),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


@pytest.fixture(scope="module")
def sharded_run():
    env = drone_tpu.DroneEnv()
    cfg = ppo_mod.PPOConfig(horizon=16, num_envs=256, epochs=2, num_minibatches=2)
    model = ActorCritic(hidden=(32, 32))
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)
    mesh = make_mesh()
    runner = place_runner(mesh, runner)
    step = make_sharded_train_step(model.apply, opt, env.params, env.statics,
                                   cfg, mesh, example_runner=runner)
    ms = []
    for _ in range(5):
        runner, m = step(runner)
        ms.append({k: float(v) for k, v in m.items()})
    return mesh, runner, ms


def test_sharded_train_step_runs(sharded_run):
    _, runner, ms = sharded_run
    assert all(np.isfinite(m["loss"]) for m in ms)


def test_params_stay_replicated(sharded_run):
    """After updates, every device must hold identical parameters (the DDP
    invariant, enforced here by pmean'd grads)."""
    _, runner, _ = sharded_run
    leaf = jax.tree_util.tree_leaves(runner.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_env_state_is_sharded(sharded_run):
    mesh, runner, _ = sharded_run
    sh = runner.env_state.pos.sharding
    assert sh.spec == P("data")
    # 8 distinct shards, each 256/8=32 lanes
    assert len(runner.env_state.pos.addressable_shards) == 8
    assert runner.env_state.pos.addressable_shards[0].data.shape[0] == 32


def test_sharded_lanes_match_unsharded_reset():
    """Sharding must not change WHICH drones exist: lane l on the mesh is
    bitwise lane l of the single-device batch (env stream is lane-keyed)."""
    env = drone_tpu.DroneEnv()
    sb = env.init_batch(9, 64)
    mesh = make_mesh()
    from tests.helpers import pack_fstate_batch

    placed = jax.device_put(
        sb, jax.tree_util.tree_map(
            lambda _: jax.NamedSharding(mesh, P("data")), sb,
            is_leaf=lambda x: False))
    np.testing.assert_array_equal(pack_fstate_batch(placed), pack_fstate_batch(sb))


def test_dryrun_multichip_contract():
    """The driver's dryrun path must work as shipped."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (1024, 4)


def test_scaling_harness_mechanics():
    """Weak-scaling harness runs over 1/2/4/8 virtual devices and reports
    monotone env counts + an efficiency for each (values are meaningless on
    CPU; on a pod the same harness measures real ICI scaling)."""
    from drone_tpu.models import ActorCritic
    from drone_tpu.parallel.scaling import run_scaling

    env = drone_tpu.DroneEnv()
    cfg = ppo_mod.PPOConfig(horizon=8, epochs=1, num_minibatches=1)
    recs = run_scaling(env, ActorCritic(hidden=(16, 16)), cfg,
                       envs_per_device=64, iters=1, device_counts=[1, 2, 8])
    assert [r["devices"] for r in recs] == [1, 2, 8]
    assert [r["num_envs"] for r in recs] == [64, 128, 512]
    assert all(r["steps_per_s"] > 0 and r["efficiency"] > 0 for r in recs)
    assert recs[0]["efficiency"] == 1.0


def test_sharded_megakernel_trainer():
    """DP megakernel trainer over the 8-device virtual mesh (interpret):
    runs, stays finite, and params remain bitwise-replicated across
    devices after pmean'd fused-adam updates."""
    from drone_tpu import ppo_pallas
    from drone_tpu.parallel.mesh import place_runner

    env = drone_tpu.DroneEnv()
    model = ActorCritic(hidden=(16, 16))
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=8 * 256, epochs=2,
                            num_minibatches=2)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_mod.init_runner(model, env, cfg, seed=0)
    runner = runner.replace(
        opt_state=ppo_pallas.init_fused_opt_state(runner.params))
    mesh = make_mesh()
    runner = place_runner(mesh, runner)
    step = make_sharded_train_step(
        model.apply, opt, env.params, env.statics, cfg, mesh,
        example_runner=runner, trainer="pallas", interpret=True)
    for _ in range(2):
        runner, m = step(runner)
    assert np.isfinite(float(m["loss"]))
    assert float(m["episodes"]) > 0
    # params replicated: every device shard holds identical bytes
    for leaf in jax.tree_util.tree_leaves(runner.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for sh in shards[1:]:
            np.testing.assert_array_equal(shards[0], sh)
    # fused adam counted every sgd step
    assert float(runner.opt_state[0]) == 2 * 2 * 2


def test_sharded_recurrent_megakernel_trainer():
    """DP fully-fused recurrent megakernel trainer (LSTM rollout kernel +
    BPTT update kernel + fused adam) over the 8-device virtual mesh
    (interpret): runs, stays finite, params stay replicated — all three
    policy families shard at kernel speed."""
    from drone_tpu import ppo_rnn, ppo_rnn_pallas
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.parallel.mesh import place_runner

    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=16, encoder=(16,))
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=8 * 256, epochs=1,
                            num_minibatches=2, bptt_horizon=4)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    runner = runner.replace(
        opt_state=ppo_rnn_pallas.init_fused_opt_state(runner.params))
    mesh = make_mesh()
    runner = place_runner(mesh, runner)
    step = make_sharded_train_step(
        model.apply, opt, env.params, env.statics, cfg, mesh,
        example_runner=runner, recurrent=True, trainer="pallas",
        interpret=True)
    for _ in range(2):
        runner, m = step(runner)
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree_util.tree_leaves(runner.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for sh in shards[1:]:
            np.testing.assert_array_equal(shards[0], sh)
    # fused adam counted every sgd step (1 epoch x 2 minibatches x 2 updates)
    assert float(runner.opt_state[0]) == 1 * 2 * 2


def test_sharded_recurrent_rollout_kernel_trainer():
    """DP hybrid recurrent tier (trainer='pallas_rollout': LSTM rollout
    kernel + XLA segmented_forward update) — the fallback when the batch
    shape or bptt is outside the update kernel's envelope."""
    from drone_tpu import ppo_rnn
    from drone_tpu.models import LSTMActorCritic
    from drone_tpu.parallel.mesh import place_runner

    env = drone_tpu.DroneEnv()
    model = LSTMActorCritic(hidden=16, encoder=(16,))
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=8 * 128, epochs=1,
                            num_minibatches=2, bptt_horizon=4)
    opt = ppo_mod.make_optimizer(cfg)
    runner = ppo_rnn.init_recurrent_runner(model, env, cfg, seed=0)
    mesh = make_mesh()
    runner = place_runner(mesh, runner)
    step = make_sharded_train_step(
        model.apply, opt, env.params, env.statics, cfg, mesh,
        example_runner=runner, recurrent=True, trainer="pallas_rollout",
        interpret=True)
    for _ in range(2):
        runner, m = step(runner)
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree_util.tree_leaves(runner.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for sh in shards[1:]:
            np.testing.assert_array_equal(shards[0], sh)


def test_train_build_sharded_pallas(tmp_path):
    """run.rollout=pallas + mesh routes through the sharded megakernel
    trainer end to end."""
    from drone_tpu.train import train
    from drone_tpu.utils.config import Config

    cfg = Config.default().with_overrides([
        "train.num_envs=2048", "train.horizon=8", "train.epochs=1",
        "train.num_minibatches=2", "run.mesh=true", "run.total_updates=2",
        "run.log_interval=1", "run.checkpoint_interval=100",
        "run.rollout=pallas", "run.save_final=false",
    ])
    cfg.run.checkpoint_dir = str(tmp_path)
    cfg.run.hidden = (16, 16)
    runner, last = train(cfg)
    assert np.isfinite(last["loss"])
    assert isinstance(runner.opt_state, tuple) and len(runner.opt_state) == 3


def test_sharded_trainer_name_is_validated():
    """A typo'd trainer string must raise, not silently fall through to the
    scan trainer (misattributed throughput)."""
    import pytest

    import drone_tpu
    from drone_tpu import ppo as ppo_mod
    from drone_tpu.models import ActorCritic
    from drone_tpu.parallel import make_mesh, make_sharded_train_step

    env = drone_tpu.DroneEnv()
    cfg = ppo_mod.PPOConfig(horizon=4, num_envs=16, epochs=1,
                            num_minibatches=1)
    model = ActorCritic(hidden=(8,))
    opt = ppo_mod.make_optimizer(cfg)
    mesh = make_mesh(jax.devices()[:1])
    with pytest.raises(ValueError, match="trainer must be"):
        make_sharded_train_step(model.apply, opt, env.params, env.statics,
                                cfg, mesh, trainer="Pallas")
    with pytest.raises(ValueError, match="recurrent hybrid"):
        make_sharded_train_step(model.apply, opt, env.params, env.statics,
                                cfg, mesh, trainer="pallas_rollout",
                                recurrent=False)
