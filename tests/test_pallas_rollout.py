"""Pallas rollout megakernel tests (drone_tpu/ops/pallas_rollout.py).

Logic equivalence is proven bitwise on the CPU backend via interpret mode
(the kernel body executed as plain XLA ops == the vmap/scan path). On TPU
the compiled kernel differs from the XLA path by 1-4 ulp in the quaternion
normalize only (Mosaic strength-reduces x/sqrt(y); measured and documented
in the kernel source) — TPU-only checks live in the benchmark, not here
(the test env is CPU, tests/conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import drone_tpu
from drone_tpu import env as env_mod
from drone_tpu.ops import rollout_hover_pallas, rollout_pallas
from tests.helpers import pack_fstate_batch

N, T, HORIZON = 512, 200, 60


def _scan_ref(env, state, acts, p):
    # p must be a traced argument (not a closure): closed-over params become
    # XLA constants and division strength-reduces to multiply-by-reciprocal,
    # breaking bitwise comparisons (see .claude/skills/verify/SKILL.md)
    def run(s, a, pp):
        def body(ss, at):
            s2, out = jax.vmap(
                lambda x, y: env_mod.step(x, y, pp, env.statics)
            )(ss, at)
            return s2, (out.reward, out.terminated | out.truncated,
                        out.ep_return, out.ep_length)
        return jax.lax.scan(body, s, a)

    return jax.jit(run)(state, acts, p)


@pytest.mark.parametrize("task", ["hover", "waypoint", "racing"])
@pytest.mark.parametrize("integrator", ["euler", "rk4"])
def test_megakernel_bitwise_equals_scan_path(task, integrator):
    """Interpret-mode kernel == vmap/scan env over a horizon with hundreds
    of auto-resets (truncation and crash), bitwise on every f32/int field,
    for every task x integrator combination."""
    env = drone_tpu.DroneEnv(task=task, integrator=integrator)
    p = env.params.replace(horizon=jnp.int32(HORIZON))
    if task in ("waypoint", "racing"):
        # huge reach radius so target/gate progression fires constantly
        p = p.replace(reach_tol2=jnp.float32(4.0))
    state = env.init_batch(5, N)
    acts = jax.random.uniform(jax.random.PRNGKey(1), (T, N, 4), jnp.float32,
                              -0.2, 0.4)
    ref_final, (r, d, ep_ret, ep_len) = _scan_ref(env, state, acts, p)
    pal_final, stats = rollout_pallas(
        state, p, env.statics, T, actions=acts, lanes_per_block=N,
        interpret=True
    )
    a = np.asarray(pack_fstate_batch(ref_final)).view(np.uint32)
    b = np.asarray(pack_fstate_batch(pal_final)).view(np.uint32)
    assert np.array_equal(a, b), "f32 state planes diverged"
    for field in ("step", "reset_count", "wp_count", "gate_idx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref_final, field)),
            np.asarray(getattr(pal_final, field)), err_msg=field)
    if task in ("waypoint", "racing"):
        assert int(jnp.sum(pal_final.wp_count)) > 0, "no reach events fired"
    # stats: same episodes, same reward mass
    n_ep = int(jnp.sum(d))
    assert n_ep > 100, "test should exercise many auto-resets"
    assert int(stats["episodes"]) == n_ep
    np.testing.assert_allclose(float(stats["reward_sum"]), float(jnp.sum(r)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(stats["ep_return_sum"]),
                               float(jnp.sum(ep_ret)), rtol=1e-5)
    np.testing.assert_allclose(float(stats["ep_length_sum"]),
                               float(jnp.sum(ep_len)), rtol=1e-6)
    np.testing.assert_allclose(
        float(stats["ep_return_sq_sum"]),
        float(jnp.sum(ep_ret.astype(jnp.float32) ** 2)), rtol=1e-4)


def test_megakernel_time_chunked_actions():
    """A provided action stream longer than the VMEM budget is streamed as
    host-side time chunks; the result must stay bitwise-equal to the scan
    path (the kernel is sequential in time, so chunk boundaries are
    invisible)."""
    env = drone_tpu.DroneEnv()
    n, t = 1024, 300  # lanes_per_block=1024 -> chunk=256 -> 2 kernel launches
    p = env.params.replace(horizon=jnp.int32(60))
    state = env.init_batch(9, n)
    acts = jax.random.uniform(jax.random.PRNGKey(3), (t, n, 4), jnp.float32,
                              -0.2, 0.4)
    ref_final, (r, d, _, _) = _scan_ref(env, state, acts, p)
    pal_final, stats = rollout_pallas(state, p, env.statics, t, actions=acts,
                                      lanes_per_block=1024, interpret=True)
    assert np.array_equal(
        np.asarray(pack_fstate_batch(ref_final)).view(np.uint32),
        np.asarray(pack_fstate_batch(pal_final)).view(np.uint32))
    assert int(stats["episodes"]) == int(jnp.sum(d))
    np.testing.assert_allclose(float(stats["reward_sum"]), float(jnp.sum(r)),
                               rtol=1e-5)


def test_megakernel_multiblock_grid():
    """Grid with >1 block must tile lanes without mixing them up."""
    env = drone_tpu.DroneEnv()
    p = env.params.replace(horizon=jnp.int32(40))
    state = env.init_batch(7, 512)
    acts = jnp.zeros((50, 512, 4), jnp.float32)
    one, _ = rollout_hover_pallas(state, p, 50, actions=acts,
                                  lanes_per_block=512, interpret=True)
    two, _ = rollout_hover_pallas(env.init_batch(7, 512), p, 50, actions=acts,
                                  lanes_per_block=256, interpret=True)
    np.testing.assert_array_equal(pack_fstate_batch(one), pack_fstate_batch(two))


def test_megakernel_rng_action_mode():
    """Self-contained mode: in-kernel threefry action stream; lanes must stay
    independent and episodes must terminate."""
    env = drone_tpu.DroneEnv()
    p = env.params.replace(horizon=jnp.int32(50))
    state = env.init_batch(3, 256)
    final, stats = rollout_hover_pallas(state, p, 120, lanes_per_block=256,
                                        interpret=True)
    assert int(stats["episodes"]) >= 256  # every lane ended at least once
    assert np.isfinite(float(stats["reward_sum"]))
    fs = np.asarray(pack_fstate_batch(final))
    assert np.isfinite(fs).all()
    # lanes independent: distinct positions
    assert len(np.unique(fs[:, 0])) > 200


def test_sharded_megakernel_over_mesh():
    """shard_map'd megakernel on the 8-device virtual mesh: bitwise-equal to
    the single-device run, with globally psum'd stats (the pod-scale form of
    the BASELINE env-throughput metric)."""
    from drone_tpu.ops import sharded_rollout_pallas
    from drone_tpu.parallel import make_mesh

    env = drone_tpu.DroneEnv()
    n = 8 * 256
    p = env.params.replace(horizon=jnp.int32(60))
    mesh = make_mesh()
    final, stats = sharded_rollout_pallas(
        mesh, env.init_batch(3, n), p, env.statics, 50,
        lanes_per_block=256, interpret=True)
    ref, ref_stats = rollout_pallas(
        env.init_batch(3, n), p, env.statics, 50,
        lanes_per_block=256, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(pack_fstate_batch(final)).view(np.uint32),
        np.asarray(pack_fstate_batch(ref)).view(np.uint32))
    assert float(stats["episodes"]) == float(ref_stats["episodes"]) > 0
    # state stays sharded over the mesh (no implicit gather)
    from jax.sharding import PartitionSpec as P

    assert final.pos.sharding.spec == P("data")
