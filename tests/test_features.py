"""Config-3 tier (BASELINE.json:9): waypoint task, RK4 integration,
domain-randomized mass/thrust, full obs/reward fusion — each feature
parity-tested against the oracle's matching mode (SURVEY.md §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone_tpu import DroneEnv
from drone_tpu.rollout import rollout_actions_packed
from drone_tpu.types import default_params
from oracle import Oracle
from tests.helpers import action_stream, bitwise_equal


def run_parity(env, o, seed, T=5000):
    actions = action_stream(T, seed=seed)
    fs, ist, keys = o.reset(seed, 0)
    golden = o.rollout(fs, ist, actions, keys)
    s = env.init(seed, 0)
    _, (out, packed) = jax.jit(
        lambda s, a, p: rollout_actions_packed(s, a, p, env.statics)
    )(s, jnp.asarray(actions), env.params)
    assert bitwise_equal(np.asarray(packed), golden["fstate"])
    assert bitwise_equal(np.asarray(out.obs), golden["obs"])
    assert bitwise_equal(np.asarray(out.reward), golden["reward"])
    assert np.array_equal(np.asarray(out.terminated), golden["terminated"].astype(bool))
    return golden


def test_rk4_parity():
    env = DroneEnv(task="hover", integrator="rk4")
    o = Oracle(env.params, task="hover", integrator="rk4")
    run_parity(env, o, seed=101)


def test_rk4_more_accurate_than_euler():
    """RK4 at dt must track RK4 at dt/8 (subsampled) better than Euler does —
    the integrator-quality sanity check."""
    from drone_tpu import dynamics, mixing

    p = default_params()
    pf = default_params(dt=np.float32(float(p.dt) / 8.0))
    env = DroneEnv()
    s = env.init(55, 0)
    th = mixing.mix(jnp.full(4, -0.15, jnp.float32), p, s.dr_thrust)
    m = p.mass * s.dr_mass

    def integrate(stepper, params, n):
        st = (s.pos, s.vel, s.quat, s.omega)
        for _ in range(n):
            st = stepper(*st, th, m, params)
        return np.asarray(st[0])

    ref = integrate(dynamics.rk4_step, pf, 80)        # fine reference
    rk4 = integrate(dynamics.rk4_step, p, 10)
    eul = integrate(dynamics.euler_step, p, 10)
    assert np.linalg.norm(rk4 - ref) < np.linalg.norm(eul - ref)


def test_waypoint_parity_with_respawns():
    """Waypoint task with a generous reach radius so the random-walk actually
    hits targets -> exercises mid-episode respawn draws on both sides."""
    params = default_params(
        "waypoint",
        reach_tol2=np.float32(9.0),   # 3 m radius: reaches happen often
        wp_box=np.float32(2.0),
    )
    env = DroneEnv(task="waypoint", params=params)
    o = Oracle(params, task="waypoint")
    golden = run_parity(env, o, seed=202, T=8000)
    # the trajectory must actually contain waypoint reaches to be meaningful:
    # reach bonus makes rewards > 1 possible only via the bonus
    assert (golden["reward"] > 5.0).sum() > 0, "no waypoint was ever reached"


def test_racing_parity_and_gate_cycling():
    params = default_params(
        "racing",
        reach_tol2=np.float32(16.0),  # 4 m radius: gates trigger constantly
    )
    env = DroneEnv(task="racing", params=params)
    o = Oracle(params, task="racing")
    golden = run_parity(env, o, seed=303, T=6000)
    assert (golden["reward"] > 5.0).sum() > 3, "gates were not reached"
    # targets in the golden trajectory must take more than one distinct value
    tgts = {tuple(row) for row in golden["fstate"][:, 13:16].tolist()}
    assert len(tgts) > 1


def test_domain_randomization_parity_and_spread():
    params = default_params(
        "hover",
        dr_mass_lo=np.float32(0.8),
        dr_mass_hi=np.float32(1.2),
        dr_thrust_lo=np.float32(0.9),
        dr_thrust_hi=np.float32(1.1),
    )
    env = DroneEnv(task="hover", params=params)
    o = Oracle(params, task="hover")
    run_parity(env, o, seed=404, T=5000)
    # DR spread across lanes
    sb = env.init_batch(4, 2048, params=params)
    drm = np.asarray(sb.dr_mass)
    drt = np.asarray(sb.dr_thrust)
    assert drm.min() >= 0.8 and drm.max() <= 1.2 and drm.std() > 0.05
    assert drt.min() >= 0.9 and drt.max() <= 1.1 and drt.std() > 0.02


def test_rk4_waypoint_dr_combined_parity():
    """All config-3 features at once."""
    params = default_params(
        "waypoint",
        reach_tol2=np.float32(9.0),
        dr_mass_lo=np.float32(0.85),
        dr_mass_hi=np.float32(1.15),
        dr_thrust_lo=np.float32(0.9),
        dr_thrust_hi=np.float32(1.1),
    )
    env = DroneEnv(task="waypoint", integrator="rk4", params=params)
    o = Oracle(params, task="waypoint", integrator="rk4")
    run_parity(env, o, seed=505, T=6000)


@pytest.mark.parametrize("task", ["hover", "waypoint", "racing"])
def test_observation_is_target_relative(task):
    env = DroneEnv(task=task)
    s = env.init(6, 0)
    obs = np.asarray(env.observe(s))
    assert np.allclose(obs[0:3], np.asarray(s.target) - np.asarray(s.pos))
    assert np.allclose(obs[3:7], np.asarray(s.quat))
