"""Property-based invariants (hypothesis) over the env core.

The parity tests pin exact values against the C oracle; these pin the
PHYSICAL invariants for arbitrary (adversarial) states and actions — the
class of checks the reference never had (SURVEY.md §4.1: env correctness
was validated empirically there)."""

import numpy as np
import jax
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

import drone_tpu
from drone_tpu import env as env_mod, mixing, prng

ENV = drone_tpu.DroneEnv()
STEP = jax.jit(lambda s, a, p: env_mod.step(s, a, p, ENV.statics))

finite_f = st.floats(-10.0, 10.0, width=32)
action_f = st.floats(-5.0, 5.0, width=32)


def _state_from(seed, pos, vel, omega):
    s = ENV.init(seed, 0)
    return s.replace(
        pos=jnp.asarray(pos, jnp.float32),
        vel=jnp.asarray(vel, jnp.float32),
        omega=jnp.asarray(omega, jnp.float32),
    )


@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    action=st.tuples(action_f, action_f, action_f, action_f),
    pos=st.tuples(finite_f, finite_f, st.floats(0.0078125, 5.0, width=32)),
    vel=st.tuples(finite_f, finite_f, finite_f),
    omega=st.tuples(finite_f, finite_f, finite_f),
)
def test_step_invariants(seed, action, pos, vel, omega):
    s = _state_from(seed, pos, vel, omega)
    s2, out = STEP(s, jnp.asarray(action, jnp.float32), ENV.params)
    # quaternion stays unit-norm (both continued and auto-reset branches)
    n = float(jnp.sum(s2.quat * s2.quat))
    assert abs(n - 1.0) < 1e-5
    # everything stays finite
    for leaf in jax.tree_util.tree_leaves(s2):
        assert np.isfinite(np.asarray(leaf, np.float64)).all()
    assert np.isfinite(float(out.reward))
    # step counter: 0 after done (auto-reset), prev+1 otherwise
    done = bool(out.terminated | out.truncated)
    assert int(s2.step) == (0 if done else int(s.step) + 1)
    # a crash is reported at most once per step and obs matches next state
    np.testing.assert_array_equal(
        np.asarray(out.obs), np.asarray(ENV.observe(s2)))


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), lane=st.integers(0, 2**20),
       episode=st.integers(0, 2**20))
def test_reset_state_within_spawn_bounds(seed, lane, episode):
    k0, k1 = prng.lane_key(jnp.uint32(seed), jnp.uint32(lane))
    s = env_mod.reset_state(k0, k1, jnp.uint32(episode), ENV.params,
                            ENV.statics)
    p = ENV.params
    tgt = np.asarray(p.target)
    assert np.all(np.abs(np.asarray(s.pos) - tgt) <= float(p.pos_radius) + 1e-6)
    assert np.all(np.abs(np.asarray(s.vel)) <= float(p.vel_max_init) + 1e-6)
    assert np.all(np.abs(np.asarray(s.omega)) <= float(p.omega_max_init) + 1e-6)
    assert abs(float(jnp.sum(s.quat * s.quat)) - 1.0) < 1e-5
    assert float(s.quat[0]) > 0  # small-angle convention: positive w
    assert int(s.step) == 0 and float(s.ep_return) == 0.0


@settings(max_examples=100, deadline=None)
@given(action=st.tuples(
    st.floats(-1e6, 1e6, width=32),
    st.floats(-1e6, 1e6, width=32),
    st.floats(-1e6, 1e6, width=32),
    st.floats(-1e6, 1e6, width=32)))
def test_mix_clamps_thrust(action):
    t = np.asarray(mixing.mix(jnp.asarray(action, jnp.float32), ENV.params,
                              jnp.float32(1.0)))
    assert np.all(t >= 0.0)
    assert np.all(t <= float(ENV.params.thrust_max) + 1e-5)


@settings(max_examples=100, deadline=None)
@given(bits=st.integers(0, 2**32 - 1))
def test_bits_to_uniform_range(bits):
    u = float(prng.bits_to_uniform(jnp.uint32(bits)))
    assert 0.0 <= u < 1.0


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_determinism_same_seed_same_trajectory(seed):
    """Same seed => identical trajectory (doubles as the race detector,
    SURVEY.md §5: the JAX path is pure, so nondeterminism would mean a
    framework-level bug)."""
    acts = jnp.zeros((20, 4), jnp.float32)

    def run():
        s = ENV.init(seed, 0)
        outs = []
        for t in range(20):
            s, out = STEP(s, acts[t], ENV.params)
            outs.append(float(out.reward))
        return outs

    assert run() == run()
