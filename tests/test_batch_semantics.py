"""Config-2 tier (BASELINE.json:8): batched hover — 4096 vmapped drones with
auto-reset + randomized initial states, lax.scan rollout.

Checks: vmap(step) ≡ loop-of-step (bitwise), batched JAX ≡ batched C oracle,
RNG independence across lanes, auto-reset fidelity under scan.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone_tpu import DroneEnv
from drone_tpu import env as env_mod
from drone_tpu.rollout import rollout_actions
from oracle import Oracle
from tests.helpers import action_stream, bitwise_equal, pack_fstate, pack_fstate_batch


@pytest.fixture(scope="module")
def setup():
    env = DroneEnv(task="hover", integrator="euler")
    o = Oracle(env.params, task="hover", integrator="euler")
    return env, o


def test_vmap_equals_loop(setup):
    """vmap over lanes must produce bitwise the same result as stepping each
    lane independently (the fundamental vectorization-correctness invariant,
    replacing the reference's Serial-vs-Multiprocessing equivalence test,
    SURVEY.md §4.1)."""
    env, _ = setup
    N, T = 16, 25
    actions = action_stream(T, n=N, seed=11)

    sb = env.init_batch(5, N)
    step_b = jax.jit(lambda s, a, p: env_mod_step_batch(s, a, p, env.statics))
    outs_b = []
    for t in range(T):
        sb, out = step_b(sb, jnp.asarray(actions[t]), env.params)
        outs_b.append(out)

    step_1 = jax.jit(lambda s, a, p: env_mod.step(s, a, p, env.statics))
    for lane in range(N):
        s = env.init(5, lane)
        for t in range(T):
            s, out = step_1(s, jnp.asarray(actions[t, lane]), env.params)
            assert bitwise_equal(
                np.asarray(outs_b[t].obs)[lane], np.asarray(out.obs)
            ), (lane, t)
            assert np.float32(outs_b[t].reward[lane]).view(np.uint32) == np.float32(
                out.reward
            ).view(np.uint32)


def env_mod_step_batch(state, actions, p, statics):
    return jax.vmap(lambda s, a: env_mod.step(s, a, p, statics))(state, actions)


def test_batched_oracle_parity_4096(setup):
    """4096 lanes, a few steps: batched JAX (vmap) vs batched C oracle."""
    env, o = setup
    N, T = 4096, 5
    actions = action_stream(T, n=N, seed=12)

    fs, ist, keys = o.reset_batch(7, N)
    sb = env.init_batch(7, N)
    assert bitwise_equal(pack_fstate_batch(sb), fs)

    step_b = jax.jit(lambda s, a, p: env_mod_step_batch(s, a, p, env.statics))
    for t in range(T):
        obs_c, rew_c, term_c, trunc_c, _, _ = o.step_batch(fs, ist, actions[t], keys)
        sb, out = step_b(sb, jnp.asarray(actions[t]), env.params)
        assert bitwise_equal(pack_fstate_batch(sb), fs), f"t={t}"
        assert bitwise_equal(np.asarray(out.obs), obs_c)
        assert bitwise_equal(np.asarray(out.reward), rew_c)
        assert np.array_equal(np.asarray(out.terminated), term_c)


def test_scan_rollout_matches_python_loop(setup):
    env, _ = setup
    T = 50
    actions = action_stream(T, seed=13)
    s0 = env.init(13, 0)

    _, out_scan = jax.jit(
        lambda s, a, p: rollout_actions(s, a, p, env.statics)
    )(s0, jnp.asarray(actions), env.params)

    s = s0
    step_1 = jax.jit(lambda s, a, p: env_mod.step(s, a, p, env.statics))
    for t in range(T):
        s, out = step_1(s, jnp.asarray(actions[t]), env.params)
        assert bitwise_equal(np.asarray(out_scan.obs)[t], np.asarray(out.obs)), t
    assert bitwise_equal(pack_fstate(s), pack_fstate(s))


def test_lane_rng_independence(setup):
    """Different lanes must get different randomized initial states, and the
    same lane must be reproducible."""
    env, _ = setup
    sb = env.init_batch(0, 256)
    pos = np.asarray(sb.pos)
    # all pairwise distinct starting positions (256 draws from a continuous
    # box collide with probability ~0)
    assert len({tuple(p) for p in pos.tolist()}) == 256
    sb2 = env.init_batch(0, 256)
    assert bitwise_equal(pack_fstate_batch(sb), pack_fstate_batch(sb2))
    sb3 = env.init_batch(1, 256)
    assert not bitwise_equal(pack_fstate_batch(sb), pack_fstate_batch(sb3))


def test_autoreset_under_scan(setup):
    """Freefall (action=-1 => zero thrust) crashes within a bounded number of
    steps; afterwards the episode counter advances and state re-randomizes."""
    env, _ = setup
    T = 200
    s0 = env.init(21, 0)
    actions = jnp.full((T, 4), -1.0, jnp.float32)
    _, out = jax.jit(
        lambda s, a, p: rollout_actions(s, a, p, env.statics)
    )(s0, jnp.asarray(actions), env.params)
    term = np.asarray(out.terminated)
    assert term.sum() >= 2, "freefall must crash repeatedly within 200 steps"
    # episode stats populated exactly at dones
    eplen = np.asarray(out.ep_length)
    assert (eplen[term] > 0).all()
    # between two crashes the step counter restarts: second episode length
    # equals gap between done flags
    idx = np.flatnonzero(term)
    gaps = np.diff(idx)
    assert np.array_equal(eplen[idx[1:]], gaps)


def test_randomized_inits_within_bounds(setup):
    env, _ = setup
    p = env.params
    sb = env.init_batch(3, 4096)
    pos = np.asarray(sb.pos)
    tgt = np.asarray(p.target)
    assert (np.abs(pos - tgt) <= float(p.pos_radius) + 1e-6).all()
    assert (np.abs(np.asarray(sb.vel)) <= float(p.vel_max_init) + 1e-6).all()
    assert (np.abs(np.asarray(sb.omega)) <= float(p.omega_max_init) + 1e-6).all()
    qn = np.linalg.norm(np.asarray(sb.quat), axis=1)
    assert np.allclose(qn, 1.0, atol=1e-6)


def test_oracle_batch_refuses_noncontiguous_state():
    """The in-place C batch calls flatten their state arrays; a strided view
    would reshape into a COPY and the C updates would be silently lost —
    the oracle refuses instead of corrupting the trajectory."""
    import pytest
    from oracle.oracle import Oracle
    from drone_tpu.types import default_params

    o = Oracle(default_params("hover"), task="hover")
    fs, ist, keys = o.reset_batch(3, 8)
    acts = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="contiguous"):
        o.step_batch(fs[::2], ist[::2], acts, keys[: 2 * 4])
    # the contiguous path still works
    o.step_batch(fs[:4].copy(), ist[:4].copy(), acts, keys[: 2 * 4].copy())
