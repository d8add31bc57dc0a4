"""Config-1 parity tier (BASELINE.json:7): single drone, hover, Euler, CPU.

Bitwise float32 equality of states, observations, rewards, terminations and
episode returns between the JAX step and the C oracle, per step, over long
horizons and across seeds — the correctness gate of BASELINE.json:5.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone_tpu import DroneEnv
from drone_tpu import env as env_mod
from oracle import Oracle
from tests.helpers import action_stream, bitwise_equal, pack_fstate


@pytest.fixture(scope="module")
def setup():
    env = DroneEnv(task="hover", integrator="euler")
    o = Oracle(env.params, task="hover", integrator="euler")
    return env, o


def test_reset_bitwise(setup):
    env, o = setup
    for seed in (0, 42, 123456789):
        for lane in (0, 3, 1000):
            fs, _, _ = o.reset(seed, lane)
            s = env.init(seed, lane)
            assert bitwise_equal(pack_fstate(s), fs), (seed, lane)


def test_reset_across_episodes(setup):
    env, o = setup
    k0, k1 = o.lane_key(42, 0)
    for episode in (0, 1, 77, 2**31):
        fs = np.zeros(19, np.float32)
        ist = np.zeros(4, np.int32)
        o.lib.drone_reset(fs, ist, __import__("ctypes").byref(o.cparams),
                          k0, k1, episode, o.task)
        s = env_mod.reset_state(
            jnp.uint32(k0), jnp.uint32(k1), jnp.uint32(episode),
            env.params, env.statics,
        )
        assert bitwise_equal(pack_fstate(s), fs), episode


def first_mismatch(a, b):
    """Index of the first row where float32 arrays differ bitwise, else -1."""
    a = np.asarray(a, np.float32).reshape(len(a), -1).view(np.uint32)
    b = np.asarray(b, np.float32).reshape(len(b), -1).view(np.uint32)
    rows = (a != b).any(axis=1)
    return int(np.argmax(rows)) if rows.any() else -1


@pytest.mark.parametrize("seed", [0, 42, 7777])
def test_trajectory_bitwise_10k(setup, seed):
    """10k steps with pseudo-random actions: every state field, obs, reward,
    termination flag and episode return must match bit-for-bit. The JAX side
    runs under lax.scan (the production rollout path)."""
    from drone_tpu.rollout import rollout_actions_packed

    env, o = setup
    T = 10_000
    actions = action_stream(T, seed=seed)

    fs, ist, keys = o.reset(seed, 0)
    golden = o.rollout(fs, ist, actions, keys)

    s = env.init(seed, 0)
    # params must be a traced argument (not a closed-over constant): XLA
    # strength-reduces division by a compile-time constant into multiply by
    # reciprocal, which breaks bitwise parity.
    _, (out, packed) = jax.jit(
        lambda s, a, p: rollout_actions_packed(s, a, p, env.statics)
    )(s, jnp.asarray(actions), env.params)

    assert first_mismatch(packed, golden["fstate"]) == -1, (
        f"state diverged at t={first_mismatch(packed, golden['fstate'])}"
    )
    assert first_mismatch(out.obs, golden["obs"]) == -1
    assert np.array_equal(
        np.asarray(out.reward, np.float32).view(np.uint32),
        golden["reward"].view(np.uint32),
    ), f"reward diverged at t={first_mismatch(out.reward[:, None], golden['reward'][:, None])}"
    assert np.array_equal(np.asarray(out.terminated), golden["terminated"].astype(bool))
    assert np.array_equal(np.asarray(out.truncated), golden["truncated"].astype(bool))
    assert np.array_equal(
        np.asarray(out.ep_return, np.float32).view(np.uint32),
        golden["ep_return"].view(np.uint32),
    )
    assert np.array_equal(np.asarray(out.ep_length), golden["ep_length"])

    # the trajectory must actually contain episode boundaries to be a
    # meaningful auto-reset parity test
    assert golden["terminated"].sum() + golden["truncated"].sum() > 0


def test_hover_episode_stats_only_at_done(setup):
    env, o = setup
    T = 2000
    actions = action_stream(T, seed=3)
    fs, ist, keys = o.reset(3, 0)
    golden = o.rollout(fs, ist, actions, keys)
    done = (golden["terminated"] | golden["truncated"]).astype(bool)
    assert (golden["ep_return"][~done] == 0).all()
    assert (golden["ep_length"][~done] == 0).all()
    assert (golden["ep_length"][done] > 0).all()
