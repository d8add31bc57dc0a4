"""Vectorization facade + gymnasium emulation layer tests.

Mirrors the reference's framework test strategy (SURVEY.md §4.1: vector
backend equivalence — Serial vs Multiprocessing produce identical batches —
and emulation round-trips). Here: "jit" vs "serial" backends must produce
bitwise identical batches, and the gymnasium adapter must honor the
gymnasium step/reset contract while staying trajectory-consistent with the
internal auto-resetting step.
"""

import numpy as np
import pytest

import drone_tpu
from drone_tpu import vector
from drone_tpu.vector import VecDrone
from drone_tpu.emulation import DroneGymnasium
from tests.helpers import action_stream


def test_make_and_spaces():
    v = vector.make("hover", num_envs=4)
    assert v.num_envs == 4
    assert v.single_observation_space.shape == (13,)
    assert v.single_action_space.shape == (4,)
    assert np.all(v.single_action_space.low == -1.0)
    obs, _ = v.reset(seed=0)
    assert obs.shape == (4, 13)
    assert obs is v.observations  # caller-visible preallocated buffer


def test_backend_equivalence_bitwise():
    """jit (vmapped) and serial (python loop) backends produce identical
    batches — the analogue of the reference's Serial≡Multiprocessing test."""
    T = 25
    n = 6
    acts = np.asarray(action_stream(T=T, n=n, seed=11), np.float32).reshape(T, n, 4)

    traces = {}
    for backend in vector.BACKENDS:
        v = vector.make("waypoint", num_envs=n, backend=backend, seed=5)
        v.reset()
        rows = [v.observations.copy()]
        rews = []
        for t in range(T):
            obs, rew, term, trunc, _ = v.step(acts[t])
            rows.append(obs.copy())
            rews.append(rew.copy())
        traces[backend] = (np.stack(rows), np.stack(rews))

    a_obs, a_rew = traces["jit"]
    b_obs, b_rew = traces["serial"]
    assert np.array_equal(a_obs.view(np.uint32), b_obs.view(np.uint32))
    assert np.array_equal(a_rew.view(np.uint32), b_rew.view(np.uint32))


def test_async_api_matches_sync():
    n = 4
    acts = np.asarray(action_stream(T=10, n=n, seed=3), np.float32).reshape(10, n, 4)
    v1 = vector.make("hover", num_envs=n, seed=9)
    v2 = vector.make("hover", num_envs=n, seed=9)
    v1.reset()
    v2.async_reset()
    # canonical driver loop: recv() after async_reset returns initial obs
    o0, r0, t0, tr0, inf0 = v2.recv()
    assert np.array_equal(o0, v1.observations) and not inf0
    with pytest.raises(RuntimeError):
        v2.recv()  # reset result consumed
    for t in range(10):
        o1, r1, *_ = v1.step(acts[t])
        v2.send(acts[t])
        o2, r2, *_ = v2.recv()
        assert np.array_equal(o1, o2)
        assert np.array_equal(r1, r2)
    with pytest.raises(RuntimeError):
        v2.recv()  # nothing pending
    v2.send(acts[0])
    with pytest.raises(RuntimeError):
        v2.send(acts[0])  # double send


def test_vec_episode_infos():
    """Crashing lanes must surface episode_return/length through infos."""
    v = vector.make("hover", num_envs=8, seed=1)
    v.reset()
    full = np.full((8, 4), -1.0, np.float32)  # zero thrust -> fall to ground
    seen = 0
    for _ in range(400):
        _, _, term, trunc, infos = v.step(full)
        if infos:
            assert infos["episode_length"].min() >= 1
            seen += len(infos["episode_return"])
    assert seen >= 8  # every lane crashed at least once


def test_bad_backend_rejected():
    with pytest.raises(ValueError):
        vector.make("hover", num_envs=2, backend="multiprocessing")


# --- gymnasium adapter -------------------------------------------------------

def test_gymnasium_api_contract():
    gym = pytest.importorskip("gymnasium")
    env = DroneGymnasium(task="hover")
    assert isinstance(env, gym.Env)
    obs, info = env.reset(seed=0)
    assert obs.shape == (13,)
    obs, r, term, trunc, info = env.step(np.zeros(4, np.float32))
    assert isinstance(r, float) and not (term or trunc)

    # run an episode to the end: terminal obs + episode info, then reset
    env.reset(seed=0)
    for t in range(2000):
        obs, r, term, trunc, info = env.step(np.full(4, -1.0, np.float32))
        if term or trunc:
            break
    assert term or trunc
    assert "episode" in info and info["episode"]["l"] == t + 1
    with pytest.raises(RuntimeError):
        env.step(np.zeros(4))
    obs2, _ = env.reset()
    assert obs2.shape == (13,)


def test_gymnasium_midepisode_reset_starts_new_episode():
    """Regression: reset() without a seed used to be a no-op mid-episode
    (returning the mid-episode observation), breaking TimeLimit-style
    wrappers. It must abandon the running episode and start the next one."""
    env = DroneGymnasium(task="hover")
    obs0, _ = env.reset(seed=3)
    for _ in range(5):
        env.step(np.zeros(4, np.float32))
    assert int(env._state.step) == 5
    obs1, _ = env.reset()
    assert int(env._state.step) == 0
    assert int(env._state.reset_count) == 1  # next episode in the stream
    assert not np.array_equal(obs0, obs1)    # randomized fresh pose
    # and it matches what the auto-reset path would have produced: episode 1
    # of the same lane stream
    from drone_tpu import env as env_mod

    fresh = env_mod.reset_state(env._state.key0, env._state.key1,
                                np.uint32(1), env.env.params, env.env.statics)
    assert np.array_equal(obs1, np.asarray(env.env.observe(fresh)))


def test_gymnasium_matches_internal_step():
    """The adapter's trajectory equals the internal single-lane trajectory
    (same seed, same actions), with gymnasium's terminal-obs convention the
    only divergence."""
    import jax

    from drone_tpu import env as env_mod

    T = 50
    acts = np.asarray(action_stream(T=T, seed=21), np.float32).reshape(T, 4)
    env = DroneGymnasium(task="hover")
    obs, _ = env.reset(seed=4)

    core = drone_tpu.DroneEnv(task="hover")
    state = core.init(4, 0)
    # params as traced args on BOTH sides (the adapter traces them too; a
    # closed-over param would constant-fold and bitwise-diverge)
    step = jax.jit(lambda s, a, p: env_mod.step(s, a, p, core.statics))
    assert np.array_equal(obs, np.asarray(core.observe(state)))
    for t in range(T):
        gobs, gr, gterm, gtrunc, _ = env.step(acts[t])
        state, out = step(state, acts[t], core.params)
        assert np.float32(gr) == np.asarray(out.reward)
        assert gterm == bool(out.terminated) and gtrunc == bool(out.truncated)
        if gterm or gtrunc:
            env.reset()
        # post-(auto)reset both paths continue the same episode stream
        gobs2, _ = (np.asarray(env.env.observe(env._state)), None)
        assert np.array_equal(gobs2, np.asarray(out.obs))


def test_partial_batch_async_matches_sync():
    """envpool-style batch_size < num_envs: two sub-batches in flight; the
    per-lane trajectory must be BITWISE the sync full-batch trajectory
    (same counter-RNG streams, params traced on both sides)."""
    n, bs, T = 8, 4, 12
    actions = np.asarray(action_stream(T=T, seed=5), np.float32).reshape(
        T, 1, 4).repeat(n, axis=1)
    # per-lane action variation so lanes are distinguishable
    for i in range(n):
        actions[:, i] += 0.01 * i
    actions = np.clip(actions, -1.0, 1.0)

    sync = VecDrone(n, seed=9)
    sync.reset()
    sync_obs = []
    for t in range(T):
        obs, r, te, tr, _ = sync.step(actions[t])
        sync_obs.append(obs.copy())

    av = VecDrone(n, seed=9, batch_size=bs)
    av.async_reset()
    async_obs = {t: np.zeros((n, obs.shape[-1]), np.float32)
                 for t in range(T)}
    sent = {0: 0, 1: 0}   # steps dispatched per sub-batch
    got = {0: 0, 1: 0}    # step results recorded per sub-batch
    while got[0] < T or got[1] < T:
        o, r, te, tr, info = av.recv()
        ids = info["env_ids"]
        sub = 0 if ids[0] == 0 else 1
        if sent[sub] > 0:
            async_obs[sent[sub] - 1][ids] = o  # result of the last send
            got[sub] = sent[sub]
        if sent[sub] < T:
            av.send(actions[sent[sub]][ids])
            sent[sub] += 1
        else:
            av._awaiting = None  # sub finished: nothing left to send
    assert sent == {0: T, 1: T} and got == {0: T, 1: T}
    for t in range(T):
        np.testing.assert_array_equal(async_obs[t], sync_obs[t],
                                      err_msg=f"t={t}")


def test_partial_batch_async_interleaves_in_flight():
    """Both sub-batches really are in flight simultaneously (queue depth 2
    after async_reset; send/recv alternate sub ids)."""
    av = VecDrone(8, seed=1, batch_size=4)
    av.async_reset()
    assert len(av._queue) == 2
    _, _, _, _, i0 = av.recv()
    av.send(np.zeros((4, 4), np.float32))
    _, _, _, _, i1 = av.recv()
    av.send(np.zeros((4, 4), np.float32))
    assert set(i0["env_ids"]) != set(i1["env_ids"])
    assert len(av._queue) == 2  # two step results pending again
    # sync API is refused in partial mode
    with pytest.raises(RuntimeError):
        av.reset()


# --- gymnasium vector adapter + PettingZoo swarm -----------------------------

def test_gymnasium_vector_adapter_sb3_style():
    """SB3-style consumption: batched spaces, vector reset/step, SAME_STEP
    autoreset with final_observation surfaced through infos."""
    gym = pytest.importorskip("gymnasium")
    from drone_tpu.emulation import DroneVectorGymnasium

    n = 6
    venv = DroneVectorGymnasium(n, task="hover")
    assert isinstance(venv, gym.vector.VectorEnv)
    assert venv.observation_space.shape == (n, 13)
    assert venv.action_space.shape == (n, 4)
    obs, infos = venv.reset(seed=2)
    assert obs.shape == (n, 13)

    # the generic SB3-ish loop: sample, step, track episode stats
    ep_seen = 0
    full_drop = np.full((n, 4), -1.0, np.float32)
    for t in range(400):
        obs, rew, term, trunc, infos = venv.step(full_drop)
        assert obs.shape == (n, 13) and rew.shape == (n,)
        done = term | trunc
        if done.any():
            assert "final_observation" in infos and "final_obs" in infos
            mask = infos["_final_obs"]
            np.testing.assert_array_equal(mask, done)
            # terminal obs is finite where done, and differs from the
            # auto-reset obs the main return carries
            fo = infos["final_observation"]
            assert np.isfinite(fo[done]).all()
            assert not np.array_equal(fo[done], obs[done])
            ep_seen += int(done.sum())
    assert ep_seen >= n  # every drone crashed at least once
    venv.close()


def test_pettingzoo_swarm_parallel_contract():
    pz = pytest.importorskip("pettingzoo")
    from drone_tpu.multiagent import DroneSwarmParallel

    env = DroneSwarmParallel(n_drones=3, task="hover")
    assert isinstance(env, pz.ParallelEnv)
    obs, infos = env.reset(seed=1)
    assert set(obs) == {"drone_0", "drone_1", "drone_2"}
    assert env.agents == env.possible_agents
    assert env.observation_space("drone_0").shape == (13,)

    # drop until agents start terminating; finished agents leave the roster
    t = 0
    while env.agents and t < 400:
        acts = {a: np.full(4, -1.0, np.float32) for a in env.agents}
        obs, rew, term, trunc, infos = env.step(acts)
        assert set(obs) >= set(env.agents)
        for a, done in term.items():
            if done or trunc[a]:
                assert a not in env.agents
                assert "episode" in infos[a]
                assert infos[a]["episode"]["l"] >= 1
        t += 1
    assert not env.agents  # the whole swarm eventually crashed
    # reset restores the full roster
    obs, _ = env.reset()
    assert env.agents == env.possible_agents and len(obs) == 3


def test_vector_gymnasium_unseeded_reset_advances_episodes():
    """Gymnasium semantics: reset() without a seed continues the RNG.
    Replaying init_batch(seed) would score the identical episode set on
    every eval round; the adapter advances the counter-RNG episode stream
    instead, and re-seeding reproduces the original batch."""
    from drone_tpu.emulation import DroneVectorGymnasium

    env = DroneVectorGymnasium(4, task="hover", seed=9)
    obs0, _ = env.reset()
    obs1, _ = env.reset()
    assert not np.array_equal(obs0, obs1)  # fresh episodes, not a replay
    obs2, _ = env.reset(seed=9)
    np.testing.assert_array_equal(obs2, obs0)  # seeding restores stream 0


def test_swarm_unseeded_reset_advances_episodes():
    from drone_tpu.multiagent import DroneSwarmParallel

    env = DroneSwarmParallel(n_drones=3, seed=4)
    obs0, _ = env.reset()
    obs1, _ = env.reset()
    a = np.stack([obs0[k] for k in sorted(obs0)])
    b = np.stack([obs1[k] for k in sorted(obs1)])
    assert not np.array_equal(a, b)
    obs2, _ = env.reset(seed=4)
    c = np.stack([obs2[k] for k in sorted(obs2)])
    np.testing.assert_array_equal(c, a)
