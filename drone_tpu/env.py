"""DroneEnv: the fused, pure-functional environment step.

TPU-native rebuild of the reference's `c_reset`/`c_step` (SURVEY.md §1 L0-L1,
§3.2; `[U] pufferlib/ocean/drone/drone.h`). One jittable function does
mix -> integrate -> reward -> termination -> auto-reset -> observe, entirely
branch-free (lax-select based) so it vmaps over tens of thousands of drones
and the whole rollout never leaves HBM (BASELINE.json:5).

PARITY CONTRACT: `reset_state` and `step` mirror oracle/drone_oracle.c
(drone_reset / drone_step) bit-for-bit at float32 — same arithmetic order,
same RNG draws (drone_tpu.prng counter streams), same auto-reset semantics
(obs returned after a done step is the NEW episode's first obs, as in the
PufferEnv convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drone_tpu import dynamics, mixing, prng, randomize, tasks
from drone_tpu.types import (
    EnvParams,
    EnvState,
    EnvStatics,
    StepOut,
    default_params,
)


def reset_state(key0, key1, episode, p: EnvParams, statics: EnvStatics) -> EnvState:
    """Fresh episode state for one lane. episode (uint32) selects the RNG
    stream; lane identity is already folded into (key0, key1)."""
    u = randomize.reset_draws(key0, key1, episode)
    pos, vel, quat, omega, dr_mass, dr_thrust = randomize.init_pose(u, p)

    if statics.task == "hover":
        target = p.target
    elif statics.task == "waypoint":
        target = randomize.sample_waypoint(u[14], u[15], u[16], p)
    else:  # racing
        target = p.gates[0]

    zero_i = jnp.int32(0)
    return EnvState(
        pos=pos,
        vel=vel,
        quat=quat,
        omega=omega,
        target=target,
        dr_mass=dr_mass,
        dr_thrust=dr_thrust,
        ep_return=jnp.float32(0.0),
        step=zero_i,
        reset_count=jnp.asarray(episode, jnp.uint32),
        wp_count=jnp.uint32(0),
        gate_idx=zero_i,
        key0=jnp.asarray(key0, jnp.uint32),
        key1=jnp.asarray(key1, jnp.uint32),
    )


def init_state(seed, lane, p: EnvParams, statics: EnvStatics,
               episode=0) -> EnvState:
    """Episode-`episode` state for lane `lane` under global seed `seed`
    (episode advances the lane's counter-RNG reset stream — the same stream
    auto-reset walks; no new arithmetic, just the counter)."""
    k0, k1 = prng.lane_key(seed, lane)
    return reset_state(k0, k1, jnp.uint32(episode), p, statics)


def observe(state: EnvState) -> jnp.ndarray:
    return tasks.observation(state.pos, state.vel, state.quat, state.omega, state.target)


def _step_continued(state: EnvState, action, p: EnvParams, statics: EnvStatics):
    """Physics + task + termination for one step, WITHOUT the auto-reset
    select. Returns (continued_state, reward, crashed, truncated, done).
    Split out so emulation.py can observe the terminal (pre-reset) state;
    arithmetic order is the parity contract — do not reorder."""
    mass_eff = p.mass * state.dr_mass
    thrusts = mixing.mix(action, p, state.dr_thrust)

    if statics.integrator == "euler":
        pos2, vel2, quat2, omega2 = dynamics.euler_step(
            state.pos, state.vel, state.quat, state.omega, thrusts, mass_eff, p
        )
    else:
        pos2, vel2, quat2, omega2 = dynamics.rk4_step(
            state.pos, state.vel, state.quat, state.omega, thrusts, mass_eff, p
        )

    step2 = state.step + jnp.int32(1)
    r, d2 = tasks.reward_base(pos2, vel2, omega2, action, state.target, p)

    # --- waypoint / gate progression -------------------------------------
    target2 = state.target
    wp_count2 = state.wp_count
    gate_idx2 = state.gate_idx
    if statics.task == "waypoint":
        reached = d2 < p.reach_tol2
        r = jnp.where(reached, r + p.reach_bonus, r)
        w0, w1, w2, _ = randomize.waypoint_draws(
            state.key0, state.key1, state.reset_count, state.wp_count
        )
        new_target = randomize.sample_waypoint(w0, w1, w2, p)
        target2 = jnp.where(reached, new_target, state.target)
        wp_count2 = state.wp_count + jnp.where(reached, jnp.uint32(1), jnp.uint32(0))
    elif statics.task == "racing":
        reached = d2 < p.reach_tol2
        r = jnp.where(reached, r + p.reach_bonus, r)
        # max(n_gates, 1) mirrors the C oracle's SIGFPE guard (identical
        # when n_gates >= 1, the validated range)
        gate_next = jnp.mod(state.gate_idx + jnp.int32(1),
                            jnp.maximum(p.n_gates, jnp.int32(1)))
        gate_idx2 = jnp.where(reached, gate_next, state.gate_idx)
        target2 = p.gates[gate_idx2]
        wp_count2 = state.wp_count + jnp.where(reached, jnp.uint32(1), jnp.uint32(0))

    # --- termination ------------------------------------------------------
    crashed = tasks.check_crash(pos2, quat2, p)
    truncated = (step2 >= p.horizon) & jnp.logical_not(crashed)
    done = crashed | truncated
    r = jnp.where(crashed, r + p.crash_penalty, r)
    ep_return2 = state.ep_return + r

    continued = EnvState(
        pos=pos2,
        vel=vel2,
        quat=quat2,
        omega=omega2,
        target=target2,
        dr_mass=state.dr_mass,
        dr_thrust=state.dr_thrust,
        ep_return=ep_return2,
        step=step2,
        reset_count=state.reset_count,
        wp_count=wp_count2,
        gate_idx=gate_idx2,
        key0=state.key0,
        key1=state.key1,
    )
    return continued, r, crashed, truncated, done


def _finish_step(continued, r, crashed, truncated, done, p, statics):
    """Auto-reset select + StepOut packing (shared by step / step_terminal)."""
    fresh = reset_state(
        continued.key0, continued.key1, continued.reset_count + jnp.uint32(1),
        p, statics,
    )
    next_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(done, a, b), fresh, continued
    )
    out = StepOut(
        obs=observe(next_state),
        reward=r,
        terminated=crashed,
        truncated=truncated,
        ep_return=jnp.where(done, continued.ep_return, jnp.float32(0.0)),
        ep_length=jnp.where(done, continued.step, jnp.int32(0)),
    )
    return next_state, out


def step(state: EnvState, action, p: EnvParams, statics: EnvStatics):
    """One env step for one drone. Returns (next_state, StepOut).

    Mirrors oracle drone_step. Branch-free: the auto-reset state is always
    computed (counter-based RNG makes this side-effect free) and selected
    per-lane with jnp.where.
    """
    continued, r, crashed, truncated, done = _step_continued(
        state, action, p, statics
    )
    return _finish_step(continued, r, crashed, truncated, done, p, statics)


def step_terminal(state: EnvState, action, p: EnvParams, statics: EnvStatics):
    """Like `step` but additionally returns the observation of the terminal
    (pre-auto-reset) state — what Gymnasium calls the final observation.
    Used by drone_tpu.emulation; not on the training hot path."""
    continued, r, crashed, truncated, done = _step_continued(
        state, action, p, statics
    )
    next_state, out = _finish_step(continued, r, crashed, truncated, done, p, statics)
    return next_state, out, observe(continued)


class DroneEnv:
    """Convenience wrapper bundling statics + params with batch helpers.

    The underlying functions are module-level and pure; this class only holds
    the static config (task, integrator) and default params — it is safe to
    close over in jitted code because statics are hashable Python values.
    """

    def __init__(self, task: str = "hover", integrator: str = "euler", params: EnvParams | None = None):
        self.statics = EnvStatics(task=task, integrator=integrator)
        self.params = params if params is not None else default_params(task)

    # single-lane API ------------------------------------------------------
    def init(self, seed, lane=0, params: EnvParams | None = None) -> EnvState:
        p = self.params if params is None else params
        return init_state(jnp.uint32(seed), jnp.uint32(lane), p, self.statics)

    def step(self, state: EnvState, action, params: EnvParams | None = None):
        p = self.params if params is None else params
        return step(state, action, p, self.statics)

    def observe(self, state: EnvState) -> jnp.ndarray:
        return observe(state)

    # batched API ------------------------------------------------------------
    def init_batch(self, seed, n: int, params: EnvParams | None = None,
                   episode: int = 0) -> EnvState:
        p = self.params if params is None else params
        lanes = jnp.arange(n, dtype=jnp.uint32)
        return jax.vmap(lambda l: init_state(jnp.uint32(seed), l, p,
                                             self.statics, episode))(lanes)

    def step_batch(self, state: EnvState, actions, params: EnvParams | None = None):
        p = self.params if params is None else params
        return jax.vmap(lambda s, a: step(s, a, p, self.statics))(state, actions)

    def observe_batch(self, state: EnvState) -> jnp.ndarray:
        return jax.vmap(observe)(state)

    @property
    def obs_dim(self) -> int:
        from drone_tpu.types import OBS_DIM

        return OBS_DIM

    @property
    def act_dim(self) -> int:
        from drone_tpu.types import ACT_DIM

        return ACT_DIM
