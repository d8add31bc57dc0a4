"""Typed pytrees: EnvParams / EnvState / StepOut, plus static env config.

TPU-native replacement for the reference's C structs + flat numpy buffers
(SURVEY.md §1 L0/L1: `[U] pufferlib/ocean/drone/drone.h` Env struct and the
PufferEnv buffer protocol). All dynamic values are float32/int32/uint32 leaves
of flax.struct dataclasses so the whole environment state is a pytree that
vmaps/shards/checkpoints for free; static choices (task, integrator) live in
EnvStatics, which is hashable and passed as a static jit argument.

The C oracle (oracle/drone_oracle.c) mirrors this layout exactly:
  float state  [19]: pos(3) vel(3) quat(4,wxyz) omega(3) target(3)
                     dr_mass dr_thrust ep_return
  int   state  [4] : step reset_count wp_count gate_idx
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax.numpy as jnp
import numpy as np

OBS_DIM = 13  # target-relative pos(3) + quat(4) + vel(3) + omega(3)
ACT_DIM = 4   # one command in [-1, 1] per rotor
MAX_GATES = 8
RESET_BLOCKS = 9   # threefry blocks consumed per reset (18 uniforms, 17 used)
WP_BLOCK0 = 16     # waypoint respawn draws: blocks WP_BLOCK0 + 2*wp_count, +1

TASKS = ("hover", "waypoint", "racing")
INTEGRATORS = ("euler", "rk4")

# float-state vector layout (C oracle parity + trajectory dumps)
FSTATE_DIM = 19
ISTATE_DIM = 4


@dataclasses.dataclass(frozen=True)
class EnvStatics:
    """Static (trace-time) env configuration. Hashable; not a pytree."""

    task: str = "hover"
    integrator: str = "euler"

    def __post_init__(self):
        if self.task not in TASKS:
            raise ValueError(f"task must be one of {TASKS}, got {self.task!r}")
        if self.integrator not in INTEGRATORS:
            raise ValueError(
                f"integrator must be one of {INTEGRATORS}, got {self.integrator!r}"
            )

    @property
    def task_id(self) -> int:
        return TASKS.index(self.task)

    @property
    def integrator_id(self) -> int:
        return INTEGRATORS.index(self.integrator)


@flax.struct.dataclass
class EnvParams:
    """All physical & task constants. One pytree — domain randomization and
    hyperparameter sweeps are the same mechanism (SURVEY.md §5 config note).

    Scalars are float32 0-d arrays; `gates` is (MAX_GATES, 3).
    """

    # --- rigid body / rotors -------------------------------------------------
    mass: jnp.ndarray          # kg
    gravity: jnp.ndarray       # m/s^2 (positive; applied as -z)
    arm_l: jnp.ndarray         # effective arm moment L/sqrt(2), m (X layout)
    thrust_max: jnp.ndarray    # max thrust per rotor, N
    torque_coef: jnp.ndarray   # yaw reaction torque per N of thrust, m
    inertia_x: jnp.ndarray     # body-frame diagonal inertia, kg m^2
    inertia_y: jnp.ndarray
    inertia_z: jnp.ndarray
    drag_lin: jnp.ndarray      # linear drag force coeff, N/(m/s)
    drag_ang: jnp.ndarray      # angular drag torque coeff, N m/(rad/s)
    dt: jnp.ndarray            # integration timestep, s
    # --- task ----------------------------------------------------------------
    target: jnp.ndarray        # (3,) hover target / spawn center
    bound: jnp.ndarray         # world half-extent; crash outside
    tilt_min: jnp.ndarray      # crash when body-up-z < tilt_min
    horizon: jnp.ndarray       # int32 truncation step count
    # --- reward --------------------------------------------------------------
    c_vel: jnp.ndarray         # velocity penalty coeff
    c_spin: jnp.ndarray        # angular velocity penalty coeff
    c_act: jnp.ndarray         # action magnitude penalty coeff
    crash_penalty: jnp.ndarray # added (negative) on crash
    reach_bonus: jnp.ndarray   # added on waypoint/gate reach
    reach_tol2: jnp.ndarray    # squared reach radius, m^2
    # --- reset randomization -------------------------------------------------
    pos_radius: jnp.ndarray    # spawn cube half-extent around target, m
    vel_max_init: jnp.ndarray  # initial |v| component bound, m/s
    rot_max_init: jnp.ndarray  # initial rotation-vector component bound, rad
    omega_max_init: jnp.ndarray  # initial |omega| component bound, rad/s
    # --- domain randomization (lo == hi == 1 disables) -----------------------
    dr_mass_lo: jnp.ndarray
    dr_mass_hi: jnp.ndarray
    dr_thrust_lo: jnp.ndarray
    dr_thrust_hi: jnp.ndarray
    # --- waypoint task -------------------------------------------------------
    wp_box: jnp.ndarray        # waypoint xy half-extent, m
    wp_zmin: jnp.ndarray
    wp_zmax: jnp.ndarray
    # --- racing task ---------------------------------------------------------
    gates: jnp.ndarray         # (MAX_GATES, 3) float32 gate centers
    n_gates: jnp.ndarray       # int32 number of active gates


def default_gates() -> np.ndarray:
    """4 gates on a square at z=1.5 (float32 exact constants, shared with C)."""
    g = np.zeros((MAX_GATES, 3), np.float32)
    g[0] = (2.0, 0.0, 1.5)
    g[1] = (0.0, 2.0, 1.5)
    g[2] = (-2.0, 0.0, 1.5)
    g[3] = (0.0, -2.0, 1.5)
    return g


def default_params(task: str = "hover", **overrides) -> EnvParams:
    """Defaults modeled on a 250-class quadrotor (see PAPERS.md: Crazyflie /
    Crazyflow parameter ranges scaled up); every value float32."""
    f = lambda v: jnp.float32(v)
    base = dict(
        mass=f(0.75),
        gravity=f(9.81),
        arm_l=f(0.08),          # L/sqrt(2) with L ~= 0.113 m
        thrust_max=f(4.6),      # per rotor -> T/W ~= 2.5
        torque_coef=f(0.016),
        inertia_x=f(0.0023),
        inertia_y=f(0.0023),
        inertia_z=f(0.004),
        drag_lin=f(0.10),
        drag_ang=f(0.003),
        dt=f(0.01),
        target=jnp.asarray([0.0, 0.0, 1.5], jnp.float32),
        bound=f(5.0),
        tilt_min=f(0.0),
        horizon=jnp.int32(1000),
        c_vel=f(0.02),
        c_spin=f(0.01),
        c_act=f(0.01),
        crash_penalty=f(-10.0),
        reach_bonus=f(10.0),
        reach_tol2=f(0.09),
        pos_radius=f(1.0),
        vel_max_init=f(0.5),
        rot_max_init=f(0.5),
        omega_max_init=f(0.5),
        dr_mass_lo=f(1.0),
        dr_mass_hi=f(1.0),
        dr_thrust_lo=f(1.0),
        dr_thrust_hi=f(1.0),
        wp_box=f(3.0),
        wp_zmin=f(0.8),
        wp_zmax=f(4.0),
        gates=jnp.asarray(default_gates()),
        n_gates=jnp.int32(4),
    )
    if task == "waypoint":
        base["horizon"] = jnp.int32(1500)
    base.update({k: (jnp.asarray(v, jnp.float32) if k not in ("horizon", "n_gates")
                     else jnp.asarray(v, jnp.int32))
                 for k, v in overrides.items()})
    return EnvParams(**base)


@flax.struct.dataclass
class EnvState:
    """Per-drone state. vmap over the leading axis for a fleet."""

    pos: jnp.ndarray      # (3,) world frame, m
    vel: jnp.ndarray      # (3,) world frame, m/s
    quat: jnp.ndarray     # (4,) (w, x, y, z), body->world
    omega: jnp.ndarray    # (3,) body frame, rad/s
    target: jnp.ndarray   # (3,) current target / active gate center
    dr_mass: jnp.ndarray    # per-episode mass scale
    dr_thrust: jnp.ndarray  # per-episode thrust scale
    ep_return: jnp.ndarray  # running episode return, f32
    step: jnp.ndarray        # int32 step within episode
    reset_count: jnp.ndarray # uint32 episode counter (RNG stream selector)
    wp_count: jnp.ndarray    # uint32 waypoints reached this episode (RNG ctr)
    gate_idx: jnp.ndarray    # int32 active racing gate
    key0: jnp.ndarray        # uint32 lane key (threefry)
    key1: jnp.ndarray


@flax.struct.dataclass
class StepOut:
    """Outputs of one env step (after any auto-reset)."""

    obs: jnp.ndarray        # (OBS_DIM,)
    reward: jnp.ndarray     # f32, reward of the step that just finished
    terminated: jnp.ndarray # bool, crash
    truncated: jnp.ndarray  # bool, horizon
    # episode stats, nonzero only on the step an episode ended:
    ep_return: jnp.ndarray  # f32
    ep_length: jnp.ndarray  # int32
