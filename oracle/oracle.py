"""ctypes driver for the C oracle (oracle/drone_oracle.c).

This is the native binding layer equivalent of the reference's
`binding.c`/`env_binding.h` (SURVEY.md §2.3): flat preallocated buffers, no
copies beyond the ctypes call boundary. Auto-builds the .so on first use.
"""

from __future__ import annotations

import ctypes as ct
import pathlib
import subprocess

import numpy as np

from drone_tpu.types import (
    ACT_DIM,
    FSTATE_DIM,
    INTEGRATORS,
    ISTATE_DIM,
    MAX_GATES,
    OBS_DIM,
    TASKS,
    EnvParams,
)

_DIR = pathlib.Path(__file__).resolve().parent


class CParams(ct.Structure):
    """Mirror of DroneParams in drone_oracle.c (field order must match)."""

    _fields_ = [
        ("mass", ct.c_float),
        ("gravity", ct.c_float),
        ("arm_l", ct.c_float),
        ("thrust_max", ct.c_float),
        ("torque_coef", ct.c_float),
        ("inertia_x", ct.c_float),
        ("inertia_y", ct.c_float),
        ("inertia_z", ct.c_float),
        ("drag_lin", ct.c_float),
        ("drag_ang", ct.c_float),
        ("dt", ct.c_float),
        ("target", ct.c_float * 3),
        ("bound", ct.c_float),
        ("tilt_min", ct.c_float),
        ("horizon", ct.c_int32),
        ("c_vel", ct.c_float),
        ("c_spin", ct.c_float),
        ("c_act", ct.c_float),
        ("crash_penalty", ct.c_float),
        ("reach_bonus", ct.c_float),
        ("reach_tol2", ct.c_float),
        ("pos_radius", ct.c_float),
        ("vel_max_init", ct.c_float),
        ("rot_max_init", ct.c_float),
        ("omega_max_init", ct.c_float),
        ("dr_mass_lo", ct.c_float),
        ("dr_mass_hi", ct.c_float),
        ("dr_thrust_lo", ct.c_float),
        ("dr_thrust_hi", ct.c_float),
        ("wp_box", ct.c_float),
        ("wp_zmin", ct.c_float),
        ("wp_zmax", ct.c_float),
        ("gates", ct.c_float * (MAX_GATES * 3)),
        ("n_gates", ct.c_int32),
    ]


def params_to_c(p: EnvParams) -> CParams:
    c = CParams()
    for name, _ in CParams._fields_:
        v = np.asarray(getattr(p, name))
        if name == "target":
            c.target = (ct.c_float * 3)(*v.astype(np.float32).tolist())
        elif name == "gates":
            c.gates = (ct.c_float * (MAX_GATES * 3))(
                *v.astype(np.float32).reshape(-1).tolist()
            )
        elif name in ("horizon", "n_gates"):
            setattr(c, name, int(v))
        else:
            setattr(c, name, float(np.float32(v)))
    return c


def build_oracle(sanitize: bool = False) -> pathlib.Path:
    """Compile the oracle .so if missing/stale; returns the library path."""
    target = "asan" if sanitize else "all"
    lib = _DIR / ("libdrone_oracle_asan.so" if sanitize else "libdrone_oracle.so")
    # the header defines DroneParams — the wire format this module's CParams
    # mirrors — so a header edit must invalidate the binary too
    srcs = [_DIR / "drone_oracle.c", _DIR / "drone_oracle.h"]
    if not lib.exists() or any(lib.stat().st_mtime < s.stat().st_mtime
                               for s in srcs):
        try:
            subprocess.run(["make", "-C", str(_DIR), target], check=True,
                           capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            raise RuntimeError(
                f"oracle build failed:\n{e.stderr}") from e
    return lib


_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_U32P = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")


class Oracle:
    """One lane (or batch of lanes) of the C ground-truth environment."""

    def __init__(self, params: EnvParams, task: str = "hover",
                 integrator: str = "euler", sanitize: bool = False):
        self.lib = ct.CDLL(str(build_oracle(sanitize)))
        self.task = TASKS.index(task)
        self.integrator = INTEGRATORS.index(integrator)
        self.cparams = params_to_c(params)

        L = self.lib
        L.drone_threefry2x32.argtypes = [ct.c_uint32] * 4 + [_U32P]
        L.drone_lane_key.argtypes = [ct.c_uint32, ct.c_uint32, _U32P]
        L.drone_reset.argtypes = [
            _F32P, _I32P, ct.POINTER(CParams),
            ct.c_uint32, ct.c_uint32, ct.c_uint32, ct.c_int,
        ]
        L.drone_observe.argtypes = [_F32P, _F32P]
        L.drone_step_keyed.argtypes = [
            _F32P, _I32P, _F32P, ct.POINTER(CParams),
            ct.c_uint32, ct.c_uint32, ct.c_int, ct.c_int,
            _F32P, _F32P, _I32P, _I32P, _F32P, _I32P,
        ]
        L.drone_rollout.argtypes = [
            _F32P, _I32P, _F32P, ct.c_int, ct.POINTER(CParams),
            ct.c_uint32, ct.c_uint32, ct.c_int, ct.c_int,
            _F32P, _F32P, _F32P, _I32P, _I32P, _F32P, _I32P,
        ]
        L.drone_reset_batch.argtypes = [
            _F32P, _I32P, ct.POINTER(CParams), _U32P, ct.c_uint32,
            ct.c_int, ct.c_int,
        ]
        L.drone_step_batch.argtypes = [
            _F32P, _I32P, _F32P, ct.POINTER(CParams), _U32P,
            ct.c_int, ct.c_int, ct.c_int,
            _F32P, _F32P, _I32P, _I32P, _F32P, _I32P,
        ]

    # -- rng ----------------------------------------------------------------
    def threefry(self, k0, k1, x0, x1):
        out = np.zeros(2, np.uint32)
        self.lib.drone_threefry2x32(k0, k1, x0, x1, out)
        return int(out[0]), int(out[1])

    def lane_key(self, seed, lane):
        out = np.zeros(2, np.uint32)
        self.lib.drone_lane_key(seed, lane, out)
        return int(out[0]), int(out[1])

    # -- single lane ----------------------------------------------------------
    def reset(self, seed: int, lane: int = 0, episode: int = 0):
        """Returns (fstate, istate, (k0, k1))."""
        k0, k1 = self.lane_key(seed, lane)
        fs = np.zeros(FSTATE_DIM, np.float32)
        istate = np.zeros(ISTATE_DIM, np.int32)
        self.lib.drone_reset(fs, istate, ct.byref(self.cparams), k0, k1,
                             episode, self.task)
        return fs, istate, (k0, k1)

    def observe(self, fs):
        obs = np.zeros(OBS_DIM, np.float32)
        self.lib.drone_observe(fs, obs)
        return obs

    def step(self, fs, istate, action, keys):
        """In-place step; returns (obs, reward, term, trunc, epret, eplen)."""
        obs = np.zeros(OBS_DIM, np.float32)
        rew = np.zeros(1, np.float32)
        term = np.zeros(1, np.int32)
        trunc = np.zeros(1, np.int32)
        epret = np.zeros(1, np.float32)
        eplen = np.zeros(1, np.int32)
        act = np.ascontiguousarray(action, np.float32)
        self.lib.drone_step_keyed(fs, istate, act, ct.byref(self.cparams),
                                  keys[0], keys[1], self.task, self.integrator,
                                  obs, rew, term, trunc, epret, eplen)
        return obs, float(rew[0]), bool(term[0]), bool(trunc[0]), \
            float(epret[0]), int(eplen[0])

    def rollout(self, fs, istate, actions, keys):
        """T steps in one C call. actions: (T, ACT_DIM) float32.

        Returns dict of golden arrays (states after each step, obs, rewards,
        term/trunc flags, episode stats)."""
        actions = np.ascontiguousarray(actions, np.float32)
        T = actions.shape[0]
        out = dict(
            fstate=np.zeros((T, FSTATE_DIM), np.float32),
            obs=np.zeros((T, OBS_DIM), np.float32),
            reward=np.zeros(T, np.float32),
            terminated=np.zeros(T, np.int32),
            truncated=np.zeros(T, np.int32),
            ep_return=np.zeros(T, np.float32),
            ep_length=np.zeros(T, np.int32),
        )
        self.lib.drone_rollout(fs, istate, actions, T, ct.byref(self.cparams),
                               keys[0], keys[1], self.task, self.integrator,
                               out["fstate"], out["obs"], out["reward"],
                               out["terminated"], out["truncated"],
                               out["ep_return"], out["ep_length"])
        return out

    @staticmethod
    def _flat_inplace(a, name):
        """Flatten a state array for the in-place C call. A non-contiguous
        view (e.g. fs[::2]) would reshape into a COPY: the ndpointer
        contiguity check would pass on the copy and the C updates would be
        silently discarded — refuse instead."""
        if not a.flags.c_contiguous:
            raise ValueError(
                f"{name} must be C-contiguous for the in-place batch call "
                f"(a strided view would be copied and the C state updates "
                f"lost); pass np.ascontiguousarray() and copy back yourself")
        return a.reshape(-1)

    # -- batch ----------------------------------------------------------------
    def reset_batch(self, seed: int, n: int, episode: int = 0):
        keys = np.zeros(2 * n, np.uint32)
        for l in range(n):
            k0, k1 = self.lane_key(seed, l)
            keys[2 * l] = k0
            keys[2 * l + 1] = k1
        fs = np.zeros((n, FSTATE_DIM), np.float32)
        istate = np.zeros((n, ISTATE_DIM), np.int32)
        self.lib.drone_reset_batch(self._flat_inplace(fs, "fs"),
                                   self._flat_inplace(istate, "istate"),
                                   ct.byref(self.cparams), keys, episode,
                                   self.task, n)
        return fs, istate, keys

    def step_batch(self, fs, istate, actions, keys):
        n = fs.shape[0]
        obs = np.zeros((n, OBS_DIM), np.float32)
        rew = np.zeros(n, np.float32)
        term = np.zeros(n, np.int32)
        trunc = np.zeros(n, np.int32)
        epret = np.zeros(n, np.float32)
        eplen = np.zeros(n, np.int32)
        act = np.ascontiguousarray(actions, np.float32)
        self.lib.drone_step_batch(self._flat_inplace(fs, "fs"),
                                  self._flat_inplace(istate, "istate"),
                                  act.reshape(-1), ct.byref(self.cparams),
                                  keys, self.task, self.integrator, n,
                                  obs.reshape(-1), rew, term, trunc, epret,
                                  eplen)
        return obs, rew, term.astype(bool), trunc.astype(bool), epret, eplen
