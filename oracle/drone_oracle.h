/* drone_oracle.h — single source of truth for the C oracle's public API.
 *
 * The DroneParams layout mirrors drone_tpu/types.py EnvParams and the
 * ctypes struct in oracle/oracle.py (field order is the wire format of
 * params.bin written by `drone_tpu.cli export`). Every C consumer
 * (drone_oracle.c, native/demo.c, oracle/sanitize_check.c) includes this
 * header; a hand-duplicated struct silently misaligns all fields after an
 * edit, which is why the copies were removed. */
#ifndef DRONE_ORACLE_H
#define DRONE_ORACLE_H

#include <stdint.h>

#define DRONE_OBS_DIM 13
#define DRONE_ACT_DIM 4
#define DRONE_FSTATE_DIM 19
#define DRONE_ISTATE_DIM 4
#define DRONE_MAX_GATES 8

typedef struct {
  float mass, gravity, arm_l, thrust_max, torque_coef;
  float inertia_x, inertia_y, inertia_z;
  float drag_lin, drag_ang, dt;
  float target[3];
  float bound, tilt_min;
  int32_t horizon;
  float c_vel, c_spin, c_act, crash_penalty, reach_bonus, reach_tol2;
  float pos_radius, vel_max_init, rot_max_init, omega_max_init;
  float dr_mass_lo, dr_mass_hi, dr_thrust_lo, dr_thrust_hi;
  float wp_box, wp_zmin, wp_zmax;
  float gates[DRONE_MAX_GATES * 3];
  int32_t n_gates;
} DroneParams;

/* tasks: 0=hover 1=waypoint 2=racing; integrators: 0=euler 1=rk4
 * (drone_tpu/types.py TASKS / INTEGRATORS order) */

void drone_threefry2x32(uint32_t k0, uint32_t k1, uint32_t x0, uint32_t x1,
                        uint32_t out[2]);
void drone_lane_key(uint32_t seed, uint32_t lane, uint32_t out[2]);
void drone_reset(float *fs, int32_t *is, const DroneParams *p, uint32_t k0,
                 uint32_t k1, uint32_t episode, int task);
void drone_observe(const float *fs, float *obs);
void drone_step_keyed(float *fs, int32_t *is, const float *action,
                      const DroneParams *p, uint32_t k0, uint32_t k1, int task,
                      int integrator, float *obs, float *reward,
                      int32_t *terminated, int32_t *truncated,
                      float *ep_return, int32_t *ep_length);
void drone_rollout(float *fs, int32_t *is, const float *actions, int32_t T,
                   const DroneParams *p, uint32_t k0, uint32_t k1, int task,
                   int integrator, float *out_fstate, float *out_obs,
                   float *out_reward, int32_t *out_term, int32_t *out_trunc,
                   float *out_ep_return, int32_t *out_ep_length);

#endif
