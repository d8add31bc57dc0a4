/* drone_oracle.c — C ground-truth for the drone_tpu environment.
 *
 * Role (SURVEY.md §0, §2.3): the reference C step (`[U]
 * pufferlib/ocean/drone/drone.h`) is not present in the mount, so this file
 * freezes ONE concrete float32 implementation of the drone step in the same
 * style — state structs, reset/auto-reset/step, observation/reward/
 * termination — and the JAX path (drone_tpu/{dynamics,mixing,tasks,
 * randomize,env}.py) is gated to match it BITWISE at float32
 * (BASELINE.json:5,7).
 *
 * PARITY CONTRACT:
 *  - Compile with -O2 -ffp-contract=off (Makefile): no FMA contraction, no
 *    fast-math. Only +,-,*,/ and sqrtf are used (correctly rounded IEEE).
 *  - Every expression is written with the same evaluation order as the
 *    Python mirror named in the comment above it.
 *  - RNG is Threefry-2x32 (20 rounds), identical counter discipline as
 *    drone_tpu/prng.py. No libc rand() anywhere (SURVEY.md §3.5 hazard).
 *
 * Layout of the flat buffers (drone_tpu/types.py):
 *   fstate[19]: pos(3) vel(3) quat(4,wxyz) omega(3) target(3)
 *               dr_mass dr_thrust ep_return
 *   istate[4] : step reset_count wp_count gate_idx   (int32/uint32)
 */

#include <math.h>
#include <stdint.h>
#include <string.h>

#include "drone_oracle.h" /* DroneParams + public API (single definition) */

#define DRONE_API __attribute__((visibility("default")))

#define OBS_DIM 13
#define ACT_DIM 4
#define FSTATE_DIM 19
#define ISTATE_DIM 4
#define MAX_GATES 8
#define RESET_BLOCKS 9
#define WP_BLOCK0 16

/* fstate indices */
enum {
  F_PX = 0, F_PY, F_PZ,
  F_VX, F_VY, F_VZ,
  F_QW, F_QX, F_QY, F_QZ,
  F_WX, F_WY, F_WZ,
  F_TX, F_TY, F_TZ,
  F_DRM, F_DRT, F_RET,
};
/* istate indices */
enum { I_STEP = 0, I_RESET, I_WPC, I_GATE };

/* task / integrator ids (drone_tpu/types.py TASKS / INTEGRATORS order) */
enum { TASK_HOVER = 0, TASK_WAYPOINT = 1, TASK_RACING = 2 };
enum { INTEG_EULER = 0, INTEG_RK4 = 1 };

/* DroneParams comes from drone_oracle.h (field order mirrors
 * drone_tpu/types.py EnvParams and the ctypes struct in oracle/oracle.py;
 * all float32 except horizon/n_gates). */

/* ------------------------------------------------------------------ RNG -- */
/* Mirrors drone_tpu/prng.py threefry2x32 (Threefry-2x32, 20 rounds). */

static inline uint32_t rotl32(uint32_t x, int r) {
  return (x << r) | (x >> (32 - r));
}

DRONE_API void drone_threefry2x32(uint32_t k0, uint32_t k1, uint32_t x0,
                                  uint32_t x1, uint32_t out[2]) {
  static const int rot_a[4] = {13, 15, 26, 6};
  static const int rot_b[4] = {17, 29, 16, 24};
  uint32_t ks[3];
  ks[0] = k0;
  ks[1] = k1;
  ks[2] = 0x1BD11BDAu ^ k0 ^ k1;
  x0 += ks[0];
  x1 += ks[1];
  for (int i = 0; i < 5; i++) {
    const int *rot = (i % 2 == 0) ? rot_a : rot_b;
    for (int j = 0; j < 4; j++) {
      x0 += x1;
      x1 = rotl32(x1, rot[j]);
      x1 ^= x0;
    }
    x0 += ks[(i + 1) % 3];
    x1 += ks[(i + 2) % 3] + (uint32_t)(i + 1);
  }
  out[0] = x0;
  out[1] = x1;
}

/* Mirrors drone_tpu/prng.py bits_to_uniform. */
static inline float bits_to_uniform(uint32_t bits) {
  union {
    uint32_t u;
    float f;
  } v;
  v.u = (bits >> 9) | 0x3F800000u;
  return v.f - 1.0f;
}

#define GOLDEN 0x9E3779B9u

/* Mirrors drone_tpu/prng.py lane_key. */
DRONE_API void drone_lane_key(uint32_t seed, uint32_t lane, uint32_t out[2]) {
  drone_threefry2x32(seed, GOLDEN, lane, 0u, out);
}

/* Mirrors drone_tpu/prng.py episode_uniforms (block0=0, n_blocks blocks). */
static void episode_uniforms(uint32_t k0, uint32_t k1, uint32_t episode,
                             int n_blocks, float *out) {
  uint32_t bits[2];
  for (int j = 0; j < n_blocks; j++) {
    drone_threefry2x32(k0, k1, episode, (uint32_t)j, bits);
    out[2 * j] = bits_to_uniform(bits[0]);
    out[2 * j + 1] = bits_to_uniform(bits[1]);
  }
}

/* ------------------------------------------------------------- dynamics -- */
/* Mirrors drone_tpu/dynamics.py deriv. d* out arrays: dpos3 dvel3 dquat4
 * domega3. */
static void drone_deriv(const float *pos, const float *vel, const float *quat,
                        const float *omega, const float F[4], float mass_eff,
                        const DroneParams *p, float *dpos, float *dvel,
                        float *dquat, float *domega) {
  float F0 = F[0], F1 = F[1], F2 = F[2], F3 = F[3];
  float T = F0 + F1 + F2 + F3;

  float qw = quat[0], qx = quat[1], qy = quat[2], qz = quat[3];
  float uzx = 2.0f * (qx * qz + qw * qy);
  float uzy = 2.0f * (qy * qz - qw * qx);
  float uzz = 1.0f - 2.0f * (qx * qx + qy * qy);

  float vx = vel[0], vy = vel[1], vz = vel[2];
  float Tm = T / mass_eff;
  float ax = Tm * uzx - p->drag_lin * vx / mass_eff;
  float ay = Tm * uzy - p->drag_lin * vy / mass_eff;
  float az = Tm * uzz - p->drag_lin * vz / mass_eff - p->gravity;

  float wx = omega[0], wy = omega[1], wz = omega[2];
  float taux = p->arm_l * ((F1 + F3) - (F0 + F2)) - p->drag_ang * wx;
  float tauy = p->arm_l * ((F2 + F3) - (F0 + F1)) - p->drag_ang * wy;
  float tauz = p->torque_coef * ((F1 + F2) - (F0 + F3)) - p->drag_ang * wz;
  float wdx =
      (taux - (wy * (p->inertia_z * wz) - wz * (p->inertia_y * wy))) / p->inertia_x;
  float wdy =
      (tauy - (wz * (p->inertia_x * wx) - wx * (p->inertia_z * wz))) / p->inertia_y;
  float wdz =
      (tauz - (wx * (p->inertia_y * wy) - wy * (p->inertia_x * wx))) / p->inertia_z;

  float s = qx * wx + qy * wy + qz * wz;
  float qdw = -0.5f * s;
  float qdx = 0.5f * (qw * wx + qy * wz - qz * wy);
  float qdy = 0.5f * (qw * wy - qx * wz + qz * wx);
  float qdz = 0.5f * (qw * wz + qx * wy - qy * wx);

  dpos[0] = vx;
  dpos[1] = vy;
  dpos[2] = vz;
  dvel[0] = ax;
  dvel[1] = ay;
  dvel[2] = az;
  dquat[0] = qdw;
  dquat[1] = qdx;
  dquat[2] = qdy;
  dquat[3] = qdz;
  domega[0] = wdx;
  domega[1] = wdy;
  domega[2] = wdz;
}

/* Mirrors drone_tpu/dynamics.py normalize_quat. */
static void quat_normalize(float *q) {
  float qw = q[0], qx = q[1], qy = q[2], qz = q[3];
  float n2 = qw * qw + qx * qx + qy * qy + qz * qz;
  float n = sqrtf(n2);
  q[0] = qw / n;
  q[1] = qx / n;
  q[2] = qy / n;
  q[3] = qz / n;
}

/* Mirrors drone_tpu/dynamics.py euler_step. */
static void euler_step(float *pos, float *vel, float *quat, float *omega,
                       const float F[4], float mass_eff,
                       const DroneParams *p) {
  float dpos[3], dvel[3], dquat[4], domega[3];
  drone_deriv(pos, vel, quat, omega, F, mass_eff, p, dpos, dvel, dquat, domega);
  for (int i = 0; i < 3; i++) pos[i] = pos[i] + p->dt * dpos[i];
  for (int i = 0; i < 3; i++) vel[i] = vel[i] + p->dt * dvel[i];
  for (int i = 0; i < 4; i++) quat[i] = quat[i] + p->dt * dquat[i];
  for (int i = 0; i < 3; i++) omega[i] = omega[i] + p->dt * domega[i];
  quat_normalize(quat);
}

/* Mirrors drone_tpu/dynamics.py rk4_step: s + h6*(((k1 + 2*k2) + 2*k3) + k4),
 * quat normalized only at the end. */
static void rk4_step(float *pos, float *vel, float *quat, float *omega,
                     const float F[4], float mass_eff, const DroneParams *p) {
  float h2 = p->dt * 0.5f;
  /* dt * (1/6): mirrors the JAX side, which must avoid dividing by a literal
   * constant (XLA rewrites it to multiply-by-reciprocal). */
  float h6 = p->dt * (1.0f / 6.0f);
  /* k[stage][component-group] */
  float k1p[3], k1v[3], k1q[4], k1w[3];
  float k2p[3], k2v[3], k2q[4], k2w[3];
  float k3p[3], k3v[3], k3q[4], k3w[3];
  float k4p[3], k4v[3], k4q[4], k4w[3];
  float sp[3], sv[3], sq[4], sw[3];

  drone_deriv(pos, vel, quat, omega, F, mass_eff, p, k1p, k1v, k1q, k1w);
  for (int i = 0; i < 3; i++) sp[i] = pos[i] + h2 * k1p[i];
  for (int i = 0; i < 3; i++) sv[i] = vel[i] + h2 * k1v[i];
  for (int i = 0; i < 4; i++) sq[i] = quat[i] + h2 * k1q[i];
  for (int i = 0; i < 3; i++) sw[i] = omega[i] + h2 * k1w[i];
  drone_deriv(sp, sv, sq, sw, F, mass_eff, p, k2p, k2v, k2q, k2w);
  for (int i = 0; i < 3; i++) sp[i] = pos[i] + h2 * k2p[i];
  for (int i = 0; i < 3; i++) sv[i] = vel[i] + h2 * k2v[i];
  for (int i = 0; i < 4; i++) sq[i] = quat[i] + h2 * k2q[i];
  for (int i = 0; i < 3; i++) sw[i] = omega[i] + h2 * k2w[i];
  drone_deriv(sp, sv, sq, sw, F, mass_eff, p, k3p, k3v, k3q, k3w);
  for (int i = 0; i < 3; i++) sp[i] = pos[i] + p->dt * k3p[i];
  for (int i = 0; i < 3; i++) sv[i] = vel[i] + p->dt * k3v[i];
  for (int i = 0; i < 4; i++) sq[i] = quat[i] + p->dt * k3q[i];
  for (int i = 0; i < 3; i++) sw[i] = omega[i] + p->dt * k3w[i];
  drone_deriv(sp, sv, sq, sw, F, mass_eff, p, k4p, k4v, k4q, k4w);

  for (int i = 0; i < 3; i++)
    pos[i] = pos[i] + h6 * (((k1p[i] + 2.0f * k2p[i]) + 2.0f * k3p[i]) + k4p[i]);
  for (int i = 0; i < 3; i++)
    vel[i] = vel[i] + h6 * (((k1v[i] + 2.0f * k2v[i]) + 2.0f * k3v[i]) + k4v[i]);
  for (int i = 0; i < 4; i++)
    quat[i] = quat[i] + h6 * (((k1q[i] + 2.0f * k2q[i]) + 2.0f * k3q[i]) + k4q[i]);
  for (int i = 0; i < 3; i++)
    omega[i] = omega[i] + h6 * (((k1w[i] + 2.0f * k2w[i]) + 2.0f * k3w[i]) + k4w[i]);
  quat_normalize(quat);
}

/* ---------------------------------------------------------------- mixing -- */
/* Mirrors drone_tpu/mixing.py mix. */
static void drone_mix(const float *action, const DroneParams *p,
                      float dr_thrust, float F[4]) {
  for (int i = 0; i < 4; i++) {
    float f = (action[i] + 1.0f) * 0.5f;
    f = fminf(fmaxf(f, 0.0f), 1.0f);
    F[i] = f * p->thrust_max * dr_thrust;
  }
}

/* ----------------------------------------------------------------- tasks -- */
/* Mirrors drone_tpu/randomize.py sample_waypoint. */
static void sample_waypoint(float u0, float u1, float u2,
                            const DroneParams *p, float *t) {
  t[0] = (u0 * 2.0f - 1.0f) * p->wp_box;
  t[1] = (u1 * 2.0f - 1.0f) * p->wp_box;
  t[2] = p->wp_zmin + u2 * (p->wp_zmax - p->wp_zmin);
}

/* ----------------------------------------------------------------- reset -- */
/* Mirrors drone_tpu/env.py reset_state + drone_tpu/randomize.py init_pose. */
DRONE_API void drone_reset(float *fs, int32_t *is, const DroneParams *p,
                           uint32_t k0, uint32_t k1, uint32_t episode,
                           int task) {
  float u[2 * RESET_BLOCKS];
  episode_uniforms(k0, k1, episode, RESET_BLOCKS, u);

  fs[F_PX] = p->target[0] + (u[0] * 2.0f - 1.0f) * p->pos_radius;
  fs[F_PY] = p->target[1] + (u[1] * 2.0f - 1.0f) * p->pos_radius;
  fs[F_PZ] = p->target[2] + (u[2] * 2.0f - 1.0f) * p->pos_radius;
  fs[F_VX] = (u[3] * 2.0f - 1.0f) * p->vel_max_init;
  fs[F_VY] = (u[4] * 2.0f - 1.0f) * p->vel_max_init;
  fs[F_VZ] = (u[5] * 2.0f - 1.0f) * p->vel_max_init;
  {
    float hx = (u[6] * 2.0f - 1.0f) * p->rot_max_init * 0.5f;
    float hy = (u[7] * 2.0f - 1.0f) * p->rot_max_init * 0.5f;
    float hz = (u[8] * 2.0f - 1.0f) * p->rot_max_init * 0.5f;
    float n2 = 1.0f + (hx * hx + hy * hy + hz * hz);
    float n = sqrtf(n2);
    fs[F_QW] = 1.0f / n;
    fs[F_QX] = hx / n;
    fs[F_QY] = hy / n;
    fs[F_QZ] = hz / n;
  }
  fs[F_WX] = (u[9] * 2.0f - 1.0f) * p->omega_max_init;
  fs[F_WY] = (u[10] * 2.0f - 1.0f) * p->omega_max_init;
  fs[F_WZ] = (u[11] * 2.0f - 1.0f) * p->omega_max_init;
  fs[F_DRM] = p->dr_mass_lo + u[12] * (p->dr_mass_hi - p->dr_mass_lo);
  fs[F_DRT] = p->dr_thrust_lo + u[13] * (p->dr_thrust_hi - p->dr_thrust_lo);

  if (task == TASK_HOVER) {
    fs[F_TX] = p->target[0];
    fs[F_TY] = p->target[1];
    fs[F_TZ] = p->target[2];
  } else if (task == TASK_WAYPOINT) {
    sample_waypoint(u[14], u[15], u[16], p, &fs[F_TX]);
  } else { /* racing */
    fs[F_TX] = p->gates[0];
    fs[F_TY] = p->gates[1];
    fs[F_TZ] = p->gates[2];
  }
  fs[F_RET] = 0.0f;
  is[I_STEP] = 0;
  is[I_RESET] = (int32_t)episode;
  is[I_WPC] = 0;
  is[I_GATE] = 0;
}

/* Mirrors drone_tpu/tasks.py observation (obs written from current state). */
DRONE_API void drone_observe(const float *fs, float *obs) {
  obs[0] = fs[F_TX] - fs[F_PX];
  obs[1] = fs[F_TY] - fs[F_PY];
  obs[2] = fs[F_TZ] - fs[F_PZ];
  obs[3] = fs[F_QW];
  obs[4] = fs[F_QX];
  obs[5] = fs[F_QY];
  obs[6] = fs[F_QZ];
  obs[7] = fs[F_VX];
  obs[8] = fs[F_VY];
  obs[9] = fs[F_VZ];
  obs[10] = fs[F_WX];
  obs[11] = fs[F_WY];
  obs[12] = fs[F_WZ];
}

/* ------------------------------------------------------------------ step -- */
/* Full step including lane keys (needed for auto-reset and waypoint
 * respawn draws). Mirrors drone_tpu/env.py step exactly:
 * mix -> integrate -> reward -> task progression -> termination ->
 * auto-reset -> observe. */
DRONE_API void drone_step_keyed(float *fs, int32_t *is, const float *action,
                                const DroneParams *p, uint32_t k0, uint32_t k1,
                                int task, int integrator, float *obs,
                                float *reward, int32_t *terminated,
                                int32_t *truncated, float *ep_return,
                                int32_t *ep_length) {
  float mass_eff = p->mass * fs[F_DRM];
  float F[4];
  drone_mix(action, p, fs[F_DRT], F);

  float *pos = &fs[F_PX], *vel = &fs[F_VX], *quat = &fs[F_QW],
        *omega = &fs[F_WX];
  if (integrator == INTEG_EULER) {
    euler_step(pos, vel, quat, omega, F, mass_eff, p);
  } else {
    rk4_step(pos, vel, quat, omega, F, mass_eff, p);
  }

  int32_t step2 = is[I_STEP] + 1;

  float dx = fs[F_TX] - fs[F_PX];
  float dy = fs[F_TY] - fs[F_PY];
  float dz = fs[F_TZ] - fs[F_PZ];
  float d2 = dx * dx + dy * dy + dz * dz;
  float r = 1.0f / (1.0f + d2);
  float v2 = fs[F_VX] * fs[F_VX] + fs[F_VY] * fs[F_VY] + fs[F_VZ] * fs[F_VZ];
  r = r - p->c_vel * v2;
  float w2 = fs[F_WX] * fs[F_WX] + fs[F_WY] * fs[F_WY] + fs[F_WZ] * fs[F_WZ];
  r = r - p->c_spin * w2;
  float a2 = action[0] * action[0] + action[1] * action[1] +
             action[2] * action[2] + action[3] * action[3];
  r = r - p->c_act * a2;

  if (task == TASK_WAYPOINT) {
    int reached = d2 < p->reach_tol2;
    if (reached) {
      r = r + p->reach_bonus;
      uint32_t episode = (uint32_t)is[I_RESET];
      uint32_t j0 = (uint32_t)WP_BLOCK0 + (uint32_t)is[I_WPC] * 2u;
      uint32_t ba[2], bb[2];
      drone_threefry2x32(k0, k1, episode, j0, ba);
      drone_threefry2x32(k0, k1, episode, j0 + 1u, bb);
      float w0 = bits_to_uniform(ba[0]);
      float w1 = bits_to_uniform(ba[1]);
      float w2u = bits_to_uniform(bb[0]);
      sample_waypoint(w0, w1, w2u, p, &fs[F_TX]);
      is[I_WPC] = is[I_WPC] + 1;
    }
  } else if (task == TASK_RACING) {
    int reached = d2 < p->reach_tol2;
    if (reached) {
      r = r + p->reach_bonus;
      /* max(n_gates, 1): mod-by-zero is SIGFPE in C but returns 0 in XLA;
       * both sides use the clamped modulus (identical when n_gates >= 1) */
      int32_t ng = p->n_gates > 1 ? p->n_gates : 1;
      is[I_GATE] = (is[I_GATE] + 1) % ng;
      fs[F_TX] = p->gates[is[I_GATE] * 3 + 0];
      fs[F_TY] = p->gates[is[I_GATE] * 3 + 1];
      fs[F_TZ] = p->gates[is[I_GATE] * 3 + 2];
      is[I_WPC] = is[I_WPC] + 1;
    }
  }

  float qx = fs[F_QX], qy = fs[F_QY];
  float upz = 1.0f - 2.0f * (qx * qx + qy * qy);
  int crashed = (fs[F_PZ] < 0.0f);
  crashed = crashed | (upz < p->tilt_min);
  crashed = crashed | (fabsf(fs[F_PX]) > p->bound);
  crashed = crashed | (fabsf(fs[F_PY]) > p->bound);
  crashed = crashed | (fs[F_PZ] > p->bound);
  int trunc = (step2 >= p->horizon) && !crashed;
  int done = crashed || trunc;
  if (crashed) r = r + p->crash_penalty;
  float ret2 = fs[F_RET] + r;

  *reward = r;
  *terminated = crashed;
  *truncated = trunc;
  *ep_return = done ? ret2 : 0.0f;
  *ep_length = done ? step2 : 0;

  if (done) {
    uint32_t episode2 = (uint32_t)is[I_RESET] + 1u;
    drone_reset(fs, is, p, k0, k1, episode2, task);
  } else {
    fs[F_RET] = ret2;
    is[I_STEP] = step2;
  }
  drone_observe(fs, obs);
}

/* --------------------------------------------------------------- rollout -- */
/* Run T steps for one lane, recording everything. Single ctypes call for the
 * parity harness (fast golden-trajectory generation).
 * actions: [T][4]; out_fstate: [T][FSTATE_DIM] (state AFTER each step incl.
 * auto-reset); out_obs: [T][OBS_DIM]; out_reward/term/trunc/epret/eplen: [T].
 */
DRONE_API void drone_rollout(float *fs, int32_t *is, const float *actions,
                             int T, const DroneParams *p, uint32_t k0,
                             uint32_t k1, int task, int integrator,
                             float *out_fstate, float *out_obs,
                             float *out_reward, int32_t *out_term,
                             int32_t *out_trunc, float *out_epret,
                             int32_t *out_eplen) {
  for (int t = 0; t < T; t++) {
    drone_step_keyed(fs, is, &actions[t * ACT_DIM], p, k0, k1, task,
                     integrator, &out_obs[t * OBS_DIM], &out_reward[t],
                     &out_term[t], &out_trunc[t], &out_epret[t],
                     &out_eplen[t]);
    memcpy(&out_fstate[t * FSTATE_DIM], fs, FSTATE_DIM * sizeof(float));
  }
}

/* Batched versions: n independent lanes (lane l uses its own key, derived by
 * the caller, stored in keys[2*l]). Used by vector-oracle tests. */
DRONE_API void drone_reset_batch(float *fs, int32_t *is, const DroneParams *p,
                                 const uint32_t *keys, uint32_t episode,
                                 int task, int n) {
  for (int l = 0; l < n; l++) {
    drone_reset(&fs[l * FSTATE_DIM], &is[l * ISTATE_DIM], p, keys[2 * l],
                keys[2 * l + 1], episode, task);
  }
}

DRONE_API void drone_step_batch(float *fs, int32_t *is, const float *actions,
                                const DroneParams *p, const uint32_t *keys,
                                int task, int integrator, int n, float *obs,
                                float *reward, int32_t *terminated,
                                int32_t *truncated, float *ep_return,
                                int32_t *ep_length) {
  for (int l = 0; l < n; l++) {
    drone_step_keyed(&fs[l * FSTATE_DIM], &is[l * ISTATE_DIM],
                     &actions[l * ACT_DIM], p, keys[2 * l], keys[2 * l + 1],
                     task, integrator, &obs[l * OBS_DIM], &reward[l],
                     &terminated[l], &truncated[l], &ep_return[l],
                     &ep_length[l]);
  }
}
