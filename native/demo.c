/* demo.c — standalone deployment demo: trained policy + C env, zero Python.
 *
 * Rebuild of the reference's demo binary (SURVEY.md §2.2 #3, §3.3:
 * `[U] pufferlib/ocean/drone/drone.c` main() — loads flat weights, runs
 * PufferNet forward + c_step). The raylib 3-D client is replaced by a
 * trajectory dump consumed by viz/viewer.py (raylib is not in this image;
 * the renderer is not on the perf path, SURVEY.md §2.3).
 *
 * Usage: drone_demo <policy.drnw> [params.bin] [episodes] [task] [seed] [integrator]
 *   task: 0=hover 1=waypoint 2=racing; integrator: 0=euler 1=rk4
 *   params.bin: "-" for defaults, else the versioned dump written by
 *   `drone_tpu.cli export` (magic 'DRNP', version, struct size, struct —
 *   a raw struct with no header is rejected, so a stale or mis-built
 *   params file can never be silently reinterpreted).
 *   Writes trajectory of episode 0 to trajectory.csv
 *   (t,x,y,z,tx,ty,tz,reward,done,a0..a3 — actions at full precision for
 *   the C-vs-Python bounded-horizon agreement test).
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#include "dronenet.h"
#include "../oracle/drone_oracle.h" /* DroneParams + oracle API */

/* Defaults mirror drone_tpu/types.py default_params(task). */
static DroneParams default_params(int task) {
  DroneParams p;
  memset(&p, 0, sizeof(p));
  p.mass = 0.75f; p.gravity = 9.81f; p.arm_l = 0.08f; p.thrust_max = 4.6f;
  p.torque_coef = 0.016f;
  p.inertia_x = 0.0023f; p.inertia_y = 0.0023f; p.inertia_z = 0.004f;
  p.drag_lin = 0.10f; p.drag_ang = 0.003f; p.dt = 0.01f;
  p.target[0] = 0.0f; p.target[1] = 0.0f; p.target[2] = 1.5f;
  p.bound = 5.0f; p.tilt_min = 0.0f;
  p.horizon = task == 1 ? 1500 : 1000; /* waypoint runs longer, as in types.py */
  p.c_vel = 0.02f; p.c_spin = 0.01f; p.c_act = 0.01f;
  p.crash_penalty = -10.0f; p.reach_bonus = 10.0f; p.reach_tol2 = 0.09f;
  p.pos_radius = 1.0f; p.vel_max_init = 0.5f; p.rot_max_init = 0.5f;
  p.omega_max_init = 0.5f;
  p.dr_mass_lo = 1.0f; p.dr_mass_hi = 1.0f;
  p.dr_thrust_lo = 1.0f; p.dr_thrust_hi = 1.0f;
  p.wp_box = 3.0f; p.wp_zmin = 0.8f; p.wp_zmax = 4.0f;
  p.gates[0] = 2.0f;  p.gates[1] = 0.0f;  p.gates[2] = 1.5f;
  p.gates[3] = 0.0f;  p.gates[4] = 2.0f;  p.gates[5] = 1.5f;
  p.gates[6] = -2.0f; p.gates[7] = 0.0f;  p.gates[8] = 1.5f;
  p.gates[9] = 0.0f;  p.gates[10] = -2.0f; p.gates[11] = 1.5f;
  p.n_gates = 4;
  return p;
}

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr,
            "usage: %s <policy.drnw> [params.bin] [episodes] [task] [seed] [integrator]\n",
            argv[0]);
    return 2;
  }
  DroneNet net;
  if (dronenet_load(&net, argv[1])) {
    fprintf(stderr, "failed to load policy %s\n", argv[1]);
    return 1;
  }
  if (net.in_dim != DRONE_OBS_DIM || net.out_dim != DRONE_ACT_DIM) {
    fprintf(stderr,
            "policy io mismatch: %s has in=%d out=%d, env needs in=%d out=%d\n",
            argv[1], net.in_dim, net.out_dim, DRONE_OBS_DIM, DRONE_ACT_DIM);
    dronenet_free(&net);
    return 1;
  }
  int episodes = argc > 3 ? atoi(argv[3]) : 8;
  int task = argc > 4 ? atoi(argv[4]) : 0;
  uint32_t seed = argc > 5 ? (uint32_t)strtoul(argv[5], NULL, 10) : 42u;
  int integrator = argc > 6 ? atoi(argv[6]) : 0; /* 0=euler 1=rk4 */
  if (task < 0 || task > 2) {
    /* ids >= 3 would fall into drone_reset's racing else-branch but fail
     * drone_step_keyed's exact task checks — an inconsistent hybrid env */
    fprintf(stderr, "task must be 0 (hover), 1 (waypoint) or 2 (racing), "
            "got %d\n", task);
    return 2;
  }
  if (integrator < 0 || integrator > 1) {
    fprintf(stderr, "integrator must be 0 (euler) or 1 (rk4), got %d\n",
            integrator);
    return 2;
  }
  DroneParams p = default_params(task);
  if (argc > 2 && strcmp(argv[2], "-") != 0) {
    FILE *f = fopen(argv[2], "rb");
    uint32_t hdr[3]; /* magic 'DRNP', version, sizeof(DroneParams) */
    if (!f || fread(hdr, sizeof(hdr), 1, f) != 1) {
      fprintf(stderr, "failed to load params %s\n", argv[2]);
      return 1;
    }
    if (hdr[0] != 0x44524E50u) {
      fprintf(stderr, "%s: bad magic 0x%08x (not a drone params dump; "
              "re-export with `drone_tpu.cli export`)\n", argv[2], hdr[0]);
      return 1;
    }
    if (hdr[1] != 1u) {
      fprintf(stderr, "%s: unsupported params version %u (binary knows 1)\n",
              argv[2], hdr[1]);
      return 1;
    }
    if (hdr[2] != (uint32_t)sizeof(DroneParams)) {
      fprintf(stderr, "%s: struct size %u != compiled DroneParams %zu — "
              "params file and binary are out of sync\n",
              argv[2], hdr[2], sizeof(DroneParams));
      return 1;
    }
    if (fread(&p, sizeof(p), 1, f) != 1) {
      fprintf(stderr, "failed to read params payload %s\n", argv[2]);
      return 1;
    }
    fclose(f);
  }
  float *scratch = malloc((size_t)dronenet_scratch_size(&net) * 4);
  float *state = net.state_size ? malloc((size_t)net.state_size * 4) : NULL;
  dronenet_reset_state(&net, state); /* zero recurrent state (LSTM policies) */
  float fs[19];
  int32_t is[4];
  uint32_t key[2];
  drone_lane_key(seed, 0, key);
  drone_reset(fs, is, &p, key[0], key[1], 0, task);

  FILE *traj = fopen("trajectory.csv", "w");
  /* done=1 rows hold the NEXT episode's spawn state (the step auto-resets),
   * so the viewer starts a fresh trail segment there instead of drawing a
   * teleport from the crash site back to the spawn point. */
  if (traj)
    fprintf(traj, "t,x,y,z,tx,ty,tz,reward,done,a0,a1,a2,a3\n");

  float obs[13], action[4], reward, ep_return;
  int32_t term, trunc, ep_length;
  drone_observe(fs, obs);
  int done_eps = 0;
  double ret_sum = 0.0, len_sum = 0.0;
  long t = 0;
  while (done_eps < episodes) {
    dronenet_forward(&net, obs, action, scratch, state);
    drone_step_keyed(fs, is, action, &p, key[0], key[1], task, integrator,
                     obs, &reward, &term, &trunc, &ep_return, &ep_length);
    if (traj && done_eps == 0)
      fprintf(traj,
              "%ld,%.4f,%.4f,%.4f,%.4f,%.4f,%.4f,%.4f,%d,%.8e,%.8e,%.8e,%.8e\n",
              t, fs[0], fs[1], fs[2], fs[13], fs[14], fs[15], reward,
              (term || trunc) ? 1 : 0, action[0], action[1], action[2],
              action[3]);
    if (term || trunc) {
      printf("episode %d: return %.2f length %d %s\n", done_eps, ep_return,
             ep_length, term ? "(crash)" : "(horizon)");
      ret_sum += ep_return;
      len_sum += ep_length;
      done_eps++;
      dronenet_reset_state(&net, state); /* new episode -> zero carry */
    }
    t++;
    if (t > 1000000) break; /* safety */
  }
  if (traj) fclose(traj);
  printf("mean return %.2f  mean length %.1f  (%d episodes, pure C)\n",
         ret_sum / (done_eps ? done_eps : 1),
         len_sum / (done_eps ? done_eps : 1), done_eps);
  dronenet_free(&net);
  free(scratch);
  free(state);
  return 0;
}
