/* sanitize_check — standalone ASan/UBSan exercise of the C oracle.
 *
 * SURVEY.md §5 (race detection / sanitizers): the reference wired no
 * sanitizers at all; here the oracle — the only C on the correctness path —
 * is driven through every task x integrator combination under
 * -fsanitize=address,undefined (built by `make -C oracle sanitize_check`).
 * Exits 0 iff no sanitizer report fired. Run by tests/test_sanitize.py.
 */

#include <stdint.h>
#include <stdio.h>
#include <string.h>

#include "drone_oracle.h" /* DroneParams + oracle API (single definition) */

static DroneParams defaults(void) {
  DroneParams p;
  memset(&p, 0, sizeof(p));
  p.mass = 0.75f; p.gravity = 9.81f; p.arm_l = 0.08f; p.thrust_max = 4.6f;
  p.torque_coef = 0.016f;
  p.inertia_x = 0.0023f; p.inertia_y = 0.0023f; p.inertia_z = 0.004f;
  p.drag_lin = 0.10f; p.drag_ang = 0.003f; p.dt = 0.01f;
  p.target[2] = 1.5f;
  p.bound = 5.0f; p.horizon = 200;
  p.c_vel = 0.02f; p.c_spin = 0.01f; p.c_act = 0.01f;
  p.crash_penalty = -10.0f; p.reach_bonus = 10.0f; p.reach_tol2 = 0.09f;
  p.pos_radius = 1.0f; p.vel_max_init = 0.5f; p.rot_max_init = 0.5f;
  p.omega_max_init = 0.5f;
  p.dr_mass_lo = 0.8f; p.dr_mass_hi = 1.2f;
  p.dr_thrust_lo = 0.9f; p.dr_thrust_hi = 1.1f;
  p.wp_box = 3.0f; p.wp_zmin = 0.8f; p.wp_zmax = 4.0f;
  p.gates[0] = 2.0f;  p.gates[2] = 1.5f;
  p.gates[4] = 2.0f;  p.gates[5] = 1.5f;
  p.gates[6] = -2.0f; p.gates[8] = 1.5f;
  p.gates[10] = -2.0f; p.gates[11] = 1.5f;
  p.n_gates = 4;
  return p;
}

int main(void) {
  DroneParams p = defaults();
  float fs[19], obs[13], action[4], reward, ep_return;
  int32_t is[4], term, trunc, ep_length;
  uint32_t key[2];
  long total = 0;
  for (int task = 0; task < 3; task++) {
    for (int integ = 0; integ < 2; integ++) {
      for (uint32_t lane = 0; lane < 4; lane++) {
        drone_lane_key(7u, lane, key);
        drone_reset(fs, is, &p, key[0], key[1], 0, task);
        for (int t = 0; t < 3000; t++) {
          /* deterministic bang-bang action pattern incl. boundary values */
          action[0] = (t % 3 == 0) ? 1.0f : -1.0f;
          action[1] = (t % 5 == 0) ? -1.0f : 0.25f;
          action[2] = 0.9f;
          action[3] = (t % 7 == 0) ? 1.0f : 0.1f;
          drone_step_keyed(fs, is, action, &p, key[0], key[1], task, integ,
                           obs, &reward, &term, &trunc, &ep_return,
                           &ep_length);
          total++;
        }
      }
    }
  }
  printf("SANITIZE_OK steps=%ld\n", total);
  return 0;
}
