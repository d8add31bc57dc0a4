/* dronenet.h — pure-C policy forward pass (MLP + LSTM) over exported flat
 * weights.
 *
 * Rebuild of the reference's PufferNet (SURVEY.md §2.2 #12:
 * `[U] pufferlib/puffernet.h` — C linear + LSTM + activation forward so
 * demos run trained policies with zero Python). Reads the DRNW format
 * written by drone_tpu/models/export.py:
 *
 *   v1: dense-only  — header(magic, 1, n_layers); per layer
 *       (in, out, act, W[in*out] row-major, b[out])
 *   v2: mixed       — header(magic, 2, n_layers); per layer int32 kind
 *       kind 0 dense: (in, out, act, W, b)
 *       kind 1 lstm:  (in, hidden) then gate kernels in flax order
 *                     Wi_i Wi_f Wi_g Wi_o  [in*hidden each]  (no input bias)
 *                     Wh_i Wh_f Wh_g Wh_o  [hidden*hidden each]
 *                     bh_i bh_f bh_g bh_o  [hidden each]
 *       semantics (flax LSTMCell):
 *         i=sig(xWi_i+hWh_i+b_i) f=sig(...) g=tanh(...) o=sig(...)
 *         c'=f*c+i*g ; h'=o*tanh(c')
 */
#ifndef DRONENET_H
#define DRONENET_H

#include <stdint.h>

#define DRNW_MAGIC 0x44524E57
#define DRNW_ACT_NONE 0
#define DRNW_ACT_TANH 1
#define DRNW_KIND_DENSE 0
#define DRNW_KIND_LSTM 1
#define DRNW_MAX_LAYERS 16

typedef struct {
  int32_t kind;                    /* DRNW_KIND_* */
  int32_t in_dim, out_dim;         /* lstm: out_dim == hidden */
  int32_t activation;              /* dense only */
  float *w, *b;                    /* dense */
  float *wi[4], *wh[4], *bh[4];    /* lstm gates in order i, f, g, o */
  int32_t state_off;               /* lstm: offset of (h, c) in state vec */
} DroneNetLayer;

typedef struct {
  int32_t n_layers;
  DroneNetLayer layers[DRNW_MAX_LAYERS];
  int32_t in_dim, out_dim;
  int32_t state_size;              /* total floats of recurrent state (h+c) */
} DroneNet;

/* Load a DRNW file (v1 or v2). Returns 0 on success. */
int dronenet_load(DroneNet *net, const char *path);
void dronenet_free(DroneNet *net);

/* Forward one observation: in[net->in_dim] -> out[net->out_dim].
 * scratch must hold dronenet_scratch_size(net) floats.
 * state must hold net->state_size floats (pass NULL iff state_size == 0);
 * it is updated in place — zero it at episode boundaries. */
void dronenet_forward(const DroneNet *net, const float *in, float *out,
                      float *scratch, float *state);
void dronenet_reset_state(const DroneNet *net, float *state);
int dronenet_scratch_size(const DroneNet *net);

#endif
