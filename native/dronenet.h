/* dronenet.h — pure-C policy forward pass (MLP + LSTM + pixel CNN) over
 * exported flat weights.
 *
 * Rebuild of the reference's PufferNet (SURVEY.md §2.2 #12:
 * `[U] pufferlib/puffernet.h` — C linear + LSTM + conv + activation forward
 * so demos run trained policies with zero Python). Reads the DRNW format
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
 *   v3: adds the pixel-CNN policy (PatchCNNActorCritic):
 *       kind 2 render: (res, n_chan, sigma:f32) — obs[13] -> the body-frame
 *                      sensor image (res, res, n_chan) row-major HWC, the C
 *                      mirror of drone_tpu/pixels.py obs_to_pixels
 *       kind 3 conv:   (h, w, cin, patch, cout, act) then
 *                      W[patch*patch*cin*cout] in flax (kh, kw, cin, cout)
 *                      C-order, b[cout] — a kernel==stride (patchify) conv
 *                      over an HWC image; output ((h/patch), (w/patch),
 *                      cout) row-major HWC, so the flatten into the next
 *                      dense layer is flax's reshape(-1) order
 */
#ifndef DRONENET_H
#define DRONENET_H

#include <stdint.h>

#define DRNW_MAGIC 0x44524E57
#define DRNW_ACT_NONE 0
#define DRNW_ACT_TANH 1
#define DRNW_ACT_RELU 2
#define DRNW_KIND_DENSE 0
#define DRNW_KIND_LSTM 1
#define DRNW_KIND_RENDER 2
#define DRNW_KIND_CONV 3
#define DRNW_OBS_DIM 13
#define DRNW_RENDER_CHANNELS 4
#define DRNW_MAX_LAYERS 16

typedef struct {
  int32_t kind;                    /* DRNW_KIND_* */
  int32_t in_dim, out_dim;         /* total floats in/out (lstm: hidden) */
  int32_t activation;              /* dense / conv */
  float *w, *b;                    /* dense / conv */
  float *wi[4], *wh[4], *bh[4];    /* lstm gates in order i, f, g, o */
  int32_t state_off;               /* lstm: offset of (h, c) in state vec */
  int32_t res;                     /* render: image side */
  float sigma;                     /* render: splat width */
  int32_t h, wdt, cin, patch, cout; /* conv geometry (kernel == stride) */
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
