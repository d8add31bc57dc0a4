/* dronenet.h — pure-C MLP forward pass over exported flat weights.
 *
 * Rebuild of the reference's PufferNet (SURVEY.md §2.2 #12:
 * `[U] pufferlib/puffernet.h` — C forward pass so demos run trained policies
 * with zero Python). Reads the DRNW format written by
 * drone_tpu/models/export.py.
 */
#ifndef DRONENET_H
#define DRONENET_H

#include <stdint.h>

#define DRNW_MAGIC 0x44524E57
#define DRNW_ACT_NONE 0
#define DRNW_ACT_TANH 1
#define DRNW_MAX_LAYERS 16

typedef struct {
  int32_t in_dim, out_dim, activation;
  float *w;  /* row-major [in_dim][out_dim] */
  float *b;  /* [out_dim] */
} DroneNetLayer;

typedef struct {
  int32_t n_layers;
  DroneNetLayer layers[DRNW_MAX_LAYERS];
  int32_t in_dim, out_dim;
} DroneNet;

/* Load a DRNW file. Returns 0 on success. */
int dronenet_load(DroneNet *net, const char *path);
void dronenet_free(DroneNet *net);
/* Forward one observation: in[net->in_dim] -> out[net->out_dim].
 * scratch must hold at least the widest layer (use dronenet_scratch_size). */
void dronenet_forward(const DroneNet *net, const float *in, float *out,
                      float *scratch);
int dronenet_scratch_size(const DroneNet *net);

#endif
