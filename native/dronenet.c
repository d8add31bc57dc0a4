/* dronenet.c — see dronenet.h. Cites: SURVEY.md §2.2 #12 (PufferNet role). */

#include "dronenet.h"

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int dronenet_load(DroneNet *net, const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) return 1;
  memset(net, 0, sizeof(*net));
  int32_t header[3];
  if (fread(header, 4, 3, f) != 3 || header[0] != DRNW_MAGIC || header[1] != 1) {
    fclose(f);
    return 2;
  }
  net->n_layers = header[2];
  if (net->n_layers <= 0 || net->n_layers > DRNW_MAX_LAYERS) {
    fclose(f);
    return 3;
  }
  for (int i = 0; i < net->n_layers; i++) {
    DroneNetLayer *L = &net->layers[i];
    int32_t dims[3];
    if (fread(dims, 4, 3, f) != 3) goto fail;
    L->in_dim = dims[0];
    L->out_dim = dims[1];
    L->activation = dims[2];
    L->w = malloc((size_t)L->in_dim * L->out_dim * 4);
    L->b = malloc((size_t)L->out_dim * 4);
    if (!L->w || !L->b) goto fail;
    if (fread(L->w, 4, (size_t)L->in_dim * L->out_dim, f) !=
        (size_t)L->in_dim * L->out_dim)
      goto fail;
    if (fread(L->b, 4, (size_t)L->out_dim, f) != (size_t)L->out_dim) goto fail;
  }
  net->in_dim = net->layers[0].in_dim;
  net->out_dim = net->layers[net->n_layers - 1].out_dim;
  fclose(f);
  return 0;
fail:
  fclose(f);
  dronenet_free(net);
  return 4;
}

void dronenet_free(DroneNet *net) {
  for (int i = 0; i < net->n_layers; i++) {
    free(net->layers[i].w);
    free(net->layers[i].b);
    net->layers[i].w = net->layers[i].b = NULL;
  }
  net->n_layers = 0;
}

int dronenet_scratch_size(const DroneNet *net) {
  int m = net->in_dim;
  for (int i = 0; i < net->n_layers; i++)
    if (net->layers[i].out_dim > m) m = net->layers[i].out_dim;
  return 2 * m;
}

void dronenet_forward(const DroneNet *net, const float *in, float *out,
                      float *scratch) {
  int half = dronenet_scratch_size(net) / 2;
  float *cur = scratch, *nxt = scratch + half;
  memcpy(cur, in, (size_t)net->in_dim * 4);
  for (int i = 0; i < net->n_layers; i++) {
    const DroneNetLayer *L = &net->layers[i];
    for (int j = 0; j < L->out_dim; j++) {
      float acc = L->b[j];
      for (int k = 0; k < L->in_dim; k++) acc += cur[k] * L->w[k * L->out_dim + j];
      nxt[j] = (L->activation == DRNW_ACT_TANH) ? tanhf(acc) : acc;
    }
    float *tmp = cur;
    cur = nxt;
    nxt = tmp;
  }
  memcpy(out, cur, (size_t)net->out_dim * 4);
}
