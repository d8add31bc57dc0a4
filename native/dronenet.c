/* dronenet.c — see dronenet.h. Cites: SURVEY.md §2.2 #12 (PufferNet role). */

#include "dronenet.h"

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static float *read_floats(FILE *f, size_t n) {
  float *p = malloc(n * 4);
  if (!p) return NULL;
  if (fread(p, 4, n, f) != n) {
    free(p);
    return NULL;
  }
  return p;
}

static int dims_ok(int32_t in, int32_t out) {
  return in > 0 && out > 0 && in <= (1 << 16) && out <= (1 << 16);
}

static int load_dense(FILE *f, DroneNetLayer *L) {
  int32_t dims[3];
  if (fread(dims, 4, 3, f) != 3) return 1;
  if (!dims_ok(dims[0], dims[1])) return 1;
  L->kind = DRNW_KIND_DENSE;
  L->in_dim = dims[0];
  L->out_dim = dims[1];
  L->activation = dims[2];
  L->w = read_floats(f, (size_t)L->in_dim * L->out_dim);
  L->b = read_floats(f, (size_t)L->out_dim);
  return !(L->w && L->b);
}

static int load_lstm(FILE *f, DroneNetLayer *L) {
  int32_t dims[2];
  if (fread(dims, 4, 2, f) != 2) return 1;
  if (!dims_ok(dims[0], dims[1])) return 1;
  L->kind = DRNW_KIND_LSTM;
  L->in_dim = dims[0];
  L->out_dim = dims[1]; /* hidden */
  size_t in = L->in_dim, hid = L->out_dim;
  for (int g = 0; g < 4; g++)
    if (!(L->wi[g] = read_floats(f, in * hid))) return 1;
  for (int g = 0; g < 4; g++)
    if (!(L->wh[g] = read_floats(f, hid * hid))) return 1;
  for (int g = 0; g < 4; g++)
    if (!(L->bh[g] = read_floats(f, hid))) return 1;
  return 0;
}

int dronenet_load(DroneNet *net, const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) return 1;
  memset(net, 0, sizeof(*net));
  int32_t header[3];
  if (fread(header, 4, 3, f) != 3 || header[0] != DRNW_MAGIC ||
      (header[1] != 1 && header[1] != 2)) {
    fclose(f);
    return 2;
  }
  int version = header[1];
  net->n_layers = header[2];
  if (net->n_layers <= 0 || net->n_layers > DRNW_MAX_LAYERS) {
    fclose(f);
    return 3;
  }
  for (int i = 0; i < net->n_layers; i++) {
    DroneNetLayer *L = &net->layers[i];
    int32_t kind = DRNW_KIND_DENSE;
    if (version >= 2 && fread(&kind, 4, 1, f) != 1) goto fail;
    if (kind == DRNW_KIND_DENSE) {
      if (load_dense(f, L)) goto fail;
    } else if (kind == DRNW_KIND_LSTM) {
      if (load_lstm(f, L)) goto fail;
      L->state_off = net->state_size;
      net->state_size += 2 * L->out_dim; /* h then c */
    } else {
      goto fail;
    }
  }
  /* the layer chain must be consistent: a malformed/corrupt file whose
   * layer i claims in_dim != layer i-1's out_dim would make dense_fwd/
   * lstm_fwd read past the scratch ping-pong buffer (sized from the
   * declared dims) — reject it here, not in the inner loops */
  for (int i = 1; i < net->n_layers; i++) {
    if (net->layers[i].in_dim != net->layers[i - 1].out_dim) goto fail;
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
    DroneNetLayer *L = &net->layers[i];
    free(L->w);
    free(L->b);
    for (int g = 0; g < 4; g++) {
      free(L->wi[g]);
      free(L->wh[g]);
      free(L->bh[g]);
    }
    memset(L, 0, sizeof(*L));
  }
  net->n_layers = 0;
  net->state_size = 0;
}

int dronenet_scratch_size(const DroneNet *net) {
  int m = net->in_dim;
  for (int i = 0; i < net->n_layers; i++)
    if (net->layers[i].out_dim > m) m = net->layers[i].out_dim;
  return 2 * m;
}

void dronenet_reset_state(const DroneNet *net, float *state) {
  if (state && net->state_size)
    memset(state, 0, (size_t)net->state_size * 4);
}

static float sigmoidf_(float x) { return 1.0f / (1.0f + expf(-x)); }

/* y[j] = act(b[j] + sum_k x[k] W[k*out+j]) */
static void dense_fwd(const DroneNetLayer *L, const float *x, float *y) {
  for (int j = 0; j < L->out_dim; j++) {
    float acc = L->b[j];
    for (int k = 0; k < L->in_dim; k++) acc += x[k] * L->w[k * L->out_dim + j];
    y[j] = (L->activation == DRNW_ACT_TANH) ? tanhf(acc) : acc;
  }
}

static void lstm_fwd(const DroneNetLayer *L, const float *x, float *y,
                     float *state) {
  int hid = L->out_dim;
  float *h = state + L->state_off;
  float *c = h + hid;
  /* gates in flax order i, f, g, o */
  for (int j = 0; j < hid; j++) {
    float acc[4];
    for (int g = 0; g < 4; g++) {
      float a = L->bh[g][j];
      for (int k = 0; k < L->in_dim; k++) a += x[k] * L->wi[g][k * hid + j];
      for (int k = 0; k < hid; k++) a += h[k] * L->wh[g][k * hid + j];
      acc[g] = a;
    }
    float i_ = sigmoidf_(acc[0]);
    float f_ = sigmoidf_(acc[1]);
    float g_ = tanhf(acc[2]);
    float o_ = sigmoidf_(acc[3]);
    float c2 = f_ * c[j] + i_ * g_;
    y[j] = o_ * tanhf(c2);
    /* stash c' in scratch-side: write after the loop needs old h intact,
       but h is only read via wh — updating c[j] now is safe, h later */
    c[j] = c2;
  }
  memcpy(h, y, (size_t)hid * 4);
}

void dronenet_forward(const DroneNet *net, const float *in, float *out,
                      float *scratch, float *state) {
  int half = dronenet_scratch_size(net) / 2;
  float *cur = scratch, *nxt = scratch + half;
  memcpy(cur, in, (size_t)net->in_dim * 4);
  for (int i = 0; i < net->n_layers; i++) {
    const DroneNetLayer *L = &net->layers[i];
    if (L->kind == DRNW_KIND_LSTM)
      lstm_fwd(L, cur, nxt, state);
    else
      dense_fwd(L, cur, nxt);
    float *tmp = cur;
    cur = nxt;
    nxt = tmp;
  }
  memcpy(out, cur, (size_t)net->out_dim * 4);
}
