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

/* activate_() treats unknown ids as identity, so an unvalidated act from a
 * newer/corrupt exporter would silently degrade to wrong inference instead
 * of failing the load — reject format drift here. */
static int act_ok(int32_t act) {
  return act == DRNW_ACT_NONE || act == DRNW_ACT_TANH || act == DRNW_ACT_RELU;
}

static int load_dense(FILE *f, DroneNetLayer *L) {
  int32_t dims[3];
  if (fread(dims, 4, 3, f) != 3) return 1;
  if (!dims_ok(dims[0], dims[1]) || !act_ok(dims[2])) return 1;
  L->kind = DRNW_KIND_DENSE;
  L->in_dim = dims[0];
  L->out_dim = dims[1];
  L->activation = dims[2];
  L->w = read_floats(f, (size_t)L->in_dim * L->out_dim);
  L->b = read_floats(f, (size_t)L->out_dim);
  return !(L->w && L->b);
}

static int load_render(FILE *f, DroneNetLayer *L) {
  int32_t dims[2];
  float sigma;
  if (fread(dims, 4, 2, f) != 2 || fread(&sigma, 4, 1, f) != 1) return 1;
  if (dims[0] < 2 || dims[0] > 256 || dims[1] != DRNW_RENDER_CHANNELS ||
      !(sigma > 0.0f))
    return 1;
  L->kind = DRNW_KIND_RENDER;
  L->res = dims[0];
  L->sigma = sigma;
  L->in_dim = DRNW_OBS_DIM;
  L->out_dim = dims[0] * dims[0] * dims[1];
  return 0;
}

static int load_conv(FILE *f, DroneNetLayer *L) {
  int32_t d[6]; /* h, w, cin, patch, cout, act */
  if (fread(d, 4, 6, f) != 6) return 1;
  if (d[0] <= 0 || d[1] <= 0 || d[2] <= 0 || d[3] <= 0 || d[4] <= 0 ||
      d[0] > 4096 || d[1] > 4096 || d[2] > 4096 || d[4] > 4096 ||
      d[0] % d[3] != 0 || d[1] % d[3] != 0 || !act_ok(d[5]))
    return 1;
  L->kind = DRNW_KIND_CONV;
  L->h = d[0];
  L->wdt = d[1];
  L->cin = d[2];
  L->patch = d[3];
  L->cout = d[4];
  L->activation = d[5];
  L->in_dim = d[0] * d[1] * d[2];
  L->out_dim = (d[0] / d[3]) * (d[1] / d[3]) * d[4];
  L->w = read_floats(f, (size_t)d[3] * d[3] * d[2] * d[4]);
  L->b = read_floats(f, (size_t)d[4]);
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
      header[1] < 1 || header[1] > 3) {
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
    } else if (kind == DRNW_KIND_RENDER && version >= 3) {
      if (load_render(f, L)) goto fail;
    } else if (kind == DRNW_KIND_CONV && version >= 3) {
      if (load_conv(f, L)) goto fail;
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

static float activate_(int32_t act, float v) {
  if (act == DRNW_ACT_TANH) return tanhf(v);
  if (act == DRNW_ACT_RELU) return v > 0.0f ? v : 0.0f;
  return v;
}

/* y[j] = act(b[j] + sum_k x[k] W[k*out+j]) */
static void dense_fwd(const DroneNetLayer *L, const float *x, float *y) {
  for (int j = 0; j < L->out_dim; j++) {
    float acc = L->b[j];
    for (int k = 0; k < L->in_dim; k++) acc += x[k] * L->w[k * L->out_dim + j];
    y[j] = activate_(L->activation, acc);
  }
}

/* C mirror of drone_tpu/pixels.py obs_to_pixels: obs[13] -> 4 Gaussian
 * splat channels (target direction, artificial horizon, velocity, body
 * rates) on a res x res grid, row-major HWC. */
static void render_fwd(const DroneNetLayer *L, const float *obs, float *img) {
  const float *rel = obs, *q = obs + 3, *vel = obs + 7, *om = obs + 10;
  float w = q[0], x = q[1], y = q[2], z = q[3];
  /* rows of R^T (world->body), as pixels.body_rotation_t */
  float r[3][3] = {{1.0f - 2.0f * (y * y + z * z), 2.0f * (x * y + w * z),
                    2.0f * (x * z - w * y)},
                   {2.0f * (x * y - w * z), 1.0f - 2.0f * (x * x + z * z),
                    2.0f * (y * z + w * x)},
                   {2.0f * (x * z + w * y), 2.0f * (y * z - w * x),
                    1.0f - 2.0f * (x * x + y * y)}};
  float v_b[4][3]; /* body-frame cue vectors per channel (1 = up = R^T e_z) */
  for (int k = 0; k < 3; k++) {
    v_b[0][k] = r[k][0] * rel[0] + r[k][1] * rel[1] + r[k][2] * rel[2];
    v_b[1][k] = r[k][2];
    v_b[2][k] = r[k][0] * vel[0] + r[k][1] * vel[1] + r[k][2] * vel[2];
    v_b[3][k] = om[k]; /* omega is already body-frame rates */
  }
  float u0[4], u1[4], amp[4];
  for (int c = 0; c < 4; c++) {
    float n = sqrtf(v_b[c][0] * v_b[c][0] + v_b[c][1] * v_b[c][1] +
                    v_b[c][2] * v_b[c][2]);
    float inv = 1.0f / (1.0f + n);
    u0[c] = v_b[c][0] * inv;
    u1[c] = v_b[c][1] * inv;
    amp[c] = (c == 0) ? inv : n * inv; /* target: closeness; vel/omega: sat */
  }
  u0[1] = v_b[1][0]; /* horizon channel: raw up-vector, not normalized */
  u1[1] = v_b[1][1];
  amp[1] = 0.5f + 0.5f * v_b[1][2];
  int res = L->res;
  float inv2s2 = 1.0f / (2.0f * L->sigma * L->sigma);
  for (int i = 0; i < res; i++) {
    float gy = -1.0f + 2.0f * (float)i / (float)(res - 1);
    for (int j = 0; j < res; j++) {
      float gx = -1.0f + 2.0f * (float)j / (float)(res - 1);
      float *px = img + ((size_t)i * res + j) * DRNW_RENDER_CHANNELS;
      for (int c = 0; c < DRNW_RENDER_CHANNELS; c++) {
        float dx = gx - u0[c], dy = gy - u1[c];
        px[c] = amp[c] * expf(-(dx * dx + dy * dy) * inv2s2);
      }
    }
  }
}

/* Patchify (kernel == stride) conv over a row-major HWC image; weights in
 * flax (kh, kw, cin, cout) C-order. Output row-major HWC, so a following
 * dense layer consumes flax's reshape(-1) flatten order directly. */
static void conv_fwd(const DroneNetLayer *L, const float *x, float *y) {
  int go = L->h / L->patch, wo = L->wdt / L->patch;
  for (int oi = 0; oi < go; oi++)
    for (int oj = 0; oj < wo; oj++)
      for (int co = 0; co < L->cout; co++) {
        float acc = L->b[co];
        for (int di = 0; di < L->patch; di++)
          for (int dj = 0; dj < L->patch; dj++) {
            const float *row =
                x + ((size_t)(oi * L->patch + di) * L->wdt +
                     (oj * L->patch + dj)) * L->cin;
            const float *wk =
                L->w + ((size_t)di * L->patch + dj) * L->cin * L->cout;
            for (int ci = 0; ci < L->cin; ci++)
              acc += row[ci] * wk[(size_t)ci * L->cout + co];
          }
        y[((size_t)oi * wo + oj) * L->cout + co] =
            activate_(L->activation, acc);
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
    else if (L->kind == DRNW_KIND_RENDER)
      render_fwd(L, cur, nxt);
    else if (L->kind == DRNW_KIND_CONV)
      conv_fwd(L, cur, nxt);
    else
      dense_fwd(L, cur, nxt);
    float *tmp = cur;
    cur = nxt;
    nxt = tmp;
  }
  memcpy(out, cur, (size_t)net->out_dim * 4);
}
