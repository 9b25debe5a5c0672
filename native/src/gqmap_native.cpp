// Native (C++) reference implementations of the compiled components the
// upstream project ships only as opaque Windows MEX binaries:
//
//   flowToColor_mex.mexw64  -> flow_to_color       (spec: legacy/flowToColor.m
//                                                    + legacy/computeColor.m)
//   get_map_mex.mexw64      -> mixture_map         (spec: legacy/findMixMax.m)
//   findMap_mex.mexw64      -> mixture_map (predecessor, same spec)
//   findMap5_mex.mexw64     -> mixture_map (L=5 variant, same spec)
//
// plus double-precision ports of the accuracy-critical interpolation path
// (getVV padding + 16-tap cubic-convolution sampling,
// gqmap_gpu_mixture.m:156-179,191-208) and the Middlebury .flo container,
// used as bit-level cross-checks for the JAX ops.
//
// Exposed as a plain C ABI for ctypes loading; no Python headers needed.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// --------------------------------------------------------------------------
// getVV: pad a row-major MxN image by one cubic-extrapolated ring.
// Order matters for the corners: all columns' top/bottom rows first, then
// all rows' left/right columns (gqmap_gpu_mixture.m:191-208).
void gq_get_vv(const double* V, int M, int N, double* VV) {
  const int M2 = M + 2, N2 = N + 2;
  std::memset(VV, 0, sizeof(double) * M2 * N2);
  for (int r = 0; r < M; ++r)
    for (int c = 0; c < N; ++c) VV[(r + 1) * N2 + (c + 1)] = V[r * N + c];
  for (int c = 0; c < N2; ++c) {
    VV[0 * N2 + c] = (3.0 * VV[1 * N2 + c] - 3.0 * VV[2 * N2 + c]) + VV[3 * N2 + c];
    VV[(M2 - 1) * N2 + c] =
        (3.0 * VV[(M2 - 2) * N2 + c] - 3.0 * VV[(M2 - 3) * N2 + c]) + VV[(M2 - 4) * N2 + c];
  }
  for (int r = 0; r < M2; ++r) {
    VV[r * N2 + 0] = (3.0 * VV[r * N2 + 1] - 3.0 * VV[r * N2 + 2]) + VV[r * N2 + 3];
    VV[r * N2 + (N2 - 1)] =
        (3.0 * VV[r * N2 + (N2 - 2)] - 3.0 * VV[r * N2 + (N2 - 3)]) + VV[r * N2 + (N2 - 4)];
  }
}

// 16-tap cubic-convolution sample of the padded image at 1-based (Xq, Yq),
// clamped to [1, N] x [1, M] (gqmap_gpu_mixture.m:156-177).
static inline double cubic_w0(double f) { return ((2.0 - f) * f - 1.0) * f; }
static inline double cubic_w1(double f) { return (3.0 * f - 5.0) * f * f + 2.0; }
static inline double cubic_w2(double f) { return ((4.0 - 3.0 * f) * f + 1.0) * f; }
static inline double cubic_w3(double f) { return (f - 1.0) * f * f; }

void gq_sample_bicubic(const double* VV, int M, int N, const double* Xq,
                       const double* Yq, int64_t n, double* out) {
  const int N2 = N + 2;
  for (int64_t k = 0; k < n; ++k) {
    double xq = std::min(std::max(Xq[k], 1.0), (double)N);
    double yq = std::min(std::max(Yq[k], 1.0), (double)M);
    int ix = xq <= 1.0 ? 1 : (xq <= N - 1 ? (int)std::floor(xq) : N - 1);
    int iy = yq <= 1.0 ? 1 : (yq <= M - 1 ? (int)std::floor(yq) : M - 1);
    double so = xq - ix, to = yq - iy;
    double wx[4] = {cubic_w0(so), cubic_w1(so), cubic_w2(so), cubic_w3(so)};
    double wy[4] = {cubic_w0(to), cubic_w1(to), cubic_w2(to), cubic_w3(to)};
    double acc = 0.0;
    for (int c = 0; c < 4; ++c)
      for (int r = 0; r < 4; ++r)
        acc += VV[(iy - 1 + r) * N2 + (ix - 1 + c)] * wx[c] * wy[r];
    out[k] = acc * 0.25;
  }
}

// --------------------------------------------------------------------------
// Per-site 1-D mixture mode (spec: legacy/findMixMax.m:44-58): spike
// candidates at the component means + Brent-style bounded minimization of
// the negative mixture pdf on [min mu, max mu] (MATLAB fminbnd's
// golden-section + parabolic interpolation, tol 1e-4-equivalent).
static double neg_mix_pdf(double x, const double* a, const double* mu,
                          const double* sg, int L) {
  const double inv_sqrt_2pi = 0.3989422804014327;
  double v = 0.0;
  for (int l = 0; l < L; ++l) {
    double d = (x - mu[l]) / sg[l];
    v -= a[l] * std::exp(-0.5 * d * d) * inv_sqrt_2pi / sg[l];
  }
  return v;
}

static double fminbnd(double ax, double bx, const double* a, const double* mu,
                      const double* sg, int L, double tol, double* fout) {
  // Forsythe-Malcolm-Moler FMIN (the algorithm behind MATLAB fminbnd).
  const double c = 0.5 * (3.0 - std::sqrt(5.0));
  const double seps = std::sqrt(2.220446049250313e-16);
  double xf = ax + c * (bx - ax), v = xf, w = xf;
  double d = 0.0, e = 0.0;
  double fx = neg_mix_pdf(xf, a, mu, sg, L), fv = fx, fw = fx;
  double xm = 0.5 * (ax + bx);
  double tol1 = seps * std::fabs(xf) + tol / 3.0;
  double tol2 = 2.0 * tol1;
  int iters = 0;
  while (std::fabs(xf - xm) > (tol2 - 0.5 * (bx - ax)) && iters < 500) {
    bool gs = true;
    if (std::fabs(e) > tol1) {  // try parabolic fit
      double r = (xf - w) * (fx - fv);
      double q = (xf - v) * (fx - fw);
      double p = (xf - v) * q - (xf - w) * r;
      q = 2.0 * (q - r);
      if (q > 0.0) p = -p;
      q = std::fabs(q);
      double r2 = e;
      e = d;
      if (std::fabs(p) < std::fabs(0.5 * q * r2) && p > q * (ax - xf) &&
          p < q * (bx - xf)) {
        d = p / q;
        double xn = xf + d;
        if ((xn - ax) < tol2 || (bx - xn) < tol2) {
          double si = (xm - xf >= 0) ? 1.0 : -1.0;
          d = tol1 * si;
        }
        gs = false;
      }
    }
    if (gs) {
      e = (xf >= xm) ? ax - xf : bx - xf;
      d = c * e;
    }
    double si = (d >= 0) ? 1.0 : -1.0;
    double x = xf + si * std::max(std::fabs(d), tol1);
    double fu = neg_mix_pdf(x, a, mu, sg, L);
    if (fu <= fx) {
      if (x >= xf) ax = xf; else bx = xf;
      v = w; fv = fw;
      w = xf; fw = fx;
      xf = x; fx = fu;
    } else {
      if (x < xf) ax = x; else bx = x;
      if (fu <= fw || w == xf) {
        v = w; fv = fw;
        w = x; fw = fu;
      } else if (fu <= fv || v == xf || v == w) {
        v = x; fv = fu;
      }
    }
    xm = 0.5 * (ax + bx);
    tol1 = seps * std::fabs(xf) + tol / 3.0;
    tol2 = 2.0 * tol1;
    ++iters;
  }
  *fout = fx;
  return xf;
}

static double mix_mode_1d(const double* a, const double* mu, const double* sg,
                          int L) {
  double spike = 1e300;
  int sid = 0;
  for (int l = 0; l < L; ++l) {
    double v = neg_mix_pdf(mu[l], a, mu, sg, L);
    if (v < spike) { spike = v; sid = l; }
  }
  double lo = mu[0], hi = mu[0];
  for (int l = 1; l < L; ++l) { lo = std::min(lo, mu[l]); hi = std::max(hi, mu[l]); }
  double fval;
  double x = fminbnd(lo, hi, a, mu, sg, L, 1e-4, &fval);
  return fval < spike ? x : mu[sid];
}

// flow = mixture_map(alpha, muu, sigmau, muv, sigmav): per-pixel (u, v) mode
// (spec of get_map_mex, gqmap_gpu_mixture.m:57). Arrays are row-major
// (M, N, L); out is (M, N, 2).
void gq_mixture_map(const double* alpha, const double* muu, const double* sgu,
                    const double* muv, const double* sgv, int M, int N, int L,
                    double* out) {
  for (int64_t p = 0; p < (int64_t)M * N; ++p) {
    out[p * 2 + 0] = mix_mode_1d(alpha, muu + p * L, sgu + p * L, L);
    out[p * 2 + 1] = mix_mode_1d(alpha, muv + p * L, sgv + p * L, L);
  }
}

// --------------------------------------------------------------------------
// Middlebury color wheel flow visualization (spec: legacy/flowToColor.m +
// legacy/computeColor.m). flow row-major (M, N, 2); outputs: img uint8
// (M, N, 3), flo (M, N, 2) sanitized, ranges[4] = {minu, maxu, minv, maxv},
// unknown uint8 (M, N).
void gq_flow_to_color(const double* flow, int M, int N, uint8_t* img,
                      double* flo, double* ranges, uint8_t* unknown) {
  const double UNK = 1e9;
  static int wheel[55][3];
  static bool init = false;
  if (!init) {
    const int RY = 15, YG = 6, GC = 4, CB = 11, BM = 13, MR = 6;
    int col = 0;
    for (int i = 0; i < RY; ++i) { wheel[col][0] = 255; wheel[col][1] = 255 * i / RY; wheel[col][2] = 0; ++col; }
    for (int i = 0; i < YG; ++i) { wheel[col][0] = 255 - 255 * i / YG; wheel[col][1] = 255; wheel[col][2] = 0; ++col; }
    for (int i = 0; i < GC; ++i) { wheel[col][0] = 0; wheel[col][1] = 255; wheel[col][2] = 255 * i / GC; ++col; }
    for (int i = 0; i < CB; ++i) { wheel[col][0] = 0; wheel[col][1] = 255 - 255 * i / CB; wheel[col][2] = 255; ++col; }
    for (int i = 0; i < BM; ++i) { wheel[col][0] = 255 * i / BM; wheel[col][1] = 0; wheel[col][2] = 255; ++col; }
    for (int i = 0; i < MR; ++i) { wheel[col][0] = 255; wheel[col][1] = 0; wheel[col][2] = 255 - 255 * i / MR; ++col; }
    init = true;
  }
  const int ncols = 55;
  double minu = 999, maxu = -999, minv = 999, maxv = -999, maxrad = -1;
  const int64_t P = (int64_t)M * N;
  for (int64_t p = 0; p < P; ++p) {
    double u = flow[p * 2], v = flow[p * 2 + 1];
    bool unk = std::fabs(u) > UNK || std::fabs(v) > UNK;
    unknown[p] = unk;
    if (unk) u = v = 0.0;
    flo[p * 2] = u;
    flo[p * 2 + 1] = v;
    minu = std::min(minu, u); maxu = std::max(maxu, u);
    minv = std::min(minv, v); maxv = std::max(maxv, v);
    maxrad = std::max(maxrad, std::sqrt(u * u + v * v));
  }
  ranges[0] = minu; ranges[1] = maxu; ranges[2] = minv; ranges[3] = maxv;
  const double eps = 2.220446049250313e-16;
  for (int64_t p = 0; p < P; ++p) {
    double u = flo[p * 2] / (maxrad + eps), v = flo[p * 2 + 1] / (maxrad + eps);
    double rad = std::sqrt(u * u + v * v);
    double a = std::atan2(-v, -u) / M_PI;
    double fk = (a + 1.0) / 2.0 * (ncols - 1) + 1.0;
    int k0 = (int)std::floor(fk);
    int k1 = k0 + 1;
    if (k1 == ncols + 1) k1 = 1;
    double f = fk - k0;
    for (int c = 0; c < 3; ++c) {
      double col0 = wheel[k0 - 1][c] / 255.0;
      double col1 = wheel[k1 - 1][c] / 255.0;
      double col = (1.0 - f) * col0 + f * col1;
      if (rad <= 1.0) col = 1.0 - rad * (1.0 - col);
      else col = col * 0.75;
      img[p * 3 + c] = unknown[p] ? 0 : (uint8_t)std::floor(255.0 * col);
    }
  }
}

// --------------------------------------------------------------------------
// .flo container (spec: readFlowFile.m:56-81, legacy/writeFlowFile.m:57-76).
// Returns 0 on success; on success *out_w/*out_h are set and data (w*h*2
// float32, row-major interleaved) is written to `out` if non-null.
int gq_read_flo_header(const char* path, int* out_w, int* out_h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  float tag; int w, h;
  if (std::fread(&tag, 4, 1, f) != 1 || std::fread(&w, 4, 1, f) != 1 ||
      std::fread(&h, 4, 1, f) != 1 || tag != 202021.25f || w < 1 || h < 1) {
    std::fclose(f);
    return -2;
  }
  *out_w = w; *out_h = h;
  std::fclose(f);
  return 0;
}

int gq_read_flo(const char* path, float* out, int64_t count) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 12, SEEK_SET);
  int64_t got = (int64_t)std::fread(out, 4, count, f);
  std::fclose(f);
  return got == count ? 0 : -3;
}

int gq_write_flo(const char* path, const float* data, int w, int h) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const char tag[4] = {'P', 'I', 'E', 'H'};
  std::fwrite(tag, 1, 4, f);
  std::fwrite(&w, 4, 1, f);
  std::fwrite(&h, 4, 1, f);
  std::fwrite(data, 4, (size_t)w * h * 2, f);
  std::fclose(f);
  return 0;
}

}  // extern "C"
