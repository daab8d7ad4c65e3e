// Native CPU MSM baseline benchmark.  Usage:
//   msm_bench <log2_n>            G1 MSM points/sec
//   msm_bench <log2_n> --g2       G2 (Fp2 coords) MSM points/sec
//   msm_bench --io                G1 differential-test mode (stdin/stdout)
//   msm_bench --io-g2             G2 differential-test mode
// Prints one JSON line {"points_per_sec": X, ...}.
// Stands in (measured) for the reference's single/multi-threaded C MSM —
// same algorithm family: Jacobian bucket method, 64-bit Montgomery limbs
// (cf. bn128_G1_jac.c MSM_std_coeff_jac_out_variable and the G2 variant
// bn128_G2_proj.h:43-49).
#include <array>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include "curve.hpp"

template <typename F>
static AffT<F> jac_to_aff(const JacT<F> &p) {
  AffT<F> out;
  if (jac_is_inf(p)) {
    out.inf = true;
    fp_set_zero(out.x);
    fp_set_zero(out.y);
    return out;
  }
  F zi, zi2, zi3;
  fp_inv(zi, p.z);
  fp_sqr(zi2, zi);
  fp_mul(zi3, zi2, zi);
  fp_mul(out.x, p.x, zi2);
  fp_mul(out.y, p.y, zi3);
  out.inf = false;
  return out;
}

template <typename F>
static JacT<F> scalar_mul(const std::array<u64, 4> &k, const AffT<F> &p) {
  JacT<F> acc;
  jac_set_inf(acc);
  for (int w = FR_WORDS - 1; w >= 0; --w) {
    for (int bit = 63; bit >= 0; --bit) {
      jac_dbl(acc, acc);
      if ((k[w] >> bit) & 1) jac_madd(acc, acc, p);
    }
  }
  return acc;
}

// Montgomery -> standard representation (multiply by R^-1 via CIOS with 1)
static void fp_from_mont(Fp &out, const Fp &a) {
  Fp one;
  fp_set_zero(one);
  one.v[0] = 1;  // the integer 1 (NOT Montgomery form)
  fp_mul(out, a, one);
}

static bool read_fp_hex(Fp &f) {
  char buf[256];
  if (scanf("%255s", buf) != 1) return false;
  std::memset(f.v, 0, sizeof(f.v));
  size_t len = strlen(buf);
  for (size_t i = 0; i < len; ++i) {
    char ch = buf[len - 1 - i];
    u64 d = (ch >= 'a') ? (ch - 'a' + 10) : (ch >= 'A') ? (ch - 'A' + 10)
                                                        : (ch - '0');
    f.v[i / 16] |= d << (4 * (i % 16));
  }
  return true;
}

static void fp_to_mont(Fp &f) {
  Fp r2;
  std::memcpy(r2.v, FP_R2, sizeof(r2.v));
  fp_mul(f, f, r2);
}

static void print_fp_std(const Fp &a) {
  Fp s;
  fp_from_mont(s, a);
  for (int i = FP_WORDS - 1; i >= 0; --i)
    printf("%016llx", (unsigned long long)s.v[i]);
  printf("\n");
}

// Differential-test mode: read "n / n scalars / n points" as hex
// standard-rep integers from stdin, print the MSM result affine coords.
// G1 points: "x y inf"; G2 points: "x0 x1 y0 y1 inf".
static int io_mode(bool g2) {
  size_t n;
  if (scanf("%zu", &n) != 1) return 1;
  std::vector<std::array<u64, 4>> scalars(n);
  for (size_t i = 0; i < n; ++i) {
    Fp s;
    read_fp_hex(s);
    for (int w = 0; w < 4; ++w) scalars[i][w] = w < FP_WORDS ? s.v[w] : 0;
  }
  if (!g2) {
    std::vector<G1Aff> points(n);
    for (size_t i = 0; i < n; ++i) {
      int inf;
      read_fp_hex(points[i].x);
      read_fp_hex(points[i].y);
      if (scanf("%d", &inf) != 1) return 1;
      points[i].inf = inf != 0;
      fp_to_mont(points[i].x);
      fp_to_mont(points[i].y);
    }
    G1Aff ra = jac_to_aff(msm_jac(scalars, points, msm_window(n)));
    printf("%d\n", ra.inf ? 1 : 0);
    print_fp_std(ra.x);
    print_fp_std(ra.y);
  } else {
    std::vector<G2Aff> points(n);
    for (size_t i = 0; i < n; ++i) {
      int inf;
      read_fp_hex(points[i].x.c0);
      read_fp_hex(points[i].x.c1);
      read_fp_hex(points[i].y.c0);
      read_fp_hex(points[i].y.c1);
      if (scanf("%d", &inf) != 1) return 1;
      points[i].inf = inf != 0;
      fp_to_mont(points[i].x.c0);
      fp_to_mont(points[i].x.c1);
      fp_to_mont(points[i].y.c0);
      fp_to_mont(points[i].y.c1);
    }
    G2Aff ra = jac_to_aff(msm_jac(scalars, points, msm_window(n)));
    printf("%d\n", ra.inf ? 1 : 0);
    print_fp_std(ra.x.c0);
    print_fp_std(ra.x.c1);
    print_fp_std(ra.y.c0);
    print_fp_std(ra.y.c1);
  }
  return 0;
}

template <typename F>
static int bench(const AffT<F> &G, int log2n, const char *label) {
  size_t n = (size_t)1 << log2n;
  std::mt19937_64 rng(12345);
  // base points: 256 random multiples of G, tiled
  size_t nbase = n < 256 ? n : 256;
  std::vector<AffT<F>> base(nbase);
  for (size_t i = 0; i < nbase; ++i) {
    std::array<u64, 4> s;
    for (int w = 0; w < 4; ++w) s[w] = rng();
    s[3] >>= 9;  // keep below r
    base[i] = jac_to_aff(scalar_mul(s, G));
  }
  std::vector<AffT<F>> points(n);
  for (size_t i = 0; i < n; ++i) points[i] = base[i % nbase];

  std::vector<std::array<u64, 4>> scalars(n);
  for (size_t i = 0; i < n; ++i) {
    for (int w = 0; w < 4; ++w) scalars[i][w] = rng();
    scalars[i][3] >>= 9;
  }

  int c = msm_window(n);
  auto t0 = std::chrono::steady_clock::now();
  JacT<F> r = msm_jac(scalars, points, c);
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();

  AffT<F> ra = jac_to_aff(r);
  // fold result into a checksum so the work can't be optimized away
  u64 checksum = 0;
  const u64 *xs = (const u64 *)&ra.x;
  const u64 *ys = (const u64 *)&ra.y;
  for (size_t i = 0; i < sizeof(F) / 8; ++i) checksum ^= xs[i] ^ ys[i];

  printf(
      "{\"points_per_sec\": %.2f, \"n\": %zu, \"window\": %d, "
      "\"seconds\": %.3f, \"group\": \"%s\", \"checksum\": \"%016llx\"}\n",
      n / secs, n, c, secs, label, (unsigned long long)checksum);
  return 0;
}

int main(int argc, char **argv) {
  bool g2 = false;
  int log2n = 16;
  for (int i = 1; i < argc; ++i) {
    if (std::strcmp(argv[i], "--io") == 0) return io_mode(false);
    if (std::strcmp(argv[i], "--io-g2") == 0) return io_mode(true);
    if (std::strcmp(argv[i], "--g2") == 0) g2 = true;
    else log2n = atoi(argv[i]);
  }

  if (!g2) {
    G1Aff G;
    std::memcpy(G.x.v, G1_X, sizeof(G.x.v));
    std::memcpy(G.y.v, G1_Y, sizeof(G.y.v));
    G.inf = false;
    return bench(G, log2n, "g1");
  }
  G2Aff G;
  std::memcpy(G.x.c0.v, G2_X0, sizeof(G.x.c0.v));
  std::memcpy(G.x.c1.v, G2_X1, sizeof(G.x.c1.v));
  std::memcpy(G.y.c0.v, G2_Y0, sizeof(G.y.c0.v));
  std::memcpy(G.y.c1.v, G2_Y1, sizeof(G.y.c1.v));
  G.inf = false;
  return bench(G, log2n, "g2");
}
