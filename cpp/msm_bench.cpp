// Native CPU MSM baseline benchmark.  Usage: msm_bench <log2_n> [--check]
// Prints one JSON line {"points_per_sec": X, ...}.
// Stands in (measured) for the reference's single/multi-threaded C MSM —
// same algorithm family: Jacobian bucket method, 64-bit Montgomery limbs.
#include <array>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include "curve.hpp"

static G1Aff jac_to_aff(const G1Jac &p) {
  G1Aff out;
  if (jac_is_inf(p)) {
    out.inf = true;
    fp_set_zero(out.x);
    fp_set_zero(out.y);
    return out;
  }
  Fp zi, zi2, zi3;
  fp_inv(zi, p.z);
  fp_sqr(zi2, zi);
  fp_mul(zi3, zi2, zi);
  fp_mul(out.x, p.x, zi2);
  fp_mul(out.y, p.y, zi3);
  out.inf = false;
  return out;
}

static G1Jac scalar_mul(const std::array<u64, 4> &k, const G1Aff &p) {
  G1Jac acc;
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

// Differential-test mode: read "n / n scalars / n points (x y inf)" as hex
// standard-rep integers from stdin, print the MSM result affine coords.
static int io_mode() {
  size_t n;
  if (scanf("%zu", &n) != 1) return 1;
  std::vector<std::array<u64, 4>> scalars(n);
  std::vector<G1Aff> points(n);
  char buf[256];
  auto read_fp = [&](Fp &f) {
    if (scanf("%255s", buf) != 1) return false;
    // hex string, big-endian
    std::memset(f.v, 0, sizeof(f.v));
    size_t len = strlen(buf);
    for (size_t i = 0; i < len; ++i) {
      char ch = buf[len - 1 - i];
      u64 d = (ch >= 'a') ? (ch - 'a' + 10) : (ch >= 'A') ? (ch - 'A' + 10)
                                                          : (ch - '0');
      f.v[i / 16] |= d << (4 * (i % 16));
    }
    return true;
  };
  auto to_mont = [&](Fp &f) {
    Fp r2;
    std::memcpy(r2.v, FP_R2, sizeof(r2.v));
    fp_mul(f, f, r2);
  };
  for (size_t i = 0; i < n; ++i) {
    Fp s;
    read_fp(s);
    for (int w = 0; w < 4; ++w) scalars[i][w] = w < FP_WORDS ? s.v[w] : 0;
  }
  for (size_t i = 0; i < n; ++i) {
    int inf;
    read_fp(points[i].x);
    read_fp(points[i].y);
    if (scanf("%d", &inf) != 1) return 1;
    points[i].inf = inf != 0;
    to_mont(points[i].x);
    to_mont(points[i].y);
  }
  G1Jac r = msm_jac(scalars, points, msm_window(n));
  G1Aff ra = jac_to_aff(r);
  Fp xs, ys;
  fp_from_mont(xs, ra.x);
  fp_from_mont(ys, ra.y);
  printf("%d\n", ra.inf ? 1 : 0);
  for (int i = FP_WORDS - 1; i >= 0; --i) printf("%016llx", (unsigned long long)xs.v[i]);
  printf("\n");
  for (int i = FP_WORDS - 1; i >= 0; --i) printf("%016llx", (unsigned long long)ys.v[i]);
  printf("\n");
  return 0;
}

int main(int argc, char **argv) {
  if (argc > 1 && std::strcmp(argv[1], "--io") == 0) return io_mode();
  int log2n = argc > 1 ? atoi(argv[1]) : 16;
  size_t n = (size_t)1 << log2n;

  G1Aff G;
  std::memcpy(G.x.v, G1_X, sizeof(G.x.v));
  std::memcpy(G.y.v, G1_Y, sizeof(G.y.v));
  G.inf = false;

  std::mt19937_64 rng(12345);
  // base points: 256 random multiples of G, tiled
  size_t nbase = n < 256 ? n : 256;
  std::vector<G1Aff> base(nbase);
  for (size_t i = 0; i < nbase; ++i) {
    std::array<u64, 4> s;
    for (int w = 0; w < 4; ++w) s[w] = rng();
    s[3] >>= 9;  // keep below r
    base[i] = jac_to_aff(scalar_mul(s, G));
  }
  std::vector<G1Aff> points(n);
  for (size_t i = 0; i < n; ++i) points[i] = base[i % nbase];

  std::vector<std::array<u64, 4>> scalars(n);
  for (size_t i = 0; i < n; ++i) {
    for (int w = 0; w < 4; ++w) scalars[i][w] = rng();
    scalars[i][3] >>= 9;
  }

  int c = msm_window(n);
  // warmup + timed
  auto t0 = std::chrono::steady_clock::now();
  G1Jac r = msm_jac(scalars, points, c);
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();

  G1Aff ra = jac_to_aff(r);
  // fold result into a checksum so the work can't be optimized away
  u64 checksum = 0;
  for (int i = 0; i < FP_WORDS; ++i) checksum ^= ra.x.v[i] ^ ra.y.v[i];

  printf(
      "{\"points_per_sec\": %.2f, \"n\": %zu, \"window\": %d, "
      "\"seconds\": %.3f, \"checksum\": \"%016llx\"}\n",
      n / secs, n, c, secs, (unsigned long long)checksum);
  return 0;
}
