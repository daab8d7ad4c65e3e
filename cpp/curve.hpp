// Jacobian curve arithmetic + Pippenger MSM — the measured CPU baseline
// standing in for the reference's generated C
// (lib/cbits/curves/g1/jac/*.c and g2/proj/*.c: dbl-2007-bl /
// madd-2007-bl formulas and MSM_std_coeff_jac_out_variable's windowed
// bucket method).  Clean-room implementation of the standard EFD
// formulas, TEMPLATED over the coordinate field: F = Fp gives G1,
// F = Fp2 (fp2.hpp overloads) gives G2 — mirroring the reference's
// per-field code generation with one template instead.
#pragma once

#include <cmath>
#include <cstdint>
#include <vector>

#include "field.hpp"
#include "fp2.hpp"

template <typename F>
struct AffT {
  F x, y;
  bool inf;
};

template <typename F>
struct JacT {
  F x, y, z;  // infinity <=> z == 0
};

using G1Aff = AffT<Fp>;
using G1Jac = JacT<Fp>;
using G2Aff = AffT<Fp2>;
using G2Jac = JacT<Fp2>;

template <typename F>
static inline void jac_set_inf(JacT<F> &p) {
  fp_set_one_mont(p.x);
  fp_set_one_mont(p.y);
  fp_set_zero(p.z);
}

template <typename F>
static inline bool jac_is_inf(const JacT<F> &p) { return fp_is_zero(p.z); }

template <typename F>
static inline void jac_from_aff(JacT<F> &out, const AffT<F> &a) {
  if (a.inf) { jac_set_inf(out); return; }
  out.x = a.x;
  out.y = a.y;
  fp_set_one_mont(out.z);
}

// dbl-2007-bl (a = 0)
template <typename F>
static inline void jac_dbl(JacT<F> &out, const JacT<F> &p) {
  if (jac_is_inf(p)) { out = p; return; }
  F A, B, C, D, E, Fq, t;
  fp_sqr(A, p.x);
  fp_sqr(B, p.y);
  fp_sqr(C, B);
  // D = 2((X+B)^2 - A - C)
  fp_add(t, p.x, B);
  fp_sqr(t, t);
  fp_sub(t, t, A);
  fp_sub(t, t, C);
  fp_add(D, t, t);
  // E = 3A, F = E^2
  fp_add(E, A, A);
  fp_add(E, E, A);
  fp_sqr(Fq, E);
  // X3 = F - 2D
  fp_sub(out.x, Fq, D);
  fp_sub(out.x, out.x, D);
  // Y3 = E(D - X3) - 8C
  fp_sub(t, D, out.x);
  fp_mul(t, E, t);
  F C8;
  fp_add(C8, C, C);
  fp_add(C8, C8, C8);
  fp_add(C8, C8, C8);
  F y3;
  fp_sub(y3, t, C8);
  // Z3 = 2 Y Z
  F z3;
  fp_mul(z3, p.y, p.z);
  fp_add(out.z, z3, z3);
  out.y = y3;
}

// mixed addition Jacobian + affine (madd-2007-bl, a = 0)
template <typename F>
static inline void jac_madd(JacT<F> &out, const JacT<F> &p, const AffT<F> &q) {
  if (q.inf) { out = p; return; }
  if (jac_is_inf(p)) { jac_from_aff(out, q); return; }
  F Z1Z1, U2, S2, H, HH, I, J, r, V, t;
  fp_sqr(Z1Z1, p.z);
  fp_mul(U2, q.x, Z1Z1);
  fp_mul(S2, q.y, p.z);
  fp_mul(S2, S2, Z1Z1);
  fp_sub(H, U2, p.x);
  if (fp_is_zero(H)) {
    F d;
    fp_sub(d, S2, p.y);
    if (fp_is_zero(d)) { jac_dbl(out, p); return; }
    jac_set_inf(out);
    return;
  }
  fp_sqr(HH, H);
  fp_add(I, HH, HH);
  fp_add(I, I, I);
  fp_mul(J, H, I);
  fp_sub(r, S2, p.y);
  fp_add(r, r, r);
  fp_mul(V, p.x, I);
  // X3 = r^2 - J - 2V
  fp_sqr(t, r);
  fp_sub(t, t, J);
  fp_sub(t, t, V);
  fp_sub(out.x, t, V);
  // Y3 = r(V - X3) - 2 Y1 J
  fp_sub(t, V, out.x);
  fp_mul(t, r, t);
  F yj;
  fp_mul(yj, p.y, J);
  fp_add(yj, yj, yj);
  F y3;
  fp_sub(y3, t, yj);
  // Z3 = (Z1 + H)^2 - Z1Z1 - HH
  fp_add(t, p.z, H);
  fp_sqr(t, t);
  fp_sub(t, t, Z1Z1);
  fp_sub(out.z, t, HH);
  out.y = y3;
}

// full Jacobian addition (add-2007-bl)
template <typename F>
static inline void jac_add(JacT<F> &out, const JacT<F> &p, const JacT<F> &q) {
  if (jac_is_inf(p)) { out = q; return; }
  if (jac_is_inf(q)) { out = p; return; }
  F Z1Z1, Z2Z2, U1, U2, S1, S2, H, I, J, r, V, t;
  fp_sqr(Z1Z1, p.z);
  fp_sqr(Z2Z2, q.z);
  fp_mul(U1, p.x, Z2Z2);
  fp_mul(U2, q.x, Z1Z1);
  fp_mul(S1, p.y, q.z);
  fp_mul(S1, S1, Z2Z2);
  fp_mul(S2, q.y, p.z);
  fp_mul(S2, S2, Z1Z1);
  fp_sub(H, U2, U1);
  if (fp_is_zero(H)) {
    F d;
    fp_sub(d, S2, S1);
    if (fp_is_zero(d)) { jac_dbl(out, p); return; }
    jac_set_inf(out);
    return;
  }
  fp_add(t, H, H);
  fp_sqr(I, t);
  fp_mul(J, H, I);
  fp_sub(r, S2, S1);
  fp_add(r, r, r);
  fp_mul(V, U1, I);
  fp_sqr(t, r);
  fp_sub(t, t, J);
  fp_sub(t, t, V);
  fp_sub(out.x, t, V);
  fp_sub(t, V, out.x);
  fp_mul(t, r, t);
  F sj;
  fp_mul(sj, S1, J);
  fp_add(sj, sj, sj);
  F y3;
  fp_sub(y3, t, sj);
  fp_mul(t, p.z, q.z);
  fp_mul(t, t, H);
  fp_add(out.z, t, t);
  out.y = y3;
}

// Pippenger MSM: scalars as FR_WORDS-word std-rep little-endian integers.
// Window heuristic c = round(log2 N - 3.5), clamped — matching the
// reference's choice (bn128_G1_jac.c:648-650).  OpenMP over windows.
static inline int msm_window(size_t n) {
  if (n <= 1) return 1;
  int c = (int)std::lround(std::log2((double)n) - 3.5);
  if (c < 1) c = 1;
  if (c > 24) c = 24;
  return c;
}

template <typename F>
static inline JacT<F> msm_jac(const std::vector<std::array<u64, 4>> &scalars,
                              const std::vector<AffT<F>> &points, int c) {
  const size_t n = points.size();
  const int nbits = FR_WORDS * 64;
  const int windows = (nbits + c - 1) / c;
  const size_t nbuckets = ((size_t)1 << c) - 1;
  std::vector<JacT<F>> win_res(windows);

#pragma omp parallel for schedule(dynamic, 1)
  for (int w = 0; w < windows; ++w) {
    std::vector<JacT<F>> buckets(nbuckets);
    for (auto &b : buckets) jac_set_inf(b);
    for (size_t i = 0; i < n; ++i) {
      int bit0 = w * c;
      int word = bit0 / 64, off = bit0 % 64;
      u64 frag = scalars[i][word] >> off;
      if (off + c > 64 && word + 1 < FR_WORDS)
        frag |= scalars[i][word + 1] << (64 - off);
      u64 digit = frag & (((u64)1 << c) - 1);
      if (digit) jac_madd(buckets[digit - 1], buckets[digit - 1], points[i]);
    }
    // running sums: sum_b b * S_b
    JacT<F> run, acc;
    jac_set_inf(run);
    jac_set_inf(acc);
    for (size_t b = nbuckets; b-- > 0;) {
      jac_add(run, run, buckets[b]);
      jac_add(acc, acc, run);
    }
    win_res[w] = acc;
  }

  JacT<F> total;
  jac_set_inf(total);
  for (int w = windows - 1; w >= 0; --w) {
    for (int k = 0; k < c; ++k) jac_dbl(total, total);
    jac_add(total, total, win_res[w]);
  }
  return total;
}
