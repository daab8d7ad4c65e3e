// Fp2 = Fp[u]/(u^2 + 1) for the native CPU baseline — the measured G2
// stand-in for the reference's generated quadratic-extension C
// (lib/cbits/curves/fields/mont/*_Fp2_mont.c).  Clean-room textbook
// Karatsuba / conjugate-norm formulas; same function names as field.hpp
// so the templated curve code (curve.hpp) works over either field by
// overload resolution.
#pragma once

#include "field.hpp"

struct Fp2 {
  Fp c0, c1;
};

static inline void fp_add(Fp2 &out, const Fp2 &a, const Fp2 &b) {
  fp_add(out.c0, a.c0, b.c0);
  fp_add(out.c1, a.c1, b.c1);
}

static inline void fp_sub(Fp2 &out, const Fp2 &a, const Fp2 &b) {
  fp_sub(out.c0, a.c0, b.c0);
  fp_sub(out.c1, a.c1, b.c1);
}

static inline void fp_neg(Fp2 &out, const Fp2 &a) {
  fp_neg(out.c0, a.c0);
  fp_neg(out.c1, a.c1);
}

// Karatsuba with u^2 = -1: (a0 b0 - a1 b1) + u((a0+a1)(b0+b1) - a0b0 - a1b1)
static inline void fp_mul(Fp2 &out, const Fp2 &a, const Fp2 &b) {
  Fp v0, v1, s, t, w;
  fp_mul(v0, a.c0, b.c0);
  fp_mul(v1, a.c1, b.c1);
  fp_add(s, a.c0, a.c1);
  fp_add(t, b.c0, b.c1);
  fp_mul(w, s, t);
  fp_sub(w, w, v0);
  fp_sub(out.c1, w, v1);
  fp_sub(out.c0, v0, v1);
}

// (a0 + u a1)^2 = (a0+a1)(a0-a1) + u(2 a0 a1)
static inline void fp_sqr(Fp2 &out, const Fp2 &a) {
  Fp s, d, m;
  fp_add(s, a.c0, a.c1);
  fp_sub(d, a.c0, a.c1);
  fp_mul(m, a.c0, a.c1);
  fp_mul(out.c0, s, d);
  fp_add(out.c1, m, m);
}

static inline bool fp_is_zero(const Fp2 &a) {
  return fp_is_zero(a.c0) && fp_is_zero(a.c1);
}

static inline void fp_set_zero(Fp2 &a) {
  fp_set_zero(a.c0);
  fp_set_zero(a.c1);
}

static inline void fp_set_one_mont(Fp2 &a) {
  fp_set_one_mont(a.c0);
  fp_set_zero(a.c1);
}

// 1/(a0 + u a1) = (a0 - u a1) / (a0^2 + a1^2)
static inline void fp_inv(Fp2 &out, const Fp2 &a) {
  Fp n0, n1, n, ni;
  fp_sqr(n0, a.c0);
  fp_sqr(n1, a.c1);
  fp_add(n, n0, n1);
  fp_inv(ni, n);
  fp_mul(out.c0, a.c0, ni);
  Fp t;
  fp_neg(t, a.c1);
  fp_mul(out.c1, t, ni);
}
