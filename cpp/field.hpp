// Native CPU Montgomery field arithmetic — the measured baseline standing
// in for the reference's generated C (lib/cbits/curves/fields/mont/
// *_Fp_mont.c): 64-bit limbs, __uint128_t partial products, CIOS REDC.
// Clean-room implementation of the textbook algorithms.
#pragma once

#include <cstdint>
#include <cstring>

#include "constants.h"

using u64 = uint64_t;
using u128 = unsigned __int128;

static const int NW = FP_WORDS;

struct Fp {
  u64 v[FP_WORDS];
};

static inline bool fp_geq_p(const Fp &a) {
  for (int i = NW - 1; i >= 0; --i) {
    if (a.v[i] > FP_MOD[i]) return true;
    if (a.v[i] < FP_MOD[i]) return false;
  }
  return true;  // equal
}

static inline void fp_sub_p(Fp &a) {
  u64 borrow = 0;
  for (int i = 0; i < NW; ++i) {
    u64 t = a.v[i] - FP_MOD[i] - borrow;
    borrow = (a.v[i] < FP_MOD[i] + borrow) || (borrow && FP_MOD[i] + borrow == 0);
    a.v[i] = t;
  }
}

static inline void fp_add(Fp &out, const Fp &a, const Fp &b) {
  u128 carry = 0;
  for (int i = 0; i < NW; ++i) {
    u128 t = (u128)a.v[i] + b.v[i] + carry;
    out.v[i] = (u64)t;
    carry = t >> 64;
  }
  if (fp_geq_p(out)) fp_sub_p(out);
}

static inline void fp_sub(Fp &out, const Fp &a, const Fp &b) {
  unsigned __int128 borrow = 0;
  u64 tmp[FP_WORDS];
  u64 br = 0;
  for (int i = 0; i < NW; ++i) {
    u64 bi = b.v[i];
    u64 t = a.v[i] - bi - br;
    br = (a.v[i] < bi) || (a.v[i] == bi && br);
    tmp[i] = t;
  }
  if (br) {  // add p back
    u128 carry = 0;
    for (int i = 0; i < NW; ++i) {
      u128 t = (u128)tmp[i] + FP_MOD[i] + carry;
      out.v[i] = (u64)t;
      carry = t >> 64;
    }
  } else {
    std::memcpy(out.v, tmp, sizeof(tmp));
  }
  (void)borrow;
}

static inline void fp_neg(Fp &out, const Fp &a) {
  bool zero = true;
  for (int i = 0; i < NW; ++i) zero = zero && a.v[i] == 0;
  if (zero) { out = a; return; }
  u64 br = 0;
  for (int i = 0; i < NW; ++i) {
    u64 t = FP_MOD[i] - a.v[i] - br;
    br = (FP_MOD[i] < a.v[i]) || (FP_MOD[i] == a.v[i] && br);
    out.v[i] = t;
  }
}

// CIOS Montgomery multiplication (word-by-word REDC interleaved)
static inline void fp_mul(Fp &out, const Fp &a, const Fp &b) {
  u64 t[FP_WORDS + 2] = {0};
  for (int i = 0; i < NW; ++i) {
    // t += a * b[i]
    u128 carry = 0;
    for (int j = 0; j < NW; ++j) {
      u128 s = (u128)t[j] + (u128)a.v[j] * b.v[i] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[NW] + carry;
    t[NW] = (u64)s;
    t[NW + 1] = (u64)(s >> 64);
    // m = t[0] * (-p^-1) mod 2^64;  t += m * p;  t >>= 64
    u64 m = t[0] * FP_INV;
    carry = ((u128)t[0] + (u128)m * FP_MOD[0]) >> 64;
    for (int j = 1; j < NW; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * FP_MOD[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[NW] + carry;
    t[NW - 1] = (u64)s;
    t[NW] = t[NW + 1] + (u64)(s >> 64);
    t[NW + 1] = 0;
  }
  std::memcpy(out.v, t, sizeof(out.v));
  if (t[NW] || fp_geq_p(out)) fp_sub_p(out);
}

static inline void fp_sqr(Fp &out, const Fp &a) { fp_mul(out, a, a); }

static inline bool fp_is_zero(const Fp &a) {
  for (int i = 0; i < NW; ++i)
    if (a.v[i]) return false;
  return true;
}

static inline void fp_set_zero(Fp &a) { std::memset(a.v, 0, sizeof(a.v)); }
static inline void fp_set_one_mont(Fp &a) { std::memcpy(a.v, FP_ONE, sizeof(a.v)); }

// Fermat inversion a^(p-2) (square-and-multiply over the modulus bits)
static inline void fp_inv(Fp &out, const Fp &a) {
  // exponent p-2, little-endian words
  u64 e[FP_WORDS];
  std::memcpy(e, FP_MOD, sizeof(e));
  // subtract 2
  u64 br = (e[0] < 2);
  e[0] -= 2;
  for (int i = 1; br && i < NW; ++i) {
    br = (e[i] == 0);
    e[i] -= 1;
  }
  Fp acc, base = a;
  fp_set_one_mont(acc);
  for (int w = 0; w < NW; ++w) {
    for (int bit = 0; bit < 64; ++bit) {
      if ((e[w] >> bit) & 1) fp_mul(acc, acc, base);
      fp_sqr(base, base);
    }
  }
  out = acc;
}
