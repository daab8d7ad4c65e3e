"""Redundant radix-2^15 SIGNED limb kernels — the production field core.

Why a second radix (vs the exact 16-bit planes in limbs.py): field
arithmetic dominated by XLA `while` ops (one per carry scan) made both
compile time and runtime explode.  This module removes carries from the
hot path entirely:

* limbs are int32 in a redundant band (roughly [-8, 2^15 + 8]); values
  are congruent mod p, bounded |value| < 2^13 * p;
* add / sub / neg are plain vector int ops + a scan-free "partial carry"
  (mask / arithmetic-shift / shifted add, 1-2 passes) — NO while op;
* the ONLY scan left is the CIOS Montgomery multiply (one lax.scan of L
  tiny steps) and the full normalization used at API boundaries.

Exactness: 15x15-bit signed products fit int32 exactly ((2^15+8)^2 <
2^31), lazy column sums stay < 2^23, and the arithmetic-shift/mask split
p = (p >> 15)*2^15 + (p & 0x7FFF) is exact in two's complement, so every
kernel computes the exact integer value — redundancy never loses bits.

Montgomery R' = 2^(15*L) with L = ceil(bits/15) + 2: two headroom limbs
give R'/p >= 2^30, so CIOS outputs are < 1.1*p for ANY operands bounded
by 2^13*p without a final conditional subtraction (lazy reduction, cf.
the high-performance-NTT "redundant arithmetic" literature in PAPERS.md).

cf. the reference's exact-carry word kernels (lib/cbits/platform.h,
bigint256.c, *_mont.c REDC) — same math, carry-free dataflow.

INVARIANT DISCIPLINE: carry-free ops GROW the value bound (add: sum of
bounds, scale_small(k): x k).  Any op chain that feeds its own output
back without passing through a Montgomery multiplication (which resets
the bound to ~2p) will blow the 2^13*p budget geometrically — e.g. an
iterated x2 term in a squaring chain must be computed as a CIOS product
with the constant 2, not as a scale_small (this exact bug broke the
cyclotomic exponentiation before being routed through mul_many).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

LB = 15
MASK = (1 << LB) - 1

I32 = jnp.int32


def nlimbs15(p: int) -> int:
    """ceil(bits/15) + 2 headroom limbs (R'/p >= 2^30)."""
    return -(-p.bit_length() // LB) + 2


def _shift_up(hi: jax.Array) -> jax.Array:
    """Move per-column carries one limb up; the top carry is provably zero
    for in-bound values (|value| < 2^(15(L-1)))."""
    return jnp.concatenate([jnp.zeros((1,) + hi.shape[1:], I32), hi[:-1]], 0)


def partial_carry(x: jax.Array, passes: int = 1) -> jax.Array:
    """Compress limb magnitudes back into the redundant band.  Exact
    (value-preserving), scan-free.  One pass for |cols| < 2^17, two for
    |cols| < 2^30.

    The TOP limb is left unsplit: it absorbs the sign of (possibly
    negative) values.  Its magnitude stays tiny automatically because
    values are bounded far below 2^(15(L-1))."""
    for _ in range(passes):
        lo = x & MASK          # in [0, 2^15)
        hi = x >> LB           # arithmetic shift: exact signed split
        x = jnp.concatenate([lo[:-1], x[-1:]], 0) + _shift_up(hi)
    return x


def add(a: jax.Array, b: jax.Array) -> jax.Array:
    return partial_carry(a + b, 1)


def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    return partial_carry(a - b, 1)


def neg(a: jax.Array) -> jax.Array:
    return partial_carry(-a, 1)


def scale_small(a: jax.Array, k: int) -> jax.Array:
    """Multiply by a small static integer (|k| <= 2^12): value becomes
    k*a (lazy), limbs re-compressed.  Replaces tiny Montgomery
    const-muls (curve 3b, tower xi, etc.) with 4 vector ops."""
    assert abs(k) <= (1 << 12)
    return partial_carry(a * jnp.int32(k), 2)


def mont_mul(a: jax.Array, b: jax.Array, p: jax.Array, pinv15) -> jax.Array:
    """CIOS Montgomery product a*b*R'^-1 (mod p) on signed lazy limbs.

    a, b: (L, *batch) int32, limbs in the redundant band, |value| < 2^13*p.
    Output: canonical nonneg limbs, value in (0.9p, 2.1p) — congruent
    mod p, NO conditional subtraction needed (lazy reduction; R'/p >= 2^30).
    One lax.scan over the L limbs of b; ~10 vector ops per step."""
    L = p.shape[0]
    batch = a.shape[1:]
    pinv15 = jnp.asarray(pinv15, I32)
    pb = p.reshape((L,) + (1,) * len(batch))

    def body(carry_acc, bj):
        acc, carry = carry_acc                 # acc: (L+1, *batch) lazy cols
        pa = a * bj[None]                      # exact int32 products
        pa_lo = pa & MASK
        pa_hi = pa >> LB
        c0 = acc[0] + carry + pa_lo[0]
        m = ((c0 & MASK) * pinv15) & MASK      # in [0, 2^15)
        mp = pb * m[None]
        mp_lo = mp & MASK
        mp_hi = mp >> LB
        carry2 = (c0 + mp_lo[0]) >> LB
        z1 = jnp.zeros((1,) + batch, I32)
        upper = (
            acc[1:]
            + jnp.concatenate([pa_lo[1:], z1], 0)
            + pa_hi
            + jnp.concatenate([mp_lo[1:], z1], 0)
            + mp_hi
        )
        acc2 = jnp.concatenate([upper, z1], 0)
        return (acc2, carry2), None

    acc0 = (jnp.zeros((L + 1,) + batch, I32), jnp.zeros(batch, I32))
    (acc, carry), _ = lax.scan(body, acc0, b)
    # + p makes the value provably positive (raw result can be a hair
    # negative for negative-value operands); the FULL carry then leaves
    # canonical nonneg limbs and a provably-zero top column (value <
    # 3.2p << 2^(15L)), so the headroom limb can be dropped.  A partial
    # carry is NOT enough here: signed lazy columns can leave a nonzero
    # +-2^9 residue in the top column even when the value fits.
    res = acc.at[0].add(carry) + jnp.concatenate(
        [pb, jnp.zeros((1,) + pb.shape[1:], I32)], 0
    )
    return full_carry(res)[:L]


def mont_redc_wide(t: jax.Array, p: jax.Array, pinv15) -> jax.Array:
    """Montgomery reduction of a wide lazy value (Lt >= L+1 columns,
    |cols| < 2^26) -> t * R'^-1 mod p, (L, *batch), value < 1.1*p.
    Used for from_mont and for folding big lazy accumulations."""
    L = p.shape[0]
    Lt = t.shape[0]
    batch = t.shape[1:]
    pinv15 = jnp.asarray(pinv15, I32)
    pb = p.reshape((L,) + (1,) * len(batch))

    def pad_tail(x, n):
        if n <= 0:
            return x
        return jnp.concatenate([x, jnp.zeros((n,) + x.shape[1:], I32)], 0)

    def body(carry_acc, _):
        acc, carry = carry_acc
        cur = acc[0] + carry
        m = ((cur & MASK) * pinv15) & MASK
        mp = pb * m[None]
        mp_lo = mp & MASK
        mp_hi = mp >> LB
        carry2 = (cur + mp_lo[0]) >> LB
        upper = (
            acc[1:]
            + pad_tail(mp_lo[1:], Lt - L)
            + pad_tail(mp_hi, Lt - 1 - L)
        )
        acc2 = jnp.concatenate([upper, jnp.zeros((1,) + batch, I32)], 0)
        return (acc2, carry2), None

    acc0 = (t, jnp.zeros(batch, I32))
    (acc, carry), _ = lax.scan(body, acc0, None, length=L)
    res = acc.at[0].add(carry)
    res = res.at[:L].add(jnp.broadcast_to(pb, (L,) + batch))  # value > 0
    return full_carry(res)[:L]


def full_carry(x: jax.Array) -> jax.Array:
    """Exact signed carry propagation (ONE lax.scan) — boundary use only.
    Returns limbs in [0, 2^15) except possibly a negative top residue;
    callers add p first if the value may be negative."""
    carry0 = jnp.zeros(x.shape[1:], I32)

    def body(carry, col):
        t = col + carry
        return t >> LB, t & MASK

    carry_out, y = lax.scan(body, carry0, x)
    del carry_out  # zero for in-bound values
    return y


def pack32(x: jax.Array, nbits: int) -> jax.Array:
    """CANONICAL nonneg 15-bit limb planes (L, *batch) -> dense radix-2^32
    rows (W, *batch) int32, W = ceil(nbits/32): exact bit concatenation.
    Used to shrink sort-network payloads (the MSM sort moves every
    coordinate row through ~log^2 n compare-exchange passes, so row count
    is directly proportional to the dominant MSM cost).  Rows may be
    negative as int32 (bit 31 set) — they are opaque payload bits."""
    L = x.shape[0]
    W = -(-nbits // 32)
    rows = []
    for w in range(W):
        lo_bit = 32 * w
        acc = None
        a0 = lo_bit // LB
        a1 = min((lo_bit + 31) // LB, L - 1)
        for a in range(a0, a1 + 1):
            s = LB * a - lo_bit            # limb a lands at bit s (may be <0)
            term = (x[a] << s) if s >= 0 else (x[a] >> (-s))
            acc = term if acc is None else (acc | term)
        rows.append(acc if acc is not None else jnp.zeros_like(x[0]))
    return jnp.stack(rows)


def unpack32(rows: jax.Array, L: int) -> jax.Array:
    """Inverse of pack32: (W, *batch) dense rows -> (L, *batch) canonical
    15-bit limb planes.  int32-only ops (arithmetic shifts + masks), so it
    lowers inside Pallas/Mosaic kernels too."""
    W = rows.shape[0]
    out = []
    for l in range(L):
        bitpos = LB * l
        w0 = bitpos >> 5
        if w0 >= W:
            out.append(jnp.zeros_like(rows[0:1]))
            continue
        s = bitpos & 31
        v = rows[w0:w0 + 1] >> s           # arithmetic: sign bits masked below
        rem = 32 - s
        if rem < LB:
            v = v & ((1 << rem) - 1)
            if w0 + 1 < W:
                v = v | (rows[w0 + 1:w0 + 2] << rem)
        out.append(v & MASK)
    return jnp.concatenate(out, 0)


def cond_sub(x: jax.Array, m: jax.Array) -> jax.Array:
    """x - m if x >= m else x, for FULLY NORMALIZED nonneg x < 2m.
    One borrow scan + select."""
    borrow0 = jnp.zeros(x.shape[1:], I32)

    def body(borrow, cols):
        xc, mc = cols
        t = xc - mc + borrow
        return t >> LB, t & MASK

    mb = jnp.broadcast_to(m, x.shape)
    borrow_out, y = lax.scan(body, borrow0, (x.astype(I32), mb.astype(I32)))
    keep = borrow_out < 0
    return jnp.where(keep[None], x, y)


def normalize(x: jax.Array, p: jax.Array, pinv15, one_mont: jax.Array
              ) -> jax.Array:
    """Canonical [0, p) limbs from any in-bound lazy value: one CIOS by
    the Montgomery one (folds |value| < 2^13*p into (0.99p, 2.1p)), full
    carry, then two conditional subtractions."""
    y = mont_mul(x, jnp.broadcast_to(one_mont, x.shape), p, pinv15)
    pb = jnp.reshape(p, (p.shape[0],) + (1,) * (x.ndim - 1))
    z = full_carry(y)               # value in (0.99p, 2.1p), limbs nonneg
    z = cond_sub(z, pb)
    z = cond_sub(z, pb)
    return z
