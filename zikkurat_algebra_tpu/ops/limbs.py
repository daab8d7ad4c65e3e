"""Vectorized big-integer limb-plane kernels (the TPU analog of the
reference's ``lib/cbits/bigint/bigintN.c`` + ``platform.h``).

Representation
--------------
An unsigned integer of ``16*L`` bits is stored as ``L`` little-endian 16-bit
limbs held in a ``uint32`` array of shape ``(L, *batch)``.  The limb axis is
the LEADING axis on purpose:

* batch elements ride the 128-wide TPU vector lanes (full VPU utilization,
  unlike a trailing L=16/24 axis which would waste 7/8 of each lane group);
* carry/borrow propagation is a natural ``lax.scan`` over the leading axis.

Why radix 2^16: a 16x16-bit product fits *exactly* in a uint32 lane
(max (2^16-1)^2 = 2^32 - 2^17 + 1 < 2^32), so TPU's native 32-bit integer
multiply gives exact double-width partial products with no mulhi and no
carry flags.  Column sums are kept "lazy" (bounded < 2^22 for L <= 24) and
normalized by a single carry scan — the vectorized replacement for the
reference's ``addcarry_u64`` chains (platform.h, bigint256.c:267-289).

All functions are shape-polymorphic over ``*batch`` and dtype-strict:
inputs/outputs are normalized uint32 limb planes (every entry < 2^16) unless
documented otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

U32 = jnp.uint32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# carry / borrow propagation
# ---------------------------------------------------------------------------

def carry_prop(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Normalize lazy limb columns.

    ``x``: uint32 ``(L, *batch)`` with column values < 2^31 (callers keep
    columns < ~2^22).  Returns ``(y, carry_out)`` where ``y`` has all limbs
    < 2^16 and ``carry_out`` has shape ``(*batch,)``.

    Replaces the reference's hardware carry chains
    (lib/cbits/platform.h `addcarry_u64`).
    """
    carry0 = jnp.zeros(x.shape[1:], U32)

    def body(carry, col):
        t = col + carry
        return t >> LIMB_BITS, t & LIMB_MASK

    carry_out, y = lax.scan(body, carry0, x)
    return y, carry_out


def borrow_prop(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Normalize signed limb columns (int32, each in (-2^30, 2^30)).

    Returns ``(y, borrow_out)`` with ``y`` uint32 normalized and
    ``borrow_out`` (*batch,) uint32 in {0, 1, ...} = number of borrows out
    (0 means the represented value was non-negative).
    """
    borrow0 = jnp.zeros(x.shape[1:], I32)

    def body(borrow, col):
        t = col + borrow  # borrow is <= 0
        return t >> LIMB_BITS, (t & LIMB_MASK).astype(U32)

    borrow_out, y = lax.scan(body, borrow0, x.astype(I32))
    return y, (-borrow_out).astype(U32)


# ---------------------------------------------------------------------------
# add / sub / compare  (cf. bigint256.h:14-34)
# ---------------------------------------------------------------------------

def add(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """a + b -> (sum_limbs, carry_out).  Shapes (L, *batch)."""
    return carry_prop(a + b)


def sub(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """a - b -> (diff mod 2^(16L), borrow_out in {0,1})."""
    return borrow_prop(a.astype(I32) - b.astype(I32))


def geq(a: jax.Array, b: jax.Array) -> jax.Array:
    """a >= b, boolean (*batch,)."""
    _, borrow = sub(a, b)
    return borrow == 0


def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(a == 0, axis=0)

def is_one(a: jax.Array) -> jax.Array:
    lead = a[0] == 1
    rest = jnp.all(a[1:] == 0, axis=0)
    return jnp.logical_and(lead, rest)


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=0)


def select(pred: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Branch-free per-element select: pred ? a : b.  pred (*batch,)."""
    return jnp.where(pred[None], a, b)


# ---------------------------------------------------------------------------
# multiplication (cf. bigint256.c:267-289 product-scanning schoolbook)
# ---------------------------------------------------------------------------

def _pad_tail(x: jax.Array, n: int) -> jax.Array:
    """Append n zero planes along axis 0."""
    if n == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((n,) + x.shape[1:], U32)], 0)


def mul_full(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full product: (La, *batch) x (Lb, *batch) -> (La+Lb, *batch).

    Horner-form operand scan: acc <- (acc << 16) + a * b_j for j from the
    top limb down, as a lax.scan with a tiny static body (shift = concat,
    no dynamic-update-slices — those made XLA compile time explode).
    Partial products are exact 32-bit uint32 values split into 16-bit
    halves; lazy column sums stay < 2*Lb*2^16 < 2^22 for L <= 24, then one
    carry scan normalizes.
    """
    La, Lb = a.shape[0], b.shape[0]
    batch = a.shape[1:]
    Lo = La + Lb

    def body(acc, bj):
        # acc <<= 16 (limb shift up; top limb provably zero when it drops)
        acc = jnp.concatenate([jnp.zeros((1,) + batch, U32), acc[:-1]], 0)
        p = a * bj[None]                       # exact 32-bit products
        lo = _pad_tail(p & LIMB_MASK, Lo - La)
        hi = jnp.concatenate(
            [jnp.zeros((1,) + batch, U32), _pad_tail(p >> LIMB_BITS, Lo - La - 1)], 0
        )
        return acc + lo + hi, None

    acc0 = jnp.zeros((Lo,) + batch, U32)
    acc, _ = lax.scan(body, acc0, jnp.flip(b, 0))
    y, carry = carry_prop(acc)
    del carry  # provably zero: value < 2^(16(La+Lb))
    return y


def sqr_full(a: jax.Array) -> jax.Array:
    """Full square (La -> 2*La limbs).

    The reference's squaring exploits symmetry to halve the partial
    products (bigint256.c sqr, scalar code).  That trick does NOT pay in
    this batch-vector model: every scan step is an La-wide VECTOR
    multiply whatever subset of products is mathematically needed (XLA
    requires static shapes, so the triangle cannot shrink the per-step
    width), and masking it would only add select traffic.  Schoolbook is
    the vector-optimal form here."""
    return mul_full(a, a)


def mul_trunc(a: jax.Array, b: jax.Array, L: int) -> jax.Array:
    """Low L limbs of a*b (cf. bigint256 `mul_truncated`)."""
    return mul_full(a, b)[:L]


def scale_word(w: jax.Array, a: jax.Array) -> jax.Array:
    """(16-bit word plane) * bigint -> (L+1, *batch).

    ``w``: uint32 (*batch,) < 2^16.  cf. bigint256 `scale`.
    """
    p = a * w[None]
    lo = p & LIMB_MASK
    hi = p >> LIMB_BITS
    L = a.shape[0]
    acc = jnp.zeros((L + 1,) + a.shape[1:], U32)
    acc = acc.at[:L].add(lo)
    acc = acc.at[1:].add(hi)
    y, _ = carry_prop(acc)
    return y


# ---------------------------------------------------------------------------
# shifts (cf. bigint256.h:26-34)
# ---------------------------------------------------------------------------

def shl_bits(a: jax.Array, s: int) -> tuple[jax.Array, jax.Array]:
    """Left shift by 0 <= s < 16 bits -> (shifted, carry_out_plane)."""
    assert 0 <= s < LIMB_BITS
    if s == 0:
        return a, jnp.zeros(a.shape[1:], U32)
    return carry_prop(a << s)


def shr_bits(a: jax.Array, s: int) -> jax.Array:
    """Logical right shift by 0 <= s < 16 bits."""
    assert 0 <= s < LIMB_BITS
    if s == 0:
        return a
    down = a >> s
    up = (a << (LIMB_BITS - s)) & LIMB_MASK
    up_next = jnp.concatenate([up[1:], jnp.zeros((1,) + a.shape[1:], U32)], 0)
    return down | up_next


def shr_limbs(a: jax.Array, k: int) -> jax.Array:
    """Right shift by k whole limbs (length preserved, zero fill)."""
    if k == 0:
        return a
    pad = jnp.zeros((k,) + a.shape[1:], U32)
    return jnp.concatenate([a[k:], pad], 0)


def shl_limbs(a: jax.Array, k: int) -> jax.Array:
    if k == 0:
        return a
    pad = jnp.zeros((k,) + a.shape[1:], U32)
    return jnp.concatenate([pad, a[:-k] if k < a.shape[0] else a[:0]], 0)


def shr1(a: jax.Array) -> jax.Array:
    """Divide by 2 (logical >> 1), cf. bigint256 `shift_right_by_1`."""
    return shr_bits(a, 1)


# ---------------------------------------------------------------------------
# modular helpers
# ---------------------------------------------------------------------------

def cond_sub(s: jax.Array, m: jax.Array) -> jax.Array:
    """s - m if s >= m else s  (single correction; requires s < 2m).

    cf. `sub_prime_if_above` (bn128_Fr_mont.c:72-81).  ``m`` broadcasts:
    shape (L,) + (1,)*batch_ndim or (L, *batch).
    """
    t, borrow = borrow_prop(s.astype(I32) - m.astype(I32))
    return select(borrow == 0, t, s)


def add_mod(a: jax.Array, b: jax.Array, m: jax.Array) -> jax.Array:
    """(a + b) mod m for a, b < m < 2^(16L - 1)  (no carry-out possible)."""
    s, _ = carry_prop(a + b)
    return cond_sub(s, m)


def sub_mod(a: jax.Array, b: jax.Array, m: jax.Array) -> jax.Array:
    """(a - b) mod m for a, b < m."""
    d, borrow = borrow_prop(a.astype(I32) - b.astype(I32))
    dp, _ = carry_prop(d + jnp.broadcast_to(m, d.shape))
    return select(borrow == 0, d, dp)


def neg_mod(a: jax.Array, m: jax.Array) -> jax.Array:
    """(-a) mod m == m - a, with -0 == 0 (cf. bn128_Fr_mont.c:44-58)."""
    d, _ = borrow_prop(jnp.broadcast_to(m, a.shape).astype(I32) - a.astype(I32))
    return select(is_zero(a), a, d)


def div2_mod(a: jax.Array, m: jax.Array) -> jax.Array:
    """a/2 mod m for odd m: (a>>1) + (a odd ? (m+1)/2 adjustment).

    Implemented as (a + (a&1)*m) >> 1 (cf. bn128_Fr_std.c:241-249).
    """
    odd = (a[0] & 1) == 1
    s, carry = carry_prop(a + jnp.broadcast_to(m, a.shape))
    # (a+m) < 2m fits in 16L bits for our moduli, so carry == 0.
    del carry
    return select(odd, shr1(s), shr1(a))


# ---------------------------------------------------------------------------
# Montgomery reduction — the workhorse
# (cf. REDC in bn128_Fr_mont.c:140-199, word-by-word over 64-bit words;
#  here word-by-word over 16-bit limb planes)
# ---------------------------------------------------------------------------

def mont_redc(t: jax.Array, p: jax.Array, pinv16) -> jax.Array:
    """Montgomery reduction: t (2L, *batch) with LAZY columns (each < 2^26)
    -> t * R^-1 mod p, (L, *batch), result < p.  R = 2^(16 L);
    pinv16 = -p^-1 mod 2^16.

    lax.scan over L iterations; per step only column 0 is made exact (its
    carry threads through the scan), the remaining columns accumulate
    16-bit halves lazily and shift down — all-static concat/pad body.
    """
    L = p.shape[0]
    Lt = t.shape[0]
    batch = t.shape[1:]
    pinv16 = jnp.asarray(pinv16, U32)
    pb = p.reshape((L,) + (1,) * len(batch))

    def body(carry_acc, _):
        acc, carry = carry_acc
        cur = acc[0] + carry                      # exact column value
        m = (cur * pinv16) & LIMB_MASK            # (*batch,)
        mp = pb * m[None]                         # (L, *batch) exact 32-bit
        mp_lo = mp & LIMB_MASK
        mp_hi = mp >> LIMB_BITS
        carry2 = (cur + mp_lo[0]) >> LIMB_BITS    # column 0 dies (== 0 mod 2^16)
        # remaining columns: add mp_lo[k] at col k (k>=1), mp_hi[k] at col
        # k+1, then shift everything down one limb (drop the dead col 0).
        upper = acc[1:]                           # cols 1..Lt-1
        upper = (
            upper
            + _pad_tail(mp_lo[1:], Lt - L)
            + _pad_tail(mp_hi, Lt - 1 - L)
        )
        acc2 = _pad_tail(upper, 1)
        return (acc2, carry2), None

    acc0 = (t, jnp.zeros(batch, U32))
    (acc, carry), _ = lax.scan(body, acc0, None, length=L)
    res = acc[:L] + _pad_tail(carry[None], L - 1)
    res, carry_out = carry_prop(res)
    del carry_out  # value < 2p < 2^(16L) for our moduli -> zero
    return cond_sub(res, pb)


def mont_mul(a: jax.Array, b: jax.Array, p: jax.Array, pinv16) -> jax.Array:
    """Montgomery product a*b*R^-1 mod p for a, b < p in Montgomery form.

    CIOS (coarsely integrated operand scanning, cf. the reference's
    word-by-word REDC bn128_Fr_mont.c:140-175) as ONE lax.scan over the L
    limbs of b: each step multiplies by one b-limb, eliminates one residue
    limb, and shifts the (L+1)-column lazy accumulator down — ~8 static
    vector ops per step, so the whole field-mul compiles to a single tiny
    XLA loop regardless of L.
    """
    L = p.shape[0]
    batch = a.shape[1:]
    pinv16 = jnp.asarray(pinv16, U32)
    pb = p.reshape((L,) + (1,) * len(batch))

    def body(carry_acc, bj):
        acc, carry = carry_acc                     # acc: (L+1, *batch) lazy
        pa = a * bj[None]                          # exact 32-bit products
        pa_lo = pa & LIMB_MASK
        pa_hi = pa >> LIMB_BITS
        c0 = acc[0] + carry + pa_lo[0]             # exact column 0
        m = (c0 * pinv16) & LIMB_MASK
        mp = pb * m[None]
        mp_lo = mp & LIMB_MASK
        mp_hi = mp >> LIMB_BITS
        carry2 = (c0 + mp_lo[0]) >> LIMB_BITS
        # cols 1..L gather the remaining halves, then shift down one limb
        upper = (
            acc[1:]
            + _pad_tail(pa_lo[1:], 1)
            + pa_hi
            + _pad_tail(mp_lo[1:], 1)
            + mp_hi
        )
        acc2 = _pad_tail(upper, 1)
        return (acc2, carry2), None

    acc0 = (jnp.zeros((L + 1,) + batch, U32), jnp.zeros(batch, U32))
    (acc, carry), _ = lax.scan(body, acc0, b)
    res = acc + _pad_tail(carry[None], L)
    res, carry_out = carry_prop(res)
    del carry_out                                  # result < 2p < 2^(16(L+1))
    pb1 = jnp.concatenate([pb, jnp.zeros((1,) + pb.shape[1:], U32)], 0)
    return cond_sub(res, pb1)[:L]


def mont_sqr(a: jax.Array, p: jax.Array, pinv16) -> jax.Array:
    return mont_mul(a, a, p, pinv16)


def mont_from(a: jax.Array, p: jax.Array, pinv16) -> jax.Array:
    """Montgomery -> standard representation (multiply by R^-1)."""
    L = p.shape[0]
    t = jnp.concatenate([a, jnp.zeros_like(a)], 0)
    return mont_redc(t, p, pinv16)
