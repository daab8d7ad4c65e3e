"""Dense univariate polynomials over Fr on limb planes.

TPU analog of lib/cbits/curves/poly/mont/*_poly_mont.c (C14): ring ops,
evaluation, long division, vanishing-polynomial fast paths, and NTT-based
multiplication (the reference's `mul` is naive schoolbook marked
"TEMPORARY !!!" — BN128/Poly.hs:133; here NTT-mul is the default for
large sizes, which is asymptotically better than the reference).

Coefficient layout: (L, N) Montgomery-form limb planes, little-endian
coefficients (index i = x^i), zero-padded to the static array size N.
Degree is a runtime value (mask-based), array size is static — the XLA
analog of the reference's size-asymmetric variable-length polys.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .field import Field
from ..utils.jit import jit_method
from .ntt import get_domain
from .vector import powers, dot_prod, reduce_wide, sum_mod

I32 = jnp.int32


class PolyOps:
    """Polynomial kernels over one field; coefficients in Montgomery form."""

    def __init__(self, field: Field):
        self.f = field

    # -- basics ------------------------------------------------------------
    @jit_method
    def degree(self, a: jax.Array) -> jax.Array:
        """Runtime degree; degree(0) == -1 as in the reference
        (bn128_poly_mont.c `degree`)."""
        n = a.shape[-1]
        nz = jnp.logical_not(self.f.is_zero(a))      # (..., n) bools
        idx = jnp.arange(n, dtype=jnp.int32)
        idx = idx.reshape((1,) * (nz.ndim - 1) + (n,))
        return jnp.max(jnp.where(nz, idx, -1), axis=-1)

    def is_zero(self, a) -> jax.Array:
        return jnp.all(self.f.is_zero(a), axis=-1)

    def eq(self, a, b) -> jax.Array:
        """Size-asymmetric equality (pads the shorter)."""
        n = max(a.shape[-1], b.shape[-1])
        return jnp.all(self.f.eq(self.pad_to(a, n), self.pad_to(b, n)), axis=-1)

    def get_coeff(self, a: jax.Array, k: int) -> jax.Array:
        """Coefficient k as a field element; 0 beyond the stored length
        (cf. `get_coeff`, bn128_poly_mont.h)."""
        if k < 0 or k >= a.shape[-1]:
            return self.f.zero(a.shape[self.f.struct_ndim:-1])
        return a[..., k]

    def is_constant(self, a) -> jax.Array:
        """True iff degree <= 0 (cf. `is_constant`, bn128_poly_mont.h —
        the constant itself is `get_coeff(a, 0)`)."""
        return jnp.all(self.f.is_zero(a[..., 1:]), axis=-1)

    @jit_method
    def lincomb(self, coeffs, polys):
        """sum_i coeffs[i] * polys[i] over K polynomials of (possibly)
        different stored lengths (cf. `lincomb`, bn128_poly_mont.h)."""
        n = max(p.shape[-1] for p in polys)
        acc = None
        for s, p in zip(coeffs, polys):
            t = self.scale(s, self.pad_to(p, n))
            acc = t if acc is None else self.f.add(acc, t)
        return acc

    def quot(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Euclidean quotient only (cf. `quot`, bn128_poly_mont.h)."""
        return self.long_div(a, b)[0]

    def rem(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Euclidean remainder only (cf. `rem`, bn128_poly_mont.h)."""
        return self.long_div(a, b)[1]

    def pad_to(self, a: jax.Array, n: int) -> jax.Array:
        if a.shape[-1] == n:
            return a
        if a.shape[-1] > n:
            from ..errors import DimensionError

            raise DimensionError(
                f"cannot pad length {a.shape[-1]} down to {n}"
            )
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])]
        return jnp.pad(a, cfg)

    # -- ring ops ----------------------------------------------------------
    @jit_method
    def neg(self, a):
        return self.f.neg(a)

    @jit_method
    def add(self, a, b):
        n = max(a.shape[-1], b.shape[-1])
        return self.f.add(self.pad_to(a, n), self.pad_to(b, n))

    @jit_method
    def sub(self, a, b):
        n = max(a.shape[-1], b.shape[-1])
        return self.f.sub(self.pad_to(a, n), self.pad_to(b, n))

    @jit_method
    def scale(self, s, a):
        """s (L,) or (L,1) times coefficient vector a."""
        s = s.reshape((self.f.L,) + (1,) * (a.ndim - 1))
        return self.f.mul(jnp.broadcast_to(s, a.shape), a)

    @jit_method(static_argnums=(2,))
    def mul_by_xn(self, a, k: int):
        pad = jnp.zeros(a.shape[:-1] + (k,), I32)
        return jnp.concatenate([pad, a], axis=-1)

    # -- multiplication ----------------------------------------------------
    @jit_method
    def mul_naive(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Schoolbook convolution (cf. `mul_naive`, bn128_poly_mont.c:199):
        output size Na+Nb-1.  Lazy uint32 accumulation of < 256 products
        per column between Montgomery wide-reductions."""
        f = self.f
        na, nb = a.shape[-1], b.shape[-1]
        nout = na + nb - 1
        out_shape = a.shape[:-1] + (nout,)
        acc = jnp.zeros(out_shape, I32)
        parts = []
        for i in range(na):
            ai = a[..., i:i + 1]
            prod = f.mul(jnp.broadcast_to(ai, b.shape), b)   # (L, ..., nb)
            shifted = jnp.pad(
                prod, [(0, 0)] * (a.ndim - 1) + [(i, nout - nb - i)]
            )
            acc = acc + shifted
            if (i + 1) % 255 == 0:
                parts.append(reduce_wide(f, acc))
                acc = jnp.zeros(out_shape, I32)
        parts.append(reduce_wide(f, acc))
        total = parts[0]
        for pr in parts[1:]:
            total = f.add(total, pr)
        return total

    @jit_method
    def mul_ntt(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """NTT-based multiplication: O(n log n) — supersedes the
        reference's TEMPORARY schoolbook (BN128/Poly.hs:133)."""
        na, nb = a.shape[-1], b.shape[-1]
        nout = na + nb - 1
        m = max(1, (nout - 1).bit_length())
        dom = get_domain(self.f, m)
        fa = dom.ntt(self.pad_to(a, dom.n))
        fb = dom.ntt(self.pad_to(b, dom.n))
        prod = dom.intt(self.f.mul(fa, fb))
        return prod[..., :nout]

    def mul(self, a, b):
        if a.shape[-1] + b.shape[-1] <= 64:
            return self.mul_naive(a, b)
        return self.mul_ntt(a, b)

    # -- evaluation --------------------------------------------------------
    @jit_method
    def eval_at(self, x: jax.Array, a: jax.Array) -> jax.Array:
        """P(x) for single point x (L,), coeffs (L, N).  Log-depth
        powers+dot instead of the reference's serial Horner
        (bn128_poly_mont.c:225-243)."""
        f = self.f
        n = a.shape[-1]
        pw = powers(f, f.one(()), x, n)      # (L, n): [1, x, x^2, ...]
        return dot_prod(f, a, pw)

    @jit_method
    def eval_many(self, xs: jax.Array, a: jax.Array) -> jax.Array:
        """P(x_j) for xs (L, K): vectorized via per-point power ladders."""
        f = self.f
        n = a.shape[-1]
        k = xs.shape[-1]
        ones = f.one((k,))
        elems = jnp.concatenate(
            [ones[:, None, :], jnp.broadcast_to(xs[:, None, :], (f.L, n - 1, k))], 1
        )
        pw = lax.associative_scan(lambda u, v: f.mul(u, v), elems, axis=1)
        # pw: (L, n, k); dot against coeffs (L, n)
        prods = f.mul(pw, jnp.broadcast_to(a[:, :, None], pw.shape))
        return sum_mod(f, prods, axis=1)

    # -- division ----------------------------------------------------------
    @jit_method
    def long_div(self, a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Euclidean division a = q*b + r (cf. `long_div`,
        bn128_poly_mont.c:249-297).  The divisor's STORED length defines
        its degree (host-side trim, like the reference's exact-length
        heap polys); the dividend may be zero-padded.
        Returns (quot (L, Na-Db), rem (L, Db))."""
        f = self.f
        na, db1 = a.shape[-1], b.shape[-1]
        db = db1 - 1                      # divisor degree
        nq = na - db
        if nq < 1:
            from ..errors import DimensionError

            raise DimensionError(
                f"dividend (len {na}) shorter than divisor (len {db1})"
            )
        lead_inv = f.inv(b[..., -1])      # (L,)
        rem0 = a

        def body(i, carry):
            rem, quot = carry
            # i runs 0..nq-1, processing coefficient na-1-i
            pos = na - 1 - i
            c = lax.dynamic_slice_in_dim(rem, pos, 1, axis=-1)[..., 0]
            q = f.mul(c, lead_inv)                     # (L,)
            quot = lax.dynamic_update_slice_in_dim(
                quot, q[..., None], pos - db, axis=-1
            )
            sub = f.mul(jnp.broadcast_to(q[..., None], b.shape), b)
            window = lax.dynamic_slice_in_dim(rem, pos - db, db1, axis=-1)
            rem = lax.dynamic_update_slice_in_dim(
                rem, f.sub(window, sub), pos - db, axis=-1
            )
            return rem, quot

        quot0 = jnp.zeros(a.shape[:-1] + (nq,), I32)
        rem, quot = lax.fori_loop(0, nq, body, (rem0, quot0))
        return quot, rem[..., :db] if db > 0 else jnp.zeros(a.shape[:-1] + (0,), I32)

    @jit_method(static_argnums=(2,))
    def div_by_vanishing(self, a: jax.Array, n: int, eta: jax.Array
                         ) -> Tuple[jax.Array, jax.Array]:
        """Divide by (x^n - eta) via the block recurrence
        Q_{j-1} = B_j + eta*Q_j (cf. bn128_poly_mont.c:317-397).
        eta: (L,) field element.  Returns (quot (L, max(Na-n, 0)), rem (L, n))."""
        f = self.f
        na = a.shape[-1]
        if na <= n:
            return jnp.zeros(a.shape[:-1] + (0,), I32), self.pad_to(a, n)
        k = -(-na // n)                    # number of blocks
        ap = self.pad_to(a, k * n)
        blocks = ap.reshape(a.shape[:-1] + (k, n))       # little-endian blocks
        etab = jnp.broadcast_to(
            eta.reshape((f.L,) + (1,) * (a.ndim - 1)), a.shape[:-1] + (n,)
        )

        # Write P = sum_j B_j x^(jn).  Then with Q = sum_j Q_j x^(jn):
        #   s_j = B_j + eta*s_{j+1}  (s_{k-1} = B_{k-1});
        #   Q_i = s_{i+1},  rem = s_0.
        # The recurrence is a composition of AFFINE maps F_j(t) =
        # B_j + eta*t, so it runs as a log-depth suffix associative scan
        # over (multiplier, offset) pairs — the serial lax.scan version
        # cost k-1 dependent muls (1.6 s of the KZG 2^12 open at n=1,
        # where k = deg).
        # scan along the LAST axis so the k blocks fill the TPU lanes
        # (with the block axis second-to-last, n=1 divisions — the KZG
        # opening — would run every mul on a single lane)
        blocksT = jnp.swapaxes(blocks, -1, -2)            # (.., n, k)
        etak = jnp.broadcast_to(
            eta.reshape((f.L,) + (1,) * a.ndim), blocksT.shape
        )

        def combine(Fa, Fb):
            # reverse=True feeds the HIGHER-index composite as Fa, so
            # compose with the lower-index map outermost:
            # (Fb ∘ Fa)(t) = Fb(Fa(t))
            ma, ba = Fa
            mb, bb = Fb
            m2, t = f.mul_list([(mb, ma), (mb, ba)])
            return m2, f.add(bb, t)

        _, sT = lax.associative_scan(
            combine, (etak, blocksT), axis=blocksT.ndim - 1, reverse=True
        )
        s = jnp.swapaxes(sT, -1, -2)                      # (.., k, n)
        rem = s[..., 0, :]
        quot = s[..., 1:, :].reshape(a.shape[:-1] + ((k - 1) * n,))
        return quot[..., :na - n], rem

    @jit_method(static_argnums=(2,))
    def quot_by_vanishing(self, a: jax.Array, n: int, eta: jax.Array
                          ) -> Tuple[jax.Array, jax.Array]:
        """Quotient by (x^n - eta) plus exactness flag (cf.
        `quot_by_vanishing`, bn128_poly_mont.c:402-413)."""
        q, r = self.div_by_vanishing(a, n, eta)
        ok = jnp.all(self.f.is_zero(r), axis=-1)
        return q, ok


_POLY_CACHE: dict = {}


def get_poly_ops(field: Field) -> PolyOps:
    """Cached PolyOps per field.  jit_method caches per INSTANCE, so a
    fresh PolyOps per call retraces and recompiles every kernel — the
    KZG opening measured 2.8 s/call from exactly that (the actual
    compute is ~75 ms)."""
    po = _POLY_CACHE.get(field.params.name)
    if po is None:
        po = PolyOps(field)
        _POLY_CACHE[field.params.name] = po
    return po
