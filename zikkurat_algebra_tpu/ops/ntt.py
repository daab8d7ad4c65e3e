"""Number-theoretic transform (NTT / iNTT) on limb planes.

TPU analog of the reference's recursive radix-2 DIT NTT
(lib/cbits/curves/poly/mont/bn128_poly_mont.c:418-522).  Re-designed as an
ITERATIVE Cooley-Tukey pipeline: one bit-reversal gather + log2(N)
vectorized butterfly stages, each a reshape + batched field mul/add/sub
across the whole domain — no recursion, no scratch doubling, fully static
shapes for XLA.

Convention (matches oracle/ntt.py and the reference):
    ntt:  out[k] = sum_j in[j] * gen^(j*k)   — evaluate on the subgroup
    intt: inverse, includes the 1/N scaling.

Twiddle factors are precomputed per (field, log2-size) on the host by the
int oracle (the analog of codegen-time constant generation) and baked as
Montgomery-form device constants."""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..params import FieldParams
from ..oracle.ntt import subgroup_gen
from .field import Field, get_field
from ..utils.jit import jit_method


def bit_reverse_perm(m: int) -> np.ndarray:
    n = 1 << m
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(m):
        rev |= ((idx >> b) & 1) << (m - 1 - b)
    return rev


def bit_reverse_halves(m: int):
    """Index pair for `bit_reverse`: rev_a over the high bits (size
    a = 2^(m - m//2)) and rev_b over the low bits (size b = 2^(m//2))."""
    mb = m // 2
    return bit_reverse_perm(m - mb), bit_reverse_perm(mb)


def bit_reverse(x: jax.Array, ra: jax.Array, rb: jax.Array) -> jax.Array:
    """out[..., k] = x[..., rev_m(k)] via the two-level split
    rev(j1*b + j2) = rev_b(j2)*a + rev_a(j1): two sqrt(n)-sized gathers
    plus one transpose instead of one n-sized gather.  TPUs have no
    hardware gather — the direct 2^22 jnp.take measured 2081 ms, this
    formulation 79 ms (bit-exact)."""
    a, b = ra.shape[0], rb.shape[0]
    lead = x.shape[:-1]
    X = x.reshape(lead + (a, b))
    X = jnp.take(X, ra, axis=-2)
    X = jnp.take(X, rb, axis=-1)
    X = jnp.swapaxes(X, -1, -2)
    return X.reshape(lead + (a * b,))


class NTTDomain:
    """A power-of-two evaluation domain (the analog of `FFTSubgroup`,
    lib/src/ZK/Algebra/Class/FFT.hs:27-68): generator of the 2^m subgroup
    derived by squaring down from the field's maximal FFT domain."""

    def __init__(self, field: Field, log2_size: int):
        self.field = field
        self.m = log2_size
        self.n = 1 << log2_size
        params: FieldParams = field.params
        p = params.p
        self.gen = subgroup_gen(params, log2_size)
        self.gen_inv = pow(self.gen, -1, p)
        self.n_inv = pow(self.n, -1, p)
        self._perm = bit_reverse_perm(self.m)      # kept for callers
        self._rev_halves = bit_reverse_halves(self.m)
        # stage twiddles: stage s in 1..m uses w_s = gen^(2^(m-s)) of order
        # 2^s; table_s = [w_s^j for j < 2^(s-1)] in Montgomery form.
        # ensure_compile_time_eval: domains are built LAZILY, sometimes
        # while another function's jit trace is active (e.g. get_domain
        # inside PolyOps.mul_ntt) — without it the tables would be traced
        # into that jaxpr and leak cached tracers into _DOMAIN_CACHE.
        with jax.ensure_compile_time_eval():
            self._fwd = self._stage_tables(self.gen)
            self._inv = self._stage_tables(self.gen_inv)
            self._ninv_mont = field.encode(self.n_inv)

    def _stage_tables(self, g: int) -> List[jax.Array]:
        """Stage-s twiddles are g^(j * 2^(m-s)) — strided subsamples of ONE
        g-power ladder of length n/2, so the whole table set costs a single
        device prefix product (or a host loop for small domains)."""
        p = self.field.p
        f = self.field
        half_max = max(1, self.n // 2)
        if half_max <= 4096:
            tw, acc = [], 1
            for _ in range(half_max):
                tw.append(acc)
                acc = acc * g % p
            full = f.encode(tw)              # (L, n/2)
        else:
            from .vector import powers

            # the associative power ladder has log2(n) DISTINCT level
            # shapes; routing them through the Pallas kernel would compile
            # one Mosaic executable per level (minutes of setup on the
            # remote-compile backend) — force the scan path for this
            # one-time table build
            old = f.use_pallas
            f.use_pallas = False
            try:
                full = jax.jit(
                    lambda one, ge: powers(f, one, ge, half_max)
                )(f.one(()), f.encode(g))
            finally:
                f.use_pallas = old
        tables = []
        for s in range(1, self.m + 1):
            half = 1 << (s - 1)
            stride = 1 << (self.m - s)
            tables.append(full[:, ::stride][:, :half])
        return tables

    # -- transforms --------------------------------------------------------
    def _transform(self, x: jax.Array, tables: List[jax.Array],
                   perm) -> jax.Array:
        """Every stage's butterfly operands are flattened to ONE canonical
        (L, *batch, n/2) shape, so all log2(n) stages share a single
        compiled multiply/add/sub (instead of one compile per stage —
        critical for large domains on hardware).  Tables and the
        bit-reversal permutation are passed as ARGUMENTS: closed-over
        arrays would be inlined as (hundreds of MB of) HLO literals,
        which overflows the remote-compile transport at 2^22."""
        f = self.field
        L, n = x.shape[0], self.n
        if x.shape[-1] != n:
            from ..errors import DomainSizeError

            raise DomainSizeError(
                f"domain size {n} != array size {x.shape[-1]} "
                f"(cf. Class/FFT.hs:61-63)"
            )
        batch = x.shape[1:-1]
        nb = len(batch)
        x = bit_reverse(x, *perm)
        if n == 1:
            return x
        for s in range(1, self.m + 1):
            half = 1 << (s - 1)
            nblocks = n >> s
            xb = x.reshape((L,) + batch + (nblocks, 2, half))
            u = xb[..., 0, :].reshape((L,) + batch + (n // 2,))
            v = xb[..., 1, :].reshape((L,) + batch + (n // 2,))
            tw = jnp.broadcast_to(
                tables[s - 1].reshape((L,) + (1,) * nb + (1, half)),
                (L,) + batch + (nblocks, half),
            ).reshape((L,) + batch + (n // 2,))
            fused = None
            if f.use_pallas and getattr(f, "use_ntt_kernel", True):
                from .pallas_field import butterfly_pallas

                # one fused kernel per stage (mul+add+sub, no HBM round
                # trips between them); every stage shares the SAME
                # canonical (L, n/2) shape => a single Mosaic compile.
                fused = butterfly_pallas(u, v, tw, f.p_np, f.pinv15,
                                         tile=f.pallas_tile,
                                         interpret=f.pallas_interpret)
            if fused is not None:
                hi, lo = fused
                hi = hi.reshape((L,) + batch + (nblocks, half))
                lo = lo.reshape((L,) + batch + (nblocks, half))
            else:
                t = f.mul(v, tw)
                hi = f.add(u, t).reshape((L,) + batch + (nblocks, half))
                lo = f.sub(u, t).reshape((L,) + batch + (nblocks, half))
            x = jnp.concatenate([hi, lo], axis=-1).reshape(
                (L,) + batch + (n,)
            )
        return x

    @jit_method
    def _ntt_impl(self, x, tables, perm):
        return self._transform(x, list(tables), perm)

    @jit_method
    def _intt_impl(self, x, tables, perm, ninv):
        y = self._transform(x, list(tables), perm)
        f = self.field
        ninv = ninv.reshape((f.L,) + (1,) * (y.ndim - 1))
        return f.mul(y, jnp.broadcast_to(ninv, y.shape))

    def ntt(self, x: jax.Array) -> jax.Array:
        """Forward NTT of Montgomery-form coefficients (L, *batch, n)."""
        rh = tuple(jnp.asarray(r) for r in self._rev_halves)
        return self._ntt_impl(x, tuple(self._fwd), rh)

    def intt(self, x: jax.Array) -> jax.Array:
        """Inverse NTT (includes division by N, cf. ntt_inverse
        bn128_poly_mont.c:472-522)."""
        rh = tuple(jnp.asarray(r) for r in self._rev_halves)
        return self._intt_impl(
            x, tuple(self._inv), rh, self._ninv_mont
        )

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_DOMAIN_CACHE: dict = {}


def get_domain(field: Field, log2_size: int) -> NTTDomain:
    key = (field.params.name, log2_size)
    d = _DOMAIN_CACHE.get(key)
    if d is None:
        d = NTTDomain(field, log2_size)
        _DOMAIN_CACHE[key] = d
    return d
