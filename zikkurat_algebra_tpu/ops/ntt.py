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

    #: minimum log2 size for the single-chip four-step decomposition
    #: (override with ZIKKURAT_NTT_FOURSTEP: "0" disables, an int sets it).
    #: TOOLCHAIN-VERSIONED DEFAULT (see the CLAUDE.md lesson): on the
    #: round-3 toolchain the radix-2 lane path won (2^22: 0.681 s vs
    #: four-step 1.314 s) and the default was OFF; the 2026-08 toolchain
    #: regressed the lane path 2-3x (2^22 -> 1.402 s, 2^20 -> 0.418 s)
    #: while four-step now measures 0.415 s / 0.107 s there — better
    #: than the lane path ever was.  Measured endpoints 2^20 and 2^22;
    #: the transposes shrink quadratically below that.
    FOUR_STEP_MIN = 16

    def __init__(self, field: Field, log2_size: int,
                 four_step: bool | None = None):
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
        self._fwd_tables = None
        self._inv_tables = None
        self._fwd4_tables = None
        self._inv4_tables = None
        import os as _os

        # fused double-stage butterflies (see _transform4).  Default
        # OFF: measured SLOWER than the radix-2 lane pipeline on v5e
        # (2^22: 1.29 s vs 0.624 s; 2^20: 0.324 s vs 0.132 s) — the
        # 5-operand fused mul_list and wider interleave lose more to
        # relayout than the halved stage count saves.  Third negative
        # result for hand-restructured butterflies (Pallas butterfly,
        # four-step, radix-4): XLA's fusion around the one big CIOS
        # kernel per stage is the winning schedule.  ZIKKURAT_NTT_RADIX4=1
        # re-enables for future A/B.
        self._radix4 = _os.environ.get("ZIKKURAT_NTT_RADIX4", "0") == "1" \
            and self.m >= 2
        if four_step is None:
            import os

            env = os.environ.get("ZIKKURAT_NTT_FOURSTEP")
            minm = self.FOUR_STEP_MIN if env is None else (
                10**9 if env == "0" else int(env)
            )
            four_step = self.m >= max(2, minm)
        self._four = bool(four_step) and self.m >= 2
        # ensure_compile_time_eval: domains are built LAZILY, sometimes
        # while another function's jit trace is active (e.g. get_domain
        # inside PolyOps.mul_ntt) — without it the tables would be traced
        # into that jaxpr and leak cached tracers into _DOMAIN_CACHE.
        with jax.ensure_compile_time_eval():
            self._ninv_mont = field.encode(self.n_inv)
        if self._four:
            # four-step split n = A*B (A = 2^(m - m//2) rows, B = 2^(m//2)
            # columns): both butterfly passes run along the SUBLANE axis
            # (axis -2), so no stage ever interleaves at lane granularity
            self._mB = self.m // 2
            self._mA = self.m - self._mB
            self._A, self._B = 1 << self._mA, 1 << self._mB
            # sub-domain stage tables: gen^B generates the 2^mA subgroup
            # and gen^A the 2^mB one (both equal the subgroup_gen chain)
            self._subA = get_domain(field, self._mA)
            self._subB = get_domain(field, self._mB)
            with jax.ensure_compile_time_eval():
                self._W_fwd = self._twiddle_matrix(self.gen)
                self._W_inv = self._twiddle_matrix(self.gen_inv)

    # stage twiddles: stage s in 1..m uses w_s = gen^(2^(m-s)) of order
    # 2^s; table_s = [w_s^j for j < 2^(s-1)] in Montgomery form.  Built
    # lazily: four-step domains only need their SUB-domains' tables.
    @property
    def _fwd(self) -> List[jax.Array]:
        if self._fwd_tables is None:
            with jax.ensure_compile_time_eval():
                self._fwd_tables = self._stage_tables(self.gen)
        return self._fwd_tables

    @property
    def _inv(self) -> List[jax.Array]:
        if self._inv_tables is None:
            with jax.ensure_compile_time_eval():
                self._inv_tables = self._stage_tables(self.gen_inv)
        return self._inv_tables

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

    # -- fused double-stage (radix-4) twiddles ---------------------------
    # One double-stage covers radix-2 stages s and s+1 with FIVE
    # independent products per 4 outputs (vs 4 dependent ones), so both
    # stages' multiplies ride ONE fused mul_list kernel and the
    # interleave relayout happens once per pair — the per-stage cost is
    # dominated by launches/relayouts (~24 ms of ~29 ms at 2^22), not
    # multiplies.  Writing W = w_{s+1} (order 2^(s+1)):
    #   x0 = (a + W^2j b) + (W^j c + W^3j d)
    #   x1 = (a - W^2j b) + (W^(h+j) c - W^(h+3j) d)
    #   x2 = (a + W^2j b) - (W^j c + W^3j d)
    #   x3 = (a - W^2j b) - (W^(h+j) c - W^(h+3j) d)
    # The W^2j table is stage s's existing table; the other four are
    # geometric ladders g^(off + step*j) built once per domain.
    @property
    def _fwd4(self):
        if self._fwd4_tables is None:
            with jax.ensure_compile_time_eval():
                self._fwd4_tables = self._stage4_tables(self.gen)
        return self._fwd4_tables

    @property
    def _inv4(self):
        if self._inv4_tables is None:
            with jax.ensure_compile_time_eval():
                self._inv4_tables = self._stage4_tables(self.gen_inv)
        return self._inv4_tables

    def _stage4_tables(self, g: int):
        p = self.field.p
        f = self.field

        def ladder(off_exp: int, step_exp: int, length: int) -> jax.Array:
            if length <= 2048:
                vals, acc = [], pow(g, off_exp, p)
                ratio = pow(g, step_exp, p)
                for _ in range(length):
                    vals.append(acc)
                    acc = acc * ratio % p
                return f.encode(vals)
            from .vector import powers

            old = f.use_pallas
            f.use_pallas = False     # per-level scan shapes (see above)
            try:
                return jax.jit(
                    lambda a, b: powers(f, a, b, length)
                )(f.encode(pow(g, off_exp, p)), f.encode(pow(g, step_exp, p)))
            finally:
                f.use_pallas = old

        out = []
        for s in range(1, self.m, 2):
            h = 1 << (s - 1)
            stride = 1 << (self.m - s - 1)   # exponent stride of W
            out.append((
                ladder(0, stride, h),            # W^j
                ladder(0, 3 * stride, h),        # W^3j
                ladder(h * stride, stride, h),   # W^(h+j)
                ladder(h * stride, 3 * stride, h),  # W^(h+3j)
            ))
        return out

    def _twiddle_matrix(self, g: int) -> jax.Array:
        """Four-step inter-pass twiddles W[k1, j2] = g^(k1*j2) in
        Montgomery form, (L, A, B): one B-length power ladder of g, then
        a prefix product down the rows (row k1 = row_{k1-1} * ladder).
        One-time per domain; forced off the Pallas kernel like the stage
        tables (per-level scan shapes would compile one Mosaic kernel
        each)."""
        from jax import lax
        from .vector import powers

        f = self.field
        A, B = self._A, self._B
        old = f.use_pallas
        f.use_pallas = False
        try:
            u = jax.jit(lambda one, ge: powers(f, one, ge, B))(
                f.one(()), f.encode(g)
            )                                               # (L, B)
            one_row = jnp.broadcast_to(f.one(())[:, None, None],
                                       (f.L, 1, B))
            rest = jnp.broadcast_to(u[:, None, :], (f.L, A - 1, B))
            elems = jnp.concatenate([one_row, rest], 1)     # (L, A, B)
            W = jax.jit(
                lambda e: lax.associative_scan(
                    lambda x, y: f.mul(x, y), e, axis=1
                )
            )(elems)
        finally:
            f.use_pallas = old
        return W

    def _col_transform(self, x: jax.Array, tables: List[jax.Array],
                       rev: jax.Array, msub: int) -> jax.Array:
        """DIT radix-2 NTT along axis -2 of (L, *batch, S, lanes): the
        butterfly partner always lives in a different SUBLANE row, so no
        stage pays a lane-granularity interleave relayout (the lane-axis
        formulation's cost at half < 128)."""
        f = self.field
        L = x.shape[0]
        S = 1 << msub
        lanes = x.shape[-1]
        lead = x.shape[1:-2]
        nb = len(lead)
        x = jnp.take(x, rev, axis=-2)
        for s in range(1, msub + 1):
            half = 1 << (s - 1)
            nblocks = S >> s
            xb = x.reshape((L,) + lead + (nblocks, 2, half, lanes))
            u = xb[..., 0, :, :]
            v = xb[..., 1, :, :]
            tw = jnp.broadcast_to(
                tables[s - 1].reshape((L,) + (1,) * nb + (1, half, 1)),
                v.shape,
            )
            t = f.mul(v, tw)
            hi = f.add(u, t)
            lo = f.sub(u, t)
            x = jnp.concatenate(
                [hi[..., None, :, :], lo[..., None, :, :]], axis=-3
            ).reshape((L,) + lead + (S, lanes))
        return x

    def _four_transform(self, x: jax.Array, tA, tB, W: jax.Array,
                        revA: jax.Array, revB: jax.Array) -> jax.Array:
        """Single-chip four-step NTT (Bailey): with j = j1*B + j2 and
        k = k2*A + k1,
            X[k2*A + k1] = sum_j2 (gen^A)^(j2*k2) * gen^(k1*j2)
                           * sum_j1 x[j1*B + j2] (gen^B)^(j1*k1)
        = column transforms (length A) -> W twiddles -> transpose ->
        column transforms (length B); the final (B, A) layout IS the
        output order, so exactly one transpose total."""
        f = self.field
        L, n = x.shape[0], self.n
        if x.shape[-1] != n:
            from ..errors import DomainSizeError

            raise DomainSizeError(
                f"domain size {n} != array size {x.shape[-1]} "
                f"(cf. Class/FFT.hs:61-63)"
            )
        lead = x.shape[1:-1]
        nb = len(lead)
        X = x.reshape((L,) + lead + (self._A, self._B))
        X = self._col_transform(X, tA, revA, self._mA)
        Wb = jnp.broadcast_to(
            W.reshape((L,) + (1,) * nb + (self._A, self._B)), X.shape
        )
        X = f.mul(X, Wb)
        X = jnp.swapaxes(X, -1, -2)
        X = self._col_transform(X, tB, revB, self._mB)
        return X.reshape((L,) + lead + (n,))

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

    def _transform4(self, x: jax.Array, tables, tables4, perm) -> jax.Array:
        """Fused double-stage (radix-4) variant of _transform: every
        double-stage's five products run in ONE mul_list kernel on the
        canonical (L, *batch, n/4) shape; odd log2-size domains finish
        with one radix-2 stage.  Value growth: `a` rides through adds
        gaining ~6p per double-stage => ~66p at 2^22, far inside the
        2^13*p mul-input budget (limbs15.py invariant discipline)."""
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
        q = n // 4

        def bcast(t, half, nblocks):
            return jnp.broadcast_to(
                t.reshape((L,) + (1,) * nb + (1, half)),
                (L,) + batch + (nblocks, half),
            ).reshape((L,) + batch + (nblocks * half,))

        s = 1
        while s <= self.m:
            half = 1 << (s - 1)
            if s + 1 <= self.m:
                nblocks = n >> (s + 1)
                xb = x.reshape((L,) + batch + (nblocks, 4, half))
                a = xb[..., 0, :].reshape((L,) + batch + (q,))
                b = xb[..., 1, :].reshape((L,) + batch + (q,))
                c = xb[..., 2, :].reshape((L,) + batch + (q,))
                d = xb[..., 3, :].reshape((L,) + batch + (q,))
                tb = bcast(tables[s - 1], half, nblocks)
                tc, td, tc2, td2 = (
                    bcast(t, half, nblocks) for t in tables4[(s - 1) // 2]
                )
                e, mc, md, mc2, md2 = f.mul_list([
                    (b, tb), (c, tc), (d, td), (c, tc2), (d, td2),
                ])
                s1 = f.add(a, e)
                s2 = f.sub(a, e)
                q1 = f.add(mc, md)
                q2 = f.sub(mc2, md2)
                outs = [f.add(s1, q1), f.add(s2, q2),
                        f.sub(s1, q1), f.sub(s2, q2)]
                # same cheap interleave pattern as the radix-2 stage:
                # concatenate along the LAST axis of (nblocks, half)
                # blocks (a stack on a new axis measured 14.6 s vs
                # 0.64 s at 2^22 — catastrophic lane-granularity
                # relayout)
                x = jnp.concatenate(
                    [o.reshape((L,) + batch + (nblocks, half))
                     for o in outs], axis=-1,
                ).reshape((L,) + batch + (n,))
                s += 2
            else:
                # odd trailing radix-2 stage
                nblocks = n >> s
                xb = x.reshape((L,) + batch + (nblocks, 2, half))
                u = xb[..., 0, :].reshape((L,) + batch + (n // 2,))
                v = xb[..., 1, :].reshape((L,) + batch + (n // 2,))
                tw = bcast(tables[s - 1], half, nblocks)
                t = f.mul(v, tw)
                hi = f.add(u, t).reshape((L,) + batch + (nblocks, half))
                lo = f.sub(u, t).reshape((L,) + batch + (nblocks, half))
                x = jnp.concatenate([hi, lo], axis=-1).reshape(
                    (L,) + batch + (n,)
                )
                s += 1
        return x

    @jit_method
    def _ntt_impl(self, x, tables, perm):
        return self._transform(x, list(tables), perm)

    @jit_method
    def _ntt_impl_r4(self, x, tables, tables4, perm):
        return self._transform4(x, list(tables), list(tables4), perm)

    @jit_method
    def _intt_impl_r4(self, x, tables, tables4, perm, ninv):
        y = self._transform4(x, list(tables), list(tables4), perm)
        f = self.field
        ninv = ninv.reshape((f.L,) + (1,) * (y.ndim - 1))
        return f.mul(y, jnp.broadcast_to(ninv, y.shape))

    @jit_method
    def _intt_impl(self, x, tables, perm, ninv):
        y = self._transform(x, list(tables), perm)
        f = self.field
        ninv = ninv.reshape((f.L,) + (1,) * (y.ndim - 1))
        return f.mul(y, jnp.broadcast_to(ninv, y.shape))

    @jit_method
    def _ntt4_impl(self, x, tA, tB, W, revA, revB):
        return self._four_transform(x, list(tA), list(tB), W, revA, revB)

    @jit_method
    def _intt4_impl(self, x, tA, tB, W, revA, revB, ninv):
        y = self._four_transform(x, list(tA), list(tB), W, revA, revB)
        f = self.field
        ninv = ninv.reshape((f.L,) + (1,) * (y.ndim - 1))
        return f.mul(y, jnp.broadcast_to(ninv, y.shape))

    def _four_args(self, inverse: bool):
        sub_t = (self._subA._inv, self._subB._inv) if inverse else (
            self._subA._fwd, self._subB._fwd
        )
        W = self._W_inv if inverse else self._W_fwd
        revA = jnp.asarray(self._subA._perm)
        revB = jnp.asarray(self._subB._perm)
        return tuple(sub_t[0]), tuple(sub_t[1]), W, revA, revB

    def ntt(self, x: jax.Array) -> jax.Array:
        """Forward NTT of Montgomery-form coefficients (L, *batch, n)."""
        if self._four:
            return self._ntt4_impl(x, *self._four_args(False))
        rh = tuple(jnp.asarray(r) for r in self._rev_halves)
        if self._radix4:
            return self._ntt_impl_r4(x, tuple(self._fwd),
                                     tuple(self._fwd4), rh)
        return self._ntt_impl(x, tuple(self._fwd), rh)

    def intt(self, x: jax.Array) -> jax.Array:
        """Inverse NTT (includes division by N, cf. ntt_inverse
        bn128_poly_mont.c:472-522)."""
        if self._four:
            return self._intt4_impl(
                x, *self._four_args(True), self._ninv_mont
            )
        rh = tuple(jnp.asarray(r) for r in self._rev_halves)
        if self._radix4:
            return self._intt_impl_r4(
                x, tuple(self._inv), tuple(self._inv4), rh,
                self._ninv_mont
            )
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
