"""Batched Montgomery prime-field kernels bound to one `FieldParams`.

TPU analog of the reference's per-field generated C modules
(lib/cbits/curves/fields/mont/*_mont.c: REDC mul/sqr, pow, batch_inv,
from_std/to_std — bn128_Fr_mont.c:140-357) and of the std-representation
modules (curves/fields/std).  Unlike the reference, every operation is
batch-first and the representation is REDUNDANT (ops/limbs15.py): signed
radix-2^15 limb planes ``(L, *batch)`` int32, values congruent mod p and
only canonicalized at API boundaries — adds/subs are carry-free vector
ops, multiplication is one CIOS scan, and `mul_many` fuses arbitrarily
many independent products into a single scan (the tower layers ride this
to collapse an Fp12 multiplication into ONE kernel).

Montgomery R' = 2^(15*L) is internal; conversion to the reference's
interchange R = 2^(64*w) happens host-side in export/import helpers.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..params import FieldParams
from ..utils.convert import int_to_bits
from ..utils.jit import jit_method
from . import limbs15 as rl

I32 = jnp.int32
LB = rl.LB


def ints_to_limbs15(values: Union[int, Sequence[int]], L: int) -> np.ndarray:
    """Python ints -> radix-2^15 limb planes.  Vectorized through a byte
    matrix so encoding 2^20-element twiddle/scalar tables takes ~100 ms
    instead of tens of seconds of per-limb Python loops."""
    if isinstance(values, int):
        return np.array(
            [(values >> (LB * k)) & rl.MASK for k in range(L)], dtype=np.int32
        )
    vals = list(values)
    n = len(vals)
    if n == 0:
        return np.zeros((L, 0), np.int32)
    nbytes = (L * LB + 7) // 8 + 2
    buf = bytearray(n * nbytes)
    for i, v in enumerate(vals):
        buf[i * nbytes:(i + 1) * nbytes] = v.to_bytes(nbytes, "little")
    B = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(n, nbytes)
    ks = np.arange(L)
    bit0 = ks * LB
    byte0 = bit0 // 8
    shift = bit0 % 8
    chunk = (
        B[:, byte0].astype(np.uint32)
        | (B[:, byte0 + 1].astype(np.uint32) << 8)
        | (B[:, byte0 + 2].astype(np.uint32) << 16)
    )
    limbs = (chunk >> shift[None, :]) & rl.MASK
    return np.ascontiguousarray(limbs.T.astype(np.int32))


def limbs15_to_ints(limbs: np.ndarray) -> Union[int, List[int]]:
    """Signed redundant limb planes -> exact Python int value(s)."""
    arr = np.asarray(limbs)
    L = arr.shape[0]
    if arr.ndim == 1:
        return sum(int(arr[k]) << (LB * k) for k in range(L))
    flat = arr.reshape(L, -1)
    return [
        sum(int(flat[k, n]) << (LB * k) for k in range(L))
        for n in range(flat.shape[1])
    ]


class Field:
    """Montgomery-form prime field over signed redundant limb planes."""

    struct_ndim = 1  # leading non-batch axes (just the limb axis)

    def __init__(self, params: FieldParams):
        self.params = params
        self.p = params.p
        self.L = rl.nlimbs15(params.p)
        self.r_int = 1 << (LB * self.L)          # internal Montgomery R'
        self.r_int_inv = pow(self.r_int, -1, self.p)
        self.pinv15 = (-pow(self.p, -1, 1 << LB)) % (1 << LB)
        self.p_np = ints_to_limbs15(params.p, self.L)
        self.one_np = ints_to_limbs15(self.r_int % self.p, self.L)
        self.r2_np = ints_to_limbs15(self.r_int ** 2 % self.p, self.L)
        self.zero_np = np.zeros(self.L, np.int32)
        inv2 = pow(2, -1, self.p)
        self.inv2_np = ints_to_limbs15(inv2 * self.r_int % self.p, self.L)
        # Fermat exponent bits (LSB first) for inversion: a^(p-2)
        self.p_minus_2_bits = int_to_bits(params.p - 2)

    # -- constant accessors (broadcastable (L, 1...)) -----------------------
    def _c(self, arr: np.ndarray, batch_ndim: int) -> jax.Array:
        return jnp.asarray(arr).reshape((self.L,) + (1,) * batch_ndim)

    def consts(self, a: jax.Array):
        return self._c(self.p_np, a.ndim - 1)

    def zero(self, batch_shape=()) -> jax.Array:
        return jnp.zeros((self.L,) + tuple(batch_shape), I32)

    def one(self, batch_shape=()) -> jax.Array:
        return jnp.broadcast_to(
            self._c(self.one_np, len(batch_shape)),
            (self.L,) + tuple(batch_shape),
        )

    # -- carry-free ring ops (lazy; canonicalized only at boundaries) ------
    def add(self, a, b):
        return rl.add(a, b)

    def sub(self, a, b):
        return rl.sub(a, b)

    def neg(self, a):
        return rl.neg(a)

    def scale_small(self, a, k: int):
        """Multiply by a small static integer (4 vector ops, no reduction)."""
        return rl.scale_small(a, k)

    # When True, multiplications on batches >= one tile go through the
    # fused Pallas kernel (ops/pallas_field.py) instead of the XLA scan —
    # set BEFORE any tracing (bench enables it on the TPU backend; tests
    # stay on the scan path, Pallas interpret mode is too slow on CPU).
    use_pallas = False
    use_mxu = False           # Gram-matmul dot products on the MXU
    use_msm_kernel = True     # fused bucket kernel (only if use_pallas)
    # The VMEM bitonic sort (ops/pallas_sort.py) is bit-exact on
    # hardware but ~10x SLOWER than XLA's built-in sort: compare-
    # exchange at lane-crossing distances lowers to slow Mosaic shuffle
    # code (rolls), and reshape views with tiny trailing dims don't
    # lower at all.  A pure-XLA bitonic (1.34 s) also loses to the
    # built-in sort (150 ms at 2^18 x 8 x 28 rows) — XLA does not fuse
    # consecutive compare-exchange passes.  Keep the built-in sort;
    # kernel retained behind this flag for future Mosaic work.
    use_sort_kernel = False
    # Two half-payload variadic MSM sorts (ops/msm.py per_chunk): less
    # data movement than the broadcast-key sort_key_val — measured
    # 301.2k vs 251.3k pts/s at 2^18 (+20%), compile 134 s.  CAUTION:
    # XLA:TPU's variadic sort compile cost/VMEM footprint scales badly
    # with operand count — the single 27-operand form blows the 16M
    # scoped-VMEM limit at 2^20 and never finished compiling at 2^18;
    # keep each sort at <= ~15 operands.  "auto" = split only for
    # base-field (G1) coords: G2's Fp2 coordinates double the packed
    # rows, putting each half-sort back at 27 operands — measured
    # SLOWER than broadcast-key sort_key_val there (67.1k vs 70.3k
    # pts/s at 2^16).  ZIKKURAT_SPLIT_SORT=0/1 forces.
    use_split_sort = "auto"
    # Weighted-bucket-sum reduction strategy in the MSM: "auto" uses the
    # single-scan serial form for base-field (G1) coords — ONE group-add
    # while body instead of log-depth unrolled levels, a large compile
    # win at no measured runtime cost (251.3k vs 249.5k pts/s) — and the
    # log-depth form for tower coords (G2), where the serial loop's tiny
    # Fp2 steps are while-overhead-bound (40.7k vs 70.3k pts/s at 2^16).
    # True/False force one form (ZIKKURAT_LOGDEPTH_WSUM=1 forces False).
    use_serial_wsum = "auto"
    # Run ONE weighted bucket sum over ALL windows (stacked across the
    # chunk scan) instead of one per window chunk: the serial scan-step
    # count of the weighted sum drops by the chunk count (5x at the
    # 2^20 headline shape) while each step processes W-way batches on
    # the VPU lanes; costs the materialized (W, 2^(c-1)) bucket planes
    # (~100 MB at 2^20/c=15).  ZIKKURAT_HOISTED_WSUM=0/1 forces.
    use_hoisted_wsum = True
    # HOISTED BATCHED SORT: run every window chunk's grouping sorts as
    # ONE batched lax.sort set over the full (W, n) window axis before
    # the chunk scan (the round-4 sharded-sort A/B showed XLA:TPU sort
    # cost is per-op-overhead dominated: fewer, bigger-batch sorts
    # should win).  Costs ~n_ops*(nchunks*wc)*n*4 B of live HBM, where
    # n_ops = payload rows + key (+ iota tie-break when unstable)
    # (byte-gated in msm.py); "auto" = ON within the gates for
    # base-field (G1) coords — measured round 5 on the 2026-08
    # toolchain: 408.4k vs 380.5k pts/s at the 2^20 G1 headline
    # (+7.3%), 324.1k at 2^18 (top of the round-4 band) — and OFF for
    # Fp2 (G2): see use_stable_sort's compile note.  A forced True
    # takes precedence over AUTO sort sharding and warns when any
    # other gate still overrides it.  ZIKKURAT_HOISTED_SORT=0/1
    # forces.
    use_hoisted_sort = "auto"
    # MSM sharded grouping sort: log2 of the shard SIZE each window's
    # digit sort runs over (the pipeline only needs equal digits
    # CONTIGUOUS, so independent shard-local sorts + a cross-shard
    # group-add of bucket arrays is a valid grouping).  MEASURED A
    # LARGE NEGATIVE on v5e at 2^20 (wave-2 A/B: shards of 2^16 ->
    # 86.9k pts/s, 2^15 -> 74.0k, vs 364.0k unsharded): XLA:TPU's sort
    # gets SLOWER, not faster, as the sorted rows get shorter and more
    # numerous — its cost is not bitonic-pass-bound.  Kept as a
    # correctness-tested knob for future toolchains; 0 (off) is the
    # measured default.  ZIKKURAT_SORT_SHARD forces a log2.
    msm_sort_shard_log2 = 0
    # MSM window-merged sort: concatenate the window chunk's wc digit
    # rows into ONE sort row under a composite (window | digit) key —
    # disjoint key ranges + equal window spans mean the sorted row
    # reshapes back to per-window sorted segments exactly.  Probes the
    # opposite end of the batch-vs-length trade from the sharded sort.
    # ZIKKURAT_MERGE_SORT=0/1 forces.
    msm_sort_merge_windows = False
    # Drop the iota tie-break operand from every grouped MSM sort and rely
    # on is_stable=True instead: stability guarantees all groups (sharing
    # the identical key row) apply the IDENTICAL permutation, which is the
    # only thing the composite (digit, lane) key bought.  Bucket sums are
    # order-independent group sums, so intra-bucket order changes are
    # invisible downstream.  "auto" = stable for base-field (G1) coords
    # (measured; round-5 re-sweep: 380.5k stable vs 377.6k iota at 2^20),
    # iota for Fp2 (G2): the first G2 compile with the G1 flags ran >1 h
    # on the 2026-08 toolchain.  ZIKKURAT_STABLE_SORT=0/1 forces.
    use_stable_sort = "auto"
    # Stash the balanced-digit sign + infinity flags in the SPARE top bits
    # of the packed x-coordinate's top radix-2^32 row (381-bit coords use
    # 29 of the top row's 32 bits) instead of a dedicated flag payload row
    # — one less row through the sort network.  Requires >= 2 spare bits
    # (all three curve families qualify).  "auto" = ON for base-field
    # (G1) coords, OFF for Fp2 (G2) — see use_stable_sort's compile
    # note.  ZIKKURAT_PACKED_FLAGS=0/1.
    use_packed_flags = "auto"
    # The fused butterfly kernel measured SLOWER than the XLA butterfly
    # (whose muls already ride the Pallas CIOS) on v5e: 1.352 s vs
    # 0.987 s for NTT 2^22 — XLA's own fusion of the add/sub around the
    # big CIOS kernel beats the hand-fused version.  Kept for reference;
    # enable with ZIKKURAT_NTT_KERNEL=1.
    use_ntt_kernel = False
    pallas_tile = 512
    pallas_tile_msm = 512     # lane tile of the MSM bucket kernel (swept:
                              # 512 -> 138 ms, 256 -> 145, 1024 -> 170 at
                              # the 2^18 chunk shape)
    pallas_unroll_msm = 16    # block-positions per grid step (sublane
                              # multiple; ZIKKURAT_MSM_UNROLL to sweep).
                              # 2026-08 toolchain at the 2^20 headline
                              # shape: 16 -> 1907 ms vs 8 -> 1990 ms for
                              # the in-context sort+kernel stage (the
                              # round-3 toolchain had preferred 8)
    # Bucket-sum extraction strategy on the kernel path: True =
    # searchsorted + take_along_axis (nbuckets gathers), "pos" = one
    # int32 position scatter + gathers, False = full value scatter.
    # "auto" (default) = gather only at n >= 2^20: measured 380.0k vs
    # 364.0k pts/s there, but 170.7k vs 324.6k at 2^18 and 48.7k vs
    # 99.7k on G2 2^16 — strongly shape-dependent.
    # ZIKKURAT_GATHER_BUCKETS=0/1/pos forces.
    use_gather_buckets = "auto"
    use_msm_kernel_g2 = True  # Fp2 bucket kernel for G2 (kill switch)
    pallas_tile_msm2 = 256    # lane tile of the G2 bucket kernel (the
                              # Fp2 kernel's 6 output planes double the
                              # VMEM block footprint of G1's 3)
    pallas_interpret = False  # CPU emulation of the kernels (tests only)

    def _mul_impl(self, a, b):
        if self.use_pallas:
            from .pallas_field import mont_mul_pallas

            return mont_mul_pallas(a, b, self.p_np, self.pinv15,
                                   tile=self.pallas_tile,
                                   interpret=self.pallas_interpret)
        return rl.mont_mul(a, b, self.consts(a), self.pinv15)

    @jit_method
    def mul(self, a, b):
        return self._mul_impl(a, b)

    @jit_method
    def sqr(self, a):
        return self._mul_impl(a, a)

    @jit_method
    def mul_many(self, a_stack: jax.Array, b_stack: jax.Array) -> jax.Array:
        """Batched independent products: (L, K, *batch) pairs -> one fused
        kernel.  The tower layers flatten their Karatsuba trees onto K."""
        return self._mul_impl(a_stack, b_stack)

    def mul_list(self, pairs: Sequence[Tuple[jax.Array, jax.Array]]
                 ) -> List[jax.Array]:
        """K independent products fused into ONE CIOS kernel (list API —
        the recursion bottom for the tower layers' Karatsuba flattening)."""
        if len(pairs) == 1:
            return [self.mul(pairs[0][0], pairs[0][1])]
        A = jnp.stack([p[0] for p in pairs], 1)
        B = jnp.stack([p[1] for p in pairs], 1)
        C = self.mul_many(A, B)
        return [C[:, i] for i in range(len(pairs))]

    @jit_method(static_argnums=(2,))
    def muli(self, a, k: int):
        """Multiply by a small static integer constant (e.g. curve b)."""
        if k == 0:
            return jnp.zeros_like(a)
        if k == 1:
            return a
        return rl.scale_small(a, k)

    @jit_method
    def div2(self, a):
        """a/2 mod p via the Montgomery constant 1/2 (cf.
        bn128_Fr_std.c:241-249 `div_by_2`)."""
        c = jnp.broadcast_to(self._c(self.inv2_np, a.ndim - 1), a.shape)
        return rl.mont_mul(a, c, self.consts(a), self.pinv15)

    # -- boundary ops (canonical form) -------------------------------------
    @jit_method
    def norm(self, a) -> jax.Array:
        """Canonical [0, p) limb planes."""
        return rl.normalize(
            a, self.consts(a), self.pinv15, self._c(self.one_np, a.ndim - 1)
        )

    @jit_method
    def is_zero(self, a):
        return jnp.all(self.norm(a) == 0, axis=0)

    @jit_method
    def eq(self, a, b):
        return jnp.all(self.norm(a) == self.norm(b), axis=0)

    def select(self, pred, a, b):
        return jnp.where(pred[None], a, b)

    # -- exponentiation ----------------------------------------------------
    @jit_method
    def pow_bits(self, a: jax.Array, bits: jax.Array) -> jax.Array:
        """a ** e with `bits` the little-endian bit array of e (LSB-first
        square-and-multiply scan; branch-free select — cf. `pow_gen`,
        bn128_Fr_mont.c:222-249)."""
        one = self.one(a.shape[1:])

        def body(carry, bit):
            acc, base = carry
            both = self.mul_many(
                jnp.stack([acc, base], 1), jnp.stack([base, base], 1)
            )
            acc2 = jnp.where((bit == 1)[None], both[:, 0], acc)
            return (acc2, both[:, 1]), None

        (acc, _), _ = lax.scan(body, (one, a), jnp.asarray(bits, jnp.uint32))
        return acc

    def pow_static(self, a: jax.Array, e: int) -> jax.Array:
        if e < 0:
            return self.pow_static(self.inv(a), -e)
        if e == 0:
            return self.one(a.shape[1:])
        return self.pow_bits(a, jnp.asarray(int_to_bits(e)))

    @jit_method
    def inv(self, a: jax.Array) -> jax.Array:
        """Fermat inverse a^(p-2): constant-iteration, branch-free
        (replaces the reference's binary Euclid, bn128_Fr_std.c:252-315).
        inv(0) == 0 as in the reference."""
        return self.pow_bits(a, jnp.asarray(self.p_minus_2_bits))

    @jit_method
    def div(self, a, b):
        return self.mul(a, self.inv(b))

    @jit_method
    def batch_inv(self, a: jax.Array) -> jax.Array:
        """Montgomery batch inversion: two log-depth associative scans +
        ONE Fermat inversion (cf. the serial trick, bn128_Fr_mont.c:258-285).
        Zeros map to zero."""
        x = a.reshape(self.L, -1)
        n = x.shape[1]
        if n == 1:
            return self.inv(a)
        zero_mask = self.is_zero(x)
        one = self.one((n,))
        x1 = jnp.where(zero_mask[None], one, x)
        mulfn = lambda u, v: self.mul(u, v)
        prefix = lax.associative_scan(mulfn, x1, axis=1)
        suffix = lax.associative_scan(mulfn, x1, axis=1, reverse=True)
        total_inv = self.inv(prefix[:, -1:])
        p_shift = jnp.concatenate([self.one((1,)), prefix[:, :-1]], 1)
        s_shift = jnp.concatenate([suffix[:, 1:], self.one((1,))], 1)
        out = self.mul(self.mul(p_shift, s_shift),
                       jnp.broadcast_to(total_inv, x.shape))
        out = jnp.where(zero_mask[None], jnp.zeros_like(out), out)
        return out.reshape(a.shape)

    @jit_method
    def is_valid(self, a) -> jax.Array:
        """Whether a CANONICAL limb plane encodes a value < p
        (cf. arr_mont `is_valid`): a survives cond_sub(p) unchanged."""
        z = rl.cond_sub(a, self.consts(a))
        return jnp.all(z == a, axis=0)

    # -- square roots -------------------------------------------------------
    @jit_method
    def sqrt(self, a: jax.Array):
        """(sqrt, is_square): a^((p+1)/4) for p = 3 mod 4, else a
        CONSTANT-ITERATION Tonelli-Shanks (the branch-free fixed-structure
        loop of constant-time implementations — needed for the
        high-2-adicity Fr fields).  Device analog of the oracle's
        pure/.../Sqrt.hs.  sqrt(non-residue) reports is_square=False."""
        if self.p % 4 == 3:
            r = self.pow_bits(a, jnp.asarray(int_to_bits((self.p + 1) // 4)))
            ok = self.eq(self.sqr(r), a)
            return r, ok
        p = self.p
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        g = self.params.multiplicative_gen
        z0 = pow(g, q, p)                       # order 2^s
        bs = a.shape[1:]
        c = jnp.broadcast_to(
            self._c(ints_to_limbs15(z0 * self.r_int % p, self.L),
                    len(bs)), a.shape)
        x = self.pow_bits(a, jnp.asarray(int_to_bits((q + 1) // 2)))
        t = self.pow_bits(a, jnp.asarray(int_to_bits(q)))
        minus1 = jnp.broadcast_to(
            self._c(ints_to_limbs15((p - 1) * self.r_int % p, self.L),
                    len(bs)), a.shape)
        # fixed s-1 iterations; at level i, c has order 2^i.  The
        # textbook O(s^2)-squaring chain is kept, but STRUCTURED as two
        # nested fori_loops so the graph holds ONE squaring body instead
        # of ~s^2/2 inlined CIOS scans: at 2-adicity 46 (BLS12-377 Fp)
        # the inlined form put ~1000 while ops in one graph and a single
        # fp2_sqrt (5 sqrt calls) ran >40 min of XLA:CPU compile
        # (round-5 find; compile-time budget rule, see module docstring).
        def outer(k, st):
            x, t, c = st
            i = s - k                          # s down to 2
            t2 = lax.fori_loop(0, i - 2, lambda _, v: self.sqr(v), t)
            flag = self.eq(t2, minus1)
            x = self.select(flag, self.mul(x, c), x)
            c = self.sqr(c)
            t = self.select(flag, self.mul(t, c), t)
            return (x, t, c)

        x, t, c = lax.fori_loop(0, s - 1, outer, (x, t, c))
        ok = self.eq(self.sqr(x), a)
        return x, ok

    # -- lazy wide reductions (for chunked sums, vector.py) ----------------
    @jit_method
    def reduce_wide(self, v: jax.Array) -> jax.Array:
        """Reduce lazy columns (L, *batch) with |cols| < 2^26 to a field
        element: REDC then multiply back by R'^2."""
        nb = v.ndim - 1
        t = jnp.concatenate([v, jnp.zeros((1,) + v.shape[1:], I32)], 0)
        u = rl.mont_redc_wide(t, self._c(self.p_np, nb), self.pinv15)
        r2 = jnp.broadcast_to(self._c(self.r2_np, nb), u.shape)
        return rl.mont_mul(u, r2, self._c(self.p_np, nb), self.pinv15)

    # -- representation conversions ----------------------------------------
    @jit_method
    def to_mont(self, a_std: jax.Array) -> jax.Array:
        r2 = jnp.broadcast_to(self._c(self.r2_np, a_std.ndim - 1), a_std.shape)
        return rl.mont_mul(a_std, r2, self.consts(a_std), self.pinv15)

    @jit_method
    def from_mont(self, a: jax.Array) -> jax.Array:
        """Montgomery -> CANONICAL standard-rep limb planes (boundary op;
        canonical so bit/digit extraction is valid)."""
        nb = a.ndim - 1
        t = jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], I32)], 0)
        u = rl.mont_redc_wide(t, self._c(self.p_np, nb), self.pinv15)
        return self.norm_std(u)

    @jit_method
    def norm_std(self, a) -> jax.Array:
        """Canonicalize a lazy STANDARD-rep value in (-p, 3p) to [0, p)."""
        pb = self.consts(a)
        z = rl.full_carry(a + jnp.broadcast_to(pb, a.shape))
        z = rl.cond_sub(z, pb)
        z = rl.cond_sub(z, pb)
        z = rl.cond_sub(z, pb)
        return z

    # -- standard-representation ops (C3 parity: curves/fields/std) --------
    @jit_method
    def std_mul(self, a_std, b_std):
        """(a*b) mod p on standard-rep planes: REDC twice, no conversion
        round-trip (cf. std `mul` = bigint mul + reduce, bn128_Fr_std.c)."""
        t = rl.mont_mul(a_std, b_std, self.consts(a_std), self.pinv15)
        r2 = jnp.broadcast_to(self._c(self.r2_np, a_std.ndim - 1), t.shape)
        return rl.mont_mul(t, r2, self.consts(a_std), self.pinv15)

    @jit_method
    def std_inv(self, a_std):
        return self.from_mont(self.inv(self.to_mont(a_std)))

    def std_pow(self, a_std, e: int):
        return self.from_mont(self.pow_static(self.to_mont(a_std), e))

    # -- host encode / decode ----------------------------------------------
    def encode(self, values: Union[int, Sequence[int]], mont: bool = True):
        """Python ints (standard rep, any residue) -> device limb planes."""
        if isinstance(values, int):
            vals: Union[int, list] = values % self.p
            if mont:
                vals = (vals * self.r_int) % self.p
        else:
            vals = [v % self.p for v in values]
            if mont:
                vals = [(v * self.r_int) % self.p for v in vals]
        return jnp.asarray(ints_to_limbs15(vals, self.L))

    def decode(self, limbs, mont: bool = True):
        """Device limb planes (lazy ok) -> Python int(s) in standard rep.
        Host-side exact signed summation handles redundancy for free."""
        out = limbs15_to_ints(np.asarray(limbs))
        if isinstance(out, int):
            v = out % self.p
            return (v * self.r_int_inv) % self.p if mont else v
        return [
            (v % self.p * self.r_int_inv) % self.p if mont else v % self.p
            for v in out
        ]

    # -- reference interchange format (host) -------------------------------
    def export_ref_mont(self, limbs) -> List[int]:
        """Decode to the REFERENCE's Montgomery word format: value * R
        mod p with R = 2^(64*w) as little-endian 64-bit words (the
        interchange contract, bn128_Fr_mont.c:325-357)."""
        vals = self.decode(limbs)
        if isinstance(vals, int):
            vals = [vals]
        R = self.params.r_mont
        out = []
        for v in vals:
            m = v * R % self.p
            words = [(m >> (64 * i)) & ((1 << 64) - 1)
                     for i in range(self.params.nlimbs // 4)]
            out.append(words)
        return out

    def import_ref_mont(self, words_list: Sequence[Sequence[int]]):
        R = self.params.r_mont
        Rinv = pow(R, -1, self.p)
        vals = []
        for words in words_list:
            m = 0
            for i, w in enumerate(reversed(list(words))):
                m = (m << 64) | w
            vals.append(m * Rinv % self.p)
        return self.encode(vals)

    # -- randomness (device) -----------------------------------------------
    def rnd(self, key: jax.Array, batch_shape=()) -> jax.Array:
        """Nearly-uniform random Montgomery-form elements (bias < 2^-250;
        mirrors the reference's `rnd`, Fr/Mont.hs:107-113)."""
        shape = (2 * self.L,) + tuple(batch_shape)
        wide = jax.random.randint(key, shape, 0, 1 << LB, dtype=I32)
        nb = len(batch_shape)
        return rl.mont_redc_wide(wide, self._c(self.p_np, nb), self.pinv15)

    def batch_shape(self, a):
        return a.shape[1:]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return f"Field({self.params.name}, L={self.L})"


_FIELD_CACHE: dict = {}


def get_field(params: FieldParams) -> Field:
    f = _FIELD_CACHE.get(params.name)
    if f is None:
        with jax.ensure_compile_time_eval():   # see ntt.get_domain note
            f = Field(params)
        _FIELD_CACHE[params.name] = f
    return f
