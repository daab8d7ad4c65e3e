"""Multi-scalar multiplication (Pippenger) on limb planes.

TPU analog of the reference's bucket-method MSM
(lib/cbits/curves/g1/jac/bn128_G1_jac.c:555-692 `MSM_std_coeff_jac_out_variable`).

The reference's hot loop is a data-dependent scatter (`bucket[e] += point`)
— impossible to vectorize directly.  TPU-native reformulation
(SURVEY.md §7.2 hard part 2/3):

  per window-chunk (several windows batched on one axis):
      digit extraction -> argsort points by digit (per window)
   -> SEGMENTED associative scan with the complete group law
      (log-depth, ~2N group adds, all windows of the chunk in parallel)
   -> segment tails scattered into per-window bucket arrays
   -> weighted bucket sum  sum_b b*S_b  via a suffix associative scan +
      tree reduction (log-depth replacement for the serial running sums,
      jac.c:620-631)
  window results combined by Horner: res = 2^c * res + W_w.

Every group operation is the branch-free complete projective formula, so
infinities and duplicate points need no special-casing anywhere.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.jit import jit_method
from .curve import ProjCurveOps, Point, AffBatch, limbs_to_bits

U32 = jnp.uint32

# Effective-path record of the most recent msm_std TRACE (not call: cached
# jits skip tracing).  bench.py attaches this to its JSON line so gated-off
# flags can't be misread as measurements (ADVICE round-4).
LAST_PATH: dict = {}


def _flag(f, name, default):
    """Resolve a tuning flag, falling through tower wrappers to the base
    Field.  Tower objects (G2's Fp2 coordinates) carry no tuning
    attributes of their own, so a bare getattr on ops.f silently fell
    back to the getattr default there — Field-class defaults and
    env-forced A/B flags never reached G2 runs (round-5 fix)."""
    while True:
        if hasattr(f, name):
            return getattr(f, name)
        if not hasattr(f, "base"):
            return default
        f = f.base


def window_size(n: int) -> int:
    """Reference heuristic c = round(log2 N - 3.5), clamped
    (bn128_G1_jac.c:648-650).  Upper clamp 15 (not the reference's wider
    range): measured at 2^20, c=15 gives 352.2k pts/s vs c=16's 336.3k —
    past 2^14 buckets the doubled bucket arrays and weighted sum cost
    more than the saved window."""
    if n <= 1:
        return 1
    c = round(math.log2(n) - 3.5)
    return max(1, min(15, c))


def digits_from_limbs(k_limbs: jax.Array, c: int, nbits: int) -> jax.Array:
    """CANONICAL standard-rep scalar limb planes (Lr, N) -> per-window
    c-bit digits (windows, N) int32 (cf. digit extraction straddling word
    boundaries, bn128_G1_jac.c:600-605)."""
    bits = limbs_to_bits(k_limbs)             # (15*Lr, N)
    windows = -(-nbits // c)
    need = windows * c
    have = bits.shape[0]
    if have < need:
        pad = jnp.zeros((need - have,) + bits.shape[1:], U32)
        bits = jnp.concatenate([bits, pad], 0)
    bits = bits[:need].reshape((windows, c) + bits.shape[1:])
    weights = (jnp.uint32(1) << jnp.arange(c, dtype=U32)).reshape(
        (1, c) + (1,) * (bits.ndim - 2)
    )
    return jnp.sum(bits * weights, axis=1).astype(jnp.int32)


def signed_digits(digits: jax.Array, c: int) -> jax.Array:
    """Unsigned c-bit window digits (W, N) -> BALANCED digits in
    [-2^(c-1), 2^(c-1)] with one extra carry window appended (W+1, N).
    Halves the bucket range: sum_w d_w 2^(cw) is preserved."""
    half = 1 << (c - 1)
    full = 1 << c

    def body(carry, d):
        t = d + carry
        neg = t > half
        out = jnp.where(neg, t - full, t)
        return neg.astype(jnp.int32), out

    carry0 = jnp.zeros(digits.shape[1:], jnp.int32)
    carry, out = lax.scan(body, carry0, digits)
    return jnp.concatenate([out, carry[None]], 0)


def _tree_reduce(ops: ProjCurveOps, P: Point) -> Point:
    """Sum points along the LAST axis by repeated halving (log depth);
    leading batch axes are preserved."""
    def n_of(P):
        return P[0].shape[-1]

    while n_of(P) > 1:
        n = n_of(P)
        if n % 2:
            inf = ops.infinity(P[0].shape[ops.f.struct_ndim:-1] + (1,))
            P = tuple(
                jnp.concatenate([p, i], axis=-1) for p, i in zip(P, inf)
            )
            n += 1
        half = n // 2
        A = tuple(p[..., :half] for p in P)
        B = tuple(p[..., half:] for p in P)
        P = ops.add(A, B)
    return tuple(p[..., 0] for p in P)


def _scan_reduce(ops: ProjCurveOps, T: Point) -> Point:
    """Sum points along the last axis with ONE lax.scan (serial steps on
    small arrays).  Runtime ~= _tree_reduce for the small axes this is
    used on, but the group-add formula is instantiated ONCE instead of
    log2(n) times — XLA:TPU compile time of the MSM module is dominated
    by the sheer number of while bodies, each a full RCB15 add."""
    Ts = tuple(jnp.moveaxis(t, -1, 0) for t in T)

    def body(acc, t):
        return ops.add(acc, t), None

    acc0 = ops.infinity(T[0].shape[ops.f.struct_ndim:-1])
    out, _ = lax.scan(body, acc0, Ts)
    return out


def _scan_wsum(ops: ProjCurveOps, T: Point, from_one: bool) -> Point:
    """sum_i w_i T_i with w = 1..n (from_one) or 0..n-1, as ONE lax.scan
    over the reversed axis carrying (suffix, total):
      suffix_k = sum_{i>=k} T_i;  total = sum_k suffix_k  counts T_i
    exactly (i+1) times (w from 1); accumulating total BEFORE the suffix
    update drops the full-sum head (w from 0)."""
    Ts = tuple(jnp.flip(jnp.moveaxis(t, -1, 0), 0) for t in T)

    def body(carry, t):
        suf, tot = carry
        if from_one:
            suf = ops.add(suf, t)
            tot = ops.add(tot, suf)
        else:
            tot = ops.add(tot, suf)
            suf = ops.add(suf, t)
        return (suf, tot), None

    inf = ops.infinity(T[0].shape[ops.f.struct_ndim:-1])
    (suf, tot), _ = lax.scan(body, (inf, inf), Ts)
    return tot


def _weighted_bucket_sum(ops: ProjCurveOps, S: Point) -> Point:
    """sum_b (b+1) * S_b over the last axis (the Pippenger weighted
    bucket sum, digit = index+1) in ~2B group adds instead of the
    ~B*log2(B) of a full suffix scan (the log-depth replacement for the
    serial running sums, bn128_G1_jac.c:620-631).

    Two-level decomposition: write b = hi*M + lo (M = 2^k ~ sqrt(B)).
      sum_b (b+1) S_b = M * sum_hi hi*R_hi + sum_lo (lo+1)*C_lo
    with row sums R_hi = sum_lo S and column sums C_lo = sum_hi S —
    two reductions (~2B adds) plus two sqrt(B)-sized weighted sums and
    k doublings.  Reductions are single-scan (ONE group-add while body
    instead of log2(B) of them — the TPU compile time of the MSM module
    scales with the while-body count); the log-depth originals are kept
    behind use_serial_wsum=False for runtime A/B."""
    B = S[0].shape[-1]
    serial = _flag(ops.f, "use_serial_wsum", "auto")
    if serial == "auto":
        serial = ops.f.struct_ndim == 1
    if B <= 64 and serial:
        return _scan_wsum(ops, S, from_one=True)
    if B <= 512 and not serial:
        add = lambda A_, B_: ops.add(A_, B_)
        suffix = lax.associative_scan(add, S, axis=S[0].ndim - 1,
                                      reverse=True)
        return _tree_reduce(ops, suffix)
    k = (B - 1).bit_length() // 2
    M = 1 << k
    H = -(-B // M)
    pad = H * M - B
    if pad:
        inf = ops.infinity(S[0].shape[ops.f.struct_ndim:-1] + (pad,))
        S = tuple(jnp.concatenate([s, i], -1) for s, i in zip(S, inf))
    G = tuple(s.reshape(s.shape[:-1] + (H, M)) for s in S)
    if serial:
        R = _scan_reduce(ops, G)                   # (.., H): sum over lo
        C = _scan_reduce(ops, tuple(jnp.swapaxes(g, -1, -2) for g in G))
        Whi = _scan_wsum(ops, R, from_one=False)
        Wlo = _scan_wsum(ops, C, from_one=True)
    else:
        add = lambda A_, B_: ops.add(A_, B_)
        axis = S[0].ndim - 1
        R = _tree_reduce(ops, G)
        C = _tree_reduce(ops, tuple(jnp.swapaxes(g, -1, -2) for g in G))

        def wsum(T, from_one):
            suf = lax.associative_scan(add, T, axis=axis, reverse=True)
            if not from_one:
                suf = tuple(s[..., 1:] for s in suf)
            return _tree_reduce(ops, suf)

        Whi = wsum(R, from_one=False)
        Wlo = wsum(C, from_one=True)

    def dbl_step(_, r):
        return ops.dbl(r)

    Whi = lax.fori_loop(0, k, dbl_step, Whi)
    return ops.add(Whi, Wlo)


def _segment_scan_tails(ops: ProjCurveOps, P: Point, seg_id: jax.Array
                        ) -> Tuple[Point, jax.Array]:
    """Inclusive segmented scan of points along the last axis, grouped by
    sorted seg_id (*batch, N).  Tail positions hold each segment's sum."""
    n = seg_id.shape[-1]
    rank = P[0].ndim
    ones = jnp.ones(seg_id.shape[:-1] + (1,), jnp.bool_)
    first = jnp.concatenate(
        [ones, seg_id[..., 1:] != seg_id[..., :-1]], axis=-1
    ).reshape((1,) * (rank - seg_id.ndim) + seg_id.shape)

    def combine(a, b):
        (pa, fa) = a
        (pb, fb) = b
        summed = ops.add(pa, pb)
        pred = fb.reshape(fb.shape[len(fb.shape) - seg_id.ndim:])
        pt = ops.select(pred, pb, summed)
        return (pt, jnp.logical_or(fa, fb))

    scanned, _ = lax.associative_scan(combine, (P, first), axis=rank - 1)
    tail = jnp.concatenate(
        [seg_id[..., 1:] != seg_id[..., :-1],
         jnp.ones(seg_id.shape[:-1] + (1,), jnp.bool_)], axis=-1
    )
    return scanned, tail


def _segment_reduce_blocked(ops: ProjCurveOps, aff, seg_id: jax.Array,
                            m: int, nbuckets: int):
    """Two-level blocked segmented reduction (GPU-style segmented scan):

    level 1: in-block running MIXED-ADD chains that RESTART at segment
             boundaries (batch = all blocks x windows) — either ONE
             fused Pallas kernel with the accumulator resident in VMEM
             (ops/pallas_curve.py) or a lax.scan of m madd steps;
    level 2: per-block trailing partials are combined across consecutive
             connected blocks by a small segmented associative scan
             (N/m elements), and each cross-block carry is scattered into
             a correction bucket array.

    aff = (x, y, inf) SORTED canonical affine planes (sign pre-applied
    to y); seg_id must be sorted along the last axis; the caller pads N
    to a multiple of m.  Returns (running values (*,wc,N), tail mask,
    correction buckets tuple, correction index (wc, nblk))."""
    wc, n = seg_id.shape
    nblk = n // m
    d_blk = seg_id.reshape(wc, nblk, m)

    def split_blocks(p):
        z = p.reshape(p.shape[:-1] + (nblk, m))
        return jnp.moveaxis(z, -1, 0)          # (m, ..., wc, nblk)

    prev = jnp.concatenate([d_blk[..., :1], d_blk[..., :-1]], -1)
    new_seg = d_blk != prev
    new_seg = new_seg.at[..., 0].set(True)     # block starts restart
    new_m = jnp.moveaxis(new_seg, -1, 0)       # (m, wc, nblk)

    x, y, inf = aff
    aff_m = (split_blocks(x), split_blocks(y), split_blocks(inf))

    def body(acc, inp):
        pt, new = inp
        summed = ops.madd(acc, pt)
        nxt = ops.select(new, ops.from_affine(pt), summed)
        return nxt, nxt

    acc0 = ops.infinity((wc, nblk))
    _, ys_m = lax.scan(body, acc0, (aff_m, new_m))
    S = tuple(y[-1] for y in ys_m)             # trailing partials (.., wc, nblk)
    ys = tuple(
        jnp.moveaxis(y, 0, -1).reshape(y.shape[1:-2] + (wc, n,))
        for y in ys_m
    )

    # global tail mask (next element differs, or global end)
    tail = jnp.concatenate(
        [seg_id[..., 1:] != seg_id[..., :-1],
         jnp.ones((wc, 1), jnp.bool_)], axis=-1
    )
    C, cidx = _level2_carries(ops, d_blk, S, nbuckets)
    return ys, tail, C, cidx


def _level2_carries(ops: ProjCurveOps, d_blk: jax.Array, S, nbuckets: int):
    """Cross-block carry combination (level 2 of the blocked segmented
    reduction): combine trailing partials S of consecutive connected
    blocks with a small segmented associative scan and return the
    correction points C plus the bucket index (cidx) each carry lands in
    (the block where the spanning segment ENDS)."""
    wc, nblk, m = d_blk.shape
    d_first = d_blk[..., 0]
    d_last = d_blk[..., -1]
    uniform = d_first == d_last                # sorted => uniform block
    conn = jnp.concatenate(
        [jnp.zeros((wc, 1), jnp.bool_), d_first[:, 1:] == d_last[:, :-1]], 1
    )
    # T_b = S_b + [uniform_b & conn_b] * T_{b-1}  (segmented scan over blocks)
    brk_flag = jnp.logical_not(jnp.logical_and(uniform, conn))
    rank = S[0].ndim
    flag_leaf = brk_flag.reshape((1,) * (rank - 2) + brk_flag.shape)

    def combine(a, b):
        (pa, fa) = a
        (pb, fb) = b
        summed = ops.add(pa, pb)
        pred = fb.reshape(fb.shape[-2:])
        pt = ops.select(pred, pb, summed)
        return (pt, jnp.logical_or(fa, fb))

    T, _ = lax.associative_scan(combine, (S, flag_leaf), axis=rank - 1)
    # carry INTO block b = T_{b-1} when connected to the previous block
    inf1 = ops.infinity((wc, 1))
    T_shift = tuple(
        jnp.concatenate([i, t[..., :-1]], -1) for t, i in zip(T, inf1)
    )
    C = ops.select(conn, T_shift, ops.infinity((wc, nblk)))
    # the carry lands in the block where the spanning segment ENDS:
    # either the block has an internal break, or the segment does NOT
    # continue into the next block (incl. the final block)
    conn_next = jnp.concatenate(
        [conn[:, 1:], jnp.zeros((wc, 1), jnp.bool_)], 1
    )
    ends_here = jnp.logical_and(
        conn,
        jnp.logical_or(jnp.logical_not(uniform),
                       jnp.logical_not(conn_next)),
    )
    cidx = jnp.where(ends_here, d_first, nbuckets)
    return C, cidx


def _buckets_pallas(ops: ProjCurveOps, px, py, flagrow, seg_id: jax.Array,
                    m: int, nbuckets: int):
    """Bucket accumulation with the fused Pallas level-1 kernel
    (pallas_curve.block_madd_scan): packed sorted payload in, bucket
    arrays out — no unpacking pass and no output relayout (the kernel
    writes (L, m, B) which the scatter consumes directly).

    px, py: (Rp, wc, n) PACKED sorted coordinate rows (for Fp2 coords the
    rows interleave components (w, c) as built by pack32+reshape);
    flagrow (wc, n) int32 with SIGN|INF bits (straight off the sort);
    seg_id (wc, n) sorted digits.  Returns the (wc, nbuckets+1) bucket
    array tuple (slot nbuckets = dump)."""
    from .pallas_curve import block_madd_scan, block_madd_scan2, NEW_BIT

    f = ops.f
    g2 = hasattr(f, "base")                    # QuadExt (Fp2) coords
    fb = f.base if g2 else f
    L = fb.L
    wc, n = seg_id.shape
    nblk = n // m
    B = wc * nblk
    d_blk = seg_id.reshape(wc, nblk, m)

    def stream(rows):                          # (R, wc, n) -> (m, R, B)
        z = rows.reshape(rows.shape[0], wc, nblk, m)
        return jnp.moveaxis(z, -1, 0).reshape(m, rows.shape[0], B)

    prev = jnp.concatenate([d_blk[..., :1], d_blk[..., :-1]], -1)
    new_seg = d_blk != prev
    new_seg = new_seg.at[..., 0].set(True)     # block starts restart
    new_m = jnp.moveaxis(new_seg, -1, 0)       # (m, wc, nblk)
    flg = (
        stream(flagrow[None])[:, 0]
        | jnp.where(new_m, NEW_BIT, 0).reshape(m, B)
    )

    if g2:
        W32 = px.shape[0] // 2
        pxc = px.reshape(W32, 2, wc, n)
        pyc = py.reshape(W32, 2, wc, n)
        outs = block_madd_scan2(
            stream(pxc[:, 0]), stream(pxc[:, 1]),
            stream(pyc[:, 0]), stream(pyc[:, 1]),
            flg, L, fb.p_np, fb.pinv15, f.qnr, ops.b3, fb.one_np,
            tile=getattr(fb, "pallas_tile_msm2", 256),
            unroll=getattr(fb, "pallas_unroll_msm", 8),
            interpret=fb.pallas_interpret,
        )                                      # six (L, m, B) planes
        X = jnp.stack(outs[0:2], 1)            # (L, 2, m, B)
        Y = jnp.stack(outs[2:4], 1)
        Z = jnp.stack(outs[4:6], 1)
    else:
        X, Y, Z = block_madd_scan(
            stream(px), stream(py), flg, L, f.p_np, f.pinv15, ops.b3,
            f.one_np, tile=f.pallas_tile_msm,
            unroll=getattr(f, "pallas_unroll_msm", 8),
            interpret=f.pallas_interpret,
        )                                      # (L, m, B) running values

    S = tuple(
        o[..., -1, :].reshape(o.shape[:-2] + (wc, nblk)) for o in (X, Y, Z)
    )
    C, cidx = _level2_carries(ops, d_blk, S, nbuckets)
    rows2 = jnp.arange(wc, dtype=jnp.int32)[:, None]
    binf = ops.infinity((wc, nbuckets + 1))
    corr = tuple(
        b.at[..., rows2, cidx].set(s) for b, s in zip(binf, C)
    )

    gather_mode = _flag(ops.f, "use_gather_buckets", "auto")
    if gather_mode == "auto":
        # measured crossover (wave 5): at n=2^20 the searchsorted
        # gather wins (380.0k vs 364.0k pts/s); at n=2^18/wc=8 it
        # LOSES BADLY (170.7k vs 324.6k) and G2 2^16 drops 2x
        # (48.7k vs 99.7k) — gather only at the largest shapes
        gather_mode = n >= (1 << 20)
    if gather_mode:
        # GATHER formulation: bucket b's in-block sum sits at the LAST
        # position holding digit b (seg_id is sorted); only nbuckets
        # values per window are read instead of scattering all n
        # running values (~96% of which hit the dump slot).  Measured
        # 2462 vs 2563 ms for the sort+bucket stage at 2^20.  The tail
        # position map comes either from ONE int32 position scatter
        # (mode "pos": n 4-byte updates, 1/78th of the value-scatter
        # bytes) or a binary search per bucket (mode True).
        run = tuple(
            jnp.moveaxis(
                o.reshape(o.shape[:-2] + (m, wc, nblk)), -3, -1
            ).reshape(o.shape[:-2] + (wc, n))
            for o in (X, Y, Z)
        )
        if gather_mode == "pos":
            tailm = jnp.concatenate(
                [seg_id[..., 1:] != seg_id[..., :-1],
                 jnp.ones((wc, 1), jnp.bool_)], axis=-1
            )
            tidx = jnp.where(tailm, seg_id, nbuckets)   # (wc, n)
            pos_iota = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None], (wc, n)
            )
            posmap = jnp.full((wc, nbuckets + 1), n, jnp.int32)
            posmap = posmap.at[rows2, tidx].set(pos_iota)
            pos = posmap[..., :nbuckets]                # (wc, nbuckets)
            present = pos < n
            posc = jnp.minimum(pos, n - 1)
        else:
            bvals = jnp.arange(nbuckets, dtype=jnp.int32)
            pos = jax.vmap(
                lambda row: jnp.searchsorted(row, bvals, side="right")
            )(seg_id).astype(jnp.int32) - 1             # (wc, nbuckets)
            posc = jnp.maximum(pos, 0)
            present = jnp.logical_and(
                pos >= 0,
                jnp.take_along_axis(seg_id, posc, axis=-1)
                == bvals[None],
            )
        idxb = jnp.broadcast_to(posc, run[0].shape[:-1] + (nbuckets,))
        vals = tuple(jnp.take_along_axis(r, idxb, axis=-1) for r in run)
        buckets = ops.select(
            present, vals, ops.infinity((wc, nbuckets))
        )
        pad1 = ops.infinity((wc, 1))
        buckets = tuple(
            jnp.concatenate([b, p], -1) for b, p in zip(buckets, pad1)
        )
        return ops.add(buckets, corr)

    # stream-layout tail extraction + scatter (cf. the XLA path's): the
    # running value at a segment's global tail position is the segment's
    # in-block sum; everything else goes to the dump slot.
    tail = jnp.concatenate(
        [seg_id[..., 1:] != seg_id[..., :-1],
         jnp.ones((wc, 1), jnp.bool_)], axis=-1
    ).reshape(wc, nblk, m)
    tail_s = jnp.moveaxis(tail, -1, 0)          # (m, wc, nblk)
    d_s = jnp.moveaxis(d_blk, -1, 0)            # (m, wc, nblk)
    idx = jnp.where(tail_s, d_s, nbuckets)
    rows = jnp.arange(wc, dtype=jnp.int32)[None, :, None]
    buckets = tuple(
        b.at[..., rows, idx].set(o.reshape(o.shape[:-2] + (m, wc, nblk)))
        for b, o in zip(binf, (X, Y, Z))
    )
    return ops.add(buckets, corr)


class MSM:
    """Pippenger MSM bound to one curve group."""

    def __init__(self, ops: ProjCurveOps, nbits: int):
        self.ops = ops
        self.nbits = nbits

    @jit_method(static_argnums=(3, 4, 5))
    def msm_std(self, k_limbs: jax.Array, points: AffBatch,
                c: Optional[int] = None,
                window_chunk: Optional[int] = None,
                block: int = 128) -> Point:
        """MSM with CANONICAL standard-rep scalar limb planes (Lr, N) and
        affine points; returns one projective point.
        (cf. MSM_std_coeff_proj_out, bn128_G1_proj.h:43-49)

        window_chunk: how many windows ride the batch axis of one
        segmented scan (memory/parallelism trade; auto by default).
        block: level-1 block length of the blocked segmented reduction
        (0 = use the associative-scan formulation instead)."""
        ops = self.ops
        n = k_limbs.shape[-1]
        if points[0].shape[-1] != n or points[1].shape[-1] != n:
            from ..errors import DimensionError

            raise DimensionError(
                f"incompatible array dimensions: {n} scalars vs "
                f"{points[0].shape[-1]} points (cf. G1/Proj.hs:239)"
            )
        if c is None:
            c = window_size(n)
        # BALANCED (signed) digits halve the bucket range: bucket index is
        # |digit| in 1..2^(c-1), the sign conditionally negates the point
        nbuckets = (1 << (c - 1)) + 1
        digits = signed_digits(
            digits_from_limbs(k_limbs, c, self.nbits), c
        )                                                   # (W+1, N)
        W = digits.shape[0]
        if window_chunk is None:
            # 8 windows align with TPU sublanes (a (wc, n) plane is
            # physically tiled in sublane units of 8, so wc<8 buys
            # nothing); cap so the gathered coordinate arrays
            # (~3 * L * 2 * wc * n * 4B) + scan temporaries stay well
            # under HBM (signed digits halved the bucket arrays, which
            # bought wc=4 at 2^20: measured 156.8k vs 126.4k points/s
            # at wc=2).  NOTE the hoisted weighted sum (the default)
            # additionally stacks (nchunks, L.., wc, B) bucket planes
            # across the chunk scan — ~100 MB at 2^20/c=15, growing as
            # 2^(c-1); still far under the 16 GB HBM at every supported
            # shape (c is clamped to 15), so the cap formula stands.
            window_chunk = max(1, min(8, (1 << 22) // max(n, 1)))
            # Under the HOISTED batched sort wc no longer shapes the
            # sort (one sort set over all W windows either way), only
            # the chunk scan — and wc=2 DOMINATES the old cap formula
            # on hardware (BASELINE round 5: 437.0k vs 408.7k pts/s at
            # 2^20, 405.5k vs 324.3k at 2^18, 477.4k at 2^21): smaller
            # chunks shrink the gathered coordinate arrays and scan
            # temporaries while the hoisted weighted sum still batches
            # ALL windows.  Use 2 whenever the hoist will engage
            # (base-field coords, byte gate passes — the conservative
            # estimate below upper-bounds the exact gate's sort_bytes).
            # ...but only at n >= 2^18: at 2^16 the 12 tiny chunk-scan
            # steps dominate (191.6k wc=2 vs 254.1k wc=8 measured)
            if (ops.f.struct_ndim == 1 and window_chunk > 1 and W > 2
                    and n >= (1 << 18)):
                hf = _flag(ops.f, "use_hoisted_sort", "auto")
                fb0 = ops.f
                while hasattr(fb0, "base"):
                    fb0 = fb0.base
                w32e = -(-fb0.p.bit_length() // 32)
                est = (2 * w32e + 2) * (-(-W // 2) * 2) * n * 4
                if hf in ("auto", True) and est <= (9 << 29):
                    window_chunk = 2
        wc = min(window_chunk, W)
        nchunks = -(-W // wc)
        hoisted = _flag(ops.f, "use_hoisted_wsum", True)
        if nchunks * wc != W:  # pad top windows with zero digits (inert)
            digits = jnp.concatenate(
                [digits, jnp.zeros((nchunks * wc - W, n), jnp.int32)], 0
            )
        digits = digits.reshape(nchunks, wc, n)
        ax, ay, ainf = points
        if block and n % block:
            # pad the domain to a block multiple: digit = nbuckets sorts
            # to the end and scatters to the dump slot; points = infinity
            padn = (-n) % block
            digits = jnp.pad(digits, ((0, 0), (0, 0), (0, padn)),
                             constant_values=nbuckets)
            ax = jnp.pad(ax, ((0, 0),) * (ax.ndim - 1) + ((0, padn),))
            ay = jnp.pad(ay, ((0, 0),) * (ay.ndim - 1) + ((0, padn),))
            ainf = jnp.pad(ainf, ((0, padn),), constant_values=True)
            n = n + padn

        # SHARDED grouping sort: the bucket pipeline needs digits GROUPED
        # (equal digits contiguous), not globally sorted — XLA:TPU's sort
        # is a bitonic network with ~k(k+1)/2 passes over every payload
        # operand (k = log2 n), so sorting S independent shards of n/S
        # elements cuts the pass count (k' = k - log2 S) while remaining
        # a valid grouping.  Each shard scatters into its own bucket
        # array; shards are then group-added (B*log2 S extra adds per
        # window, a few % of the level-1 madd work).  msm_sort_shard_log2
        # sets the shard SIZE; 0 disables.
        shard_l2 = _flag(ops.f, "msm_sort_shard_log2", "auto")
        if shard_l2 == "auto":
            # an EXPLICITLY forced hoisted sort takes precedence over
            # auto sharding (its gate requires nshards == 1; without
            # this the forced A/B silently re-measures the sharded
            # baseline — ADVICE round-4)
            if _flag(ops.f, "use_hoisted_sort", "auto") is True:
                shard_l2 = 0
            else:
                shard_l2 = 16
        sh = (1 << shard_l2) if shard_l2 else 0
        nshards = 1
        if (sh and n > sh and n % sh == 0
                and (not block or sh % block == 0)
                and not _flag(ops.f, "use_sort_kernel", False)):
            nshards = n // sh

        # canonicalize the AFFINE coords (inputs may be lazy-band, e.g.
        # straight from to_affine), then pack into DENSE radix-2^32 rows
        # (limbs15.pack32): only x and y ride the sort network (the third
        # projective coordinate is reconstructed from the inf flag after
        # sorting), at ceil(bits/32) int32 rows per base-field coordinate
        # instead of ceil(L/2) two-limbs-per-word rows (BLS12-381 G1:
        # 12 vs 14 rows/coord) — sort cost is proportional to payload rows
        from .limbs15 import pack32

        A = (ops.f.norm(ax), ops.f.norm(ay))
        coord_shapes = [p.shape for p in A]
        fb = ops.f
        while hasattr(fb, "base"):
            fb = fb.base
        cbits = fb.p.bit_length()
        W32 = -(-cbits // 32)
        packed_rows = []
        for p in A:
            pk = pack32(p, cbits)              # (W32,) + struct + (n,)
            packed_rows.append(pk.reshape(-1, n))
        packed = jnp.concatenate(packed_rows, 0)            # (Rp, N)
        row_counts = [r.shape[0] for r in packed_rows]
        infi = ainf.astype(jnp.int32)
        # flag packing: the top radix-2^32 row of each packed coordinate
        # has 32*W32 - cbits spare bits; with >= 2 spare the per-window
        # sign|inf flags ride INSIDE the last x row instead of a dedicated
        # payload row (one less row through the sort network)
        flag_shift = cbits - 32 * (W32 - 1)
        # fp2-aware autos: the G1 measurements (packed flags, stable
        # single-key sorts, hoisted batched sort) do NOT transfer to Fp2
        # coordinates untested — the first G2 compile with the G1
        # defaults ran >1 h on the 2026-08 toolchain (the variadic-sort
        # merge pathology class).  Until a G2 A/B lands, "auto" keeps
        # the round-3/4 measured G2 graph; forced flags still win.
        base_coords = ops.f.struct_ndim == 1
        pf_flag = _flag(ops.f, "use_packed_flags", "auto")
        if pf_flag == "auto":
            pf_flag = base_coords
        pack_flags = bool(pf_flag) and flag_shift <= 30
        topx = row_counts[0] - 1
        import numpy as _np

        flag_clear = jnp.int32(_np.int32(_np.uint32(
            ((1 << 32) - 1) ^ (3 << flag_shift)
        )))

        def finish(buckets):
            """Drop bucket 0 + dump slot, merge sort shards (group add
            across the shard axis), then either emit raw bucket planes
            (hoisted weighted sum) or this chunk's window points."""
            buckets = tuple(b[..., 1:nbuckets] for b in buckets)
            if nshards > 1:
                buckets = tuple(
                    jnp.moveaxis(
                        b.reshape(
                            b.shape[:-2] + (wc, nshards, b.shape[-1])
                        ),
                        -2, -1,
                    )
                    for b in buckets
                )
                buckets = _tree_reduce(ops, buckets)
            if hoisted:
                return None, buckets
            return None, _weighted_bucket_sum(ops, buckets)

        def build_rows(digit):
            # digit: (B, N) SIGNED window digits (B = wc per chunk, or
            # nchunks*wc on the hoisted-sort path).  Sort points by
            # |digit| per window WITHOUT a gather: TPUs have no hardware
            # gather (jnp.take lowers to serial/one-hot code), so the
            # packed coordinate planes ride the sort network as payload of
            # ONE variadic lax.sort (num_keys=1: the comparator reads only
            # the digit operand, every payload row moves under the same
            # permutation) — the balanced-digit sign and the infinity mask
            # share one extra payload row.
            ad = jnp.abs(digit)
            sg = (digit < 0).astype(jnp.int32)
            flagrow = sg | (infi[None] << 1)                # (B, n)
            if pack_flags:
                # sign|inf ride the spare top bits of the last x row
                rows_all = [
                    (packed[i][None] | (flagrow << flag_shift))
                    if i == topx
                    else jnp.broadcast_to(packed[i], ad.shape)
                    for i in range(packed.shape[0])
                ]
            else:
                rows_all = [
                    jnp.broadcast_to(packed[i], ad.shape)
                    for i in range(packed.shape[0])
                ] + [flagrow]
            return ad, rows_all

        def run_sorts(ad, rows_all):
            if (_flag(ops.f, "use_pallas", False)
                    and _flag(ops.f, "use_sort_kernel", False)
                    and n & (n - 1) == 0 and n >= 2048):
                from .pallas_sort import sort_key_val_pallas

                flat = jnp.stack(rows_all)
                d_sorted, sorted_flat = sort_key_val_pallas(
                    ad, flat, interpret=ops.f.pallas_interpret
                )
                srows = [sorted_flat[i] for i in range(sorted_flat.shape[0])]
                return d_sorted, srows
            if _flag(ops.f, "use_split_sort", "auto") in ("auto", True):
                # GROUPED variadic sorts, <= 13 payload rows each.  The
                # single all-rows variadic sort (one comparator, least
                # data movement) is a COMPILER KILLER: XLA:TPU allocates
                # scoped VMEM per sort operand and blows the 16M limit at
                # (4, 2^20) x 27 rows ("Ran out of memory in memory space
                # vmem ... sort"), and at 2^18 the compile ran >50 min
                # until the remote compile service dropped the connection
                # — twice.  Grouping bounds the per-op footprint.  All
                # groups must apply the IDENTICAL permutation: either the
                # sort is STABLE over the shared key row (use_stable_sort,
                # one key operand), or a (digit, lane-index) composite key
                # is UNIQUE (two key operands).  Measured at 2^18 G1:
                # 301.2k pts/s vs 251.3k for the broadcast-key
                # sort_key_val (+20%); G2's packed rows become four
                # grouped sorts.
                stable = _flag(ops.f, "use_stable_sort", "auto")
                if stable == "auto":
                    # fp2-aware (see pack_flags note above)
                    stable = ops.f.struct_ndim == 1
                if not stable:
                    iota = jnp.broadcast_to(
                        jnp.arange(ad.shape[-1], dtype=jnp.int32)[None],
                        ad.shape,
                    )
                GROUP = 13
                srows = []
                d_sorted = None
                for off in range(0, len(rows_all), GROUP):
                    # each group past the first sorts an
                    # optimization_barrier'd COPY of the key: XLA's sort
                    # simplifier otherwise MERGES same-key sorts back
                    # into the single >=26-operand variadic sort this
                    # grouping exists to avoid (observed on the 2026-08
                    # toolchain: the merged sort blows the 16M scoped
                    # VMEM limit at (4, 2^20) and the compile dies after
                    # ~55 min — the round-2 compiler-killer resurrected
                    # by the compiler itself).  The barrier is free at
                    # runtime; stability keeps the permutations equal.
                    key = ad if off == 0 else lax.optimization_barrier(ad)
                    if stable:
                        out = lax.sort(
                            [key] + rows_all[off:off + GROUP],
                            dimension=1, num_keys=1, is_stable=True,
                        )
                        grp = out[1:]
                    else:
                        key2 = (iota if off == 0
                                else lax.optimization_barrier(iota))
                        out = lax.sort(
                            [key, key2] + rows_all[off:off + GROUP],
                            dimension=1, num_keys=2,
                        )
                        grp = out[2:]
                    if d_sorted is None:
                        d_sorted = out[0]
                    srows += list(grp)
                return d_sorted, srows
            # FALLBACK: two-operand sort_key_val with the key BROADCAST
            # next to every payload row (one 3-D payload array).  This
            # moves the key redundantly (2x traffic vs the variadic
            # form) but is the formulation the TPU compiler handles
            # well — measured 245k pts/s end-to-end at 2^18 in round 2,
            # while the 27-operand variadic form never finished
            # compiling.
            flat = jnp.stack(rows_all)
            keys = jnp.broadcast_to(ad[None], flat.shape)
            _, sorted_flat = lax.sort_key_val(keys, flat, dimension=2)
            d_sorted = lax.sort(ad, dimension=1)
            srows = [sorted_flat[i] for i in range(flat.shape[0])]
            return d_sorted, srows

        def per_chunk(_, digit):
            ad, rows_all = build_rows(digit)
            # shard split: each (wc, n) plane becomes (wc*S, n/S); every
            # downstream stage (sort, level-1 kernel, level-2 carries,
            # scatter) is batch-parallel over the leading axis, so the
            # shards flow through unchanged until finish() re-merges them
            wcl, nl = wc, n
            if nshards > 1:
                wcl, nl = wc * nshards, n // nshards
                ad = ad.reshape(wcl, nl)
                rows_all = [r.reshape(wcl, nl) for r in rows_all]
            # window merge (the opposite restructure): concatenate all
            # wc windows into ONE sort row under a composite
            # (window | digit) key — every window contributes exactly nl
            # elements with keys in its own disjoint range, so the
            # globally sorted row reshapes back to per-window sorted
            # segments EXACTLY.  Probes whether XLA:TPU's sort prefers
            # one long row over a short batch of rows.
            merged = (_flag(ops.f, "msm_sort_merge_windows", False)
                      and wcl > 1 and nshards == 1)
            if merged:
                keyoff = (jnp.arange(wcl, dtype=jnp.int32)[:, None]
                          * jnp.int32(nbuckets + 1))
                ad = (ad + keyoff).reshape(1, wcl * nl)
                rows_all = [r.reshape(1, wcl * nl) for r in rows_all]
            d_sorted, srows = run_sorts(ad, rows_all)
            if merged:
                # disjoint per-window key ranges + equal window spans =>
                # the reshape recovers per-window sorted segments exactly
                d_sorted = d_sorted.reshape(wcl, nl) - keyoff
                srows = [r.reshape(wcl, nl) for r in srows]
            return bucket_stage(d_sorted, srows, wcl, nl)

        def bucket_stage(d_sorted, srows, wcl, nl):
            srows = list(srows)
            if pack_flags:
                flag_sorted = (srows[topx] >> flag_shift) & 3
                srows[topx] = srows[topx] & flag_clear
            else:
                flag_sorted = srows[-1]
                srows = srows[:-1]
            fp2_coords = (
                coord_shapes[0][1:-1] == (2,) and hasattr(ops.f, "qnr")
            )
            use_kernel = (
                block
                and getattr(fb, "use_pallas", False)
                and getattr(fb, "use_msm_kernel", True)
                and (
                    # G1: Fp coords, small-int b3
                    (ops.b3_small and not coord_shapes[0][:-2])
                    # G2: Fp2 coords, b3 an Fp2 Montgomery constant
                    or (fp2_coords
                        and getattr(fb, "use_msm_kernel_g2", True))
                )
            )
            if use_kernel:
                buckets = _buckets_pallas(
                    ops,
                    jnp.stack(srows[:row_counts[0]]),
                    jnp.stack(
                        srows[row_counts[0]:row_counts[0] + row_counts[1]]
                    ),
                    flag_sorted,
                    d_sorted, block, nbuckets,
                )
                return finish(buckets)
            sg_sorted = (flag_sorted & 1) == 1              # (wc, n)
            inf_sorted = (flag_sorted & 2) == 2             # (wc, n)
            from .limbs15 import unpack32

            Ps = []
            off = 0
            for shp, rc in zip(coord_shapes, row_counts):
                blk = jnp.stack(srows[off:off + rc])        # (rc, wcl, nl)
                comps = blk.reshape((W32, rc // W32, wcl, nl))
                planes = unpack32(comps, shp[0])            # (L, S, wcl, nl)
                Ps.append(planes.reshape(shp[:-1] + (wcl, nl)))
                off += rc
            # negative digit => use -P (negate y)
            y = Ps[1]
            aff = (
                Ps[0],
                ops.f.select(sg_sorted, ops.f.neg(y), y),
                inf_sorted,
            )
            rows = jnp.arange(wcl, dtype=jnp.int32)[:, None]
            binf = ops.infinity((wcl, nbuckets + 1))
            if block:
                scanned, tail, C, cidx = _segment_reduce_blocked(
                    ops, aff, d_sorted, block, nbuckets
                )
                idx = jnp.where(tail, d_sorted, nbuckets)   # (wcl, N)
                buckets = tuple(
                    b.at[..., rows, idx].set(s)
                    for b, s in zip(binf, scanned)
                )
                corr = tuple(
                    b.at[..., rows, cidx].set(s)
                    for b, s in zip(binf, C)
                )
                buckets = ops.add(buckets, corr)
            else:
                scanned, tail = _segment_scan_tails(
                    ops, ops.from_affine(aff), d_sorted
                )
                idx = jnp.where(tail, d_sorted, nbuckets)   # (wcl, N)
                buckets = tuple(
                    b.at[..., rows, idx].set(s)
                    for b, s in zip(binf, scanned)
                )
            return finish(buckets)

        # HOISTED BATCHED SORT: run every chunk's grouping sorts as ONE
        # batched lax.sort set over the full (W, n) window axis BEFORE the
        # scan; the scan then consumes pre-sorted planes.  Motivation: the
        # round-4 sharded-sort A/B showed XLA:TPU sort cost is dominated
        # by per-op overhead (more, smaller sorts were 4-5x slower at
        # equal total data), so 1 sort set at (W, n) should beat nchunks
        # sets at (wc, n).  Costs HBM: the sorted payload planes for ALL
        # windows are live at once (~(rows+1) * W * n * 4 B; ~1.9 GB at
        # 2^20 G1) — hence the byte gate.
        hoist_flag = _flag(ops.f, "use_hoisted_sort", "auto")
        # live sort bytes on the hoisted path: the sort runs over
        # nchunks*wc rows (W padded up to a chunk multiple); operands =
        # payload rows (+1 dedicated flag row unless packed) + key + an
        # iota tie-break on the non-stable split-sort path
        hrows = nchunks * wc
        stable_eff = _flag(ops.f, "use_stable_sort", "auto")
        if stable_eff == "auto":
            stable_eff = base_coords
        n_ops = (packed.shape[0] + (0 if pack_flags else 1) + 1
                 + (0 if stable_eff else 1))
        sort_bytes = n_ops * hrows * n * 4
        if hoist_flag == "auto":
            # measured round 5 (2026-08 toolchain): 408.4k vs 380.5k
            # pts/s at the 2^20 G1 headline (+7.3%), 324.1k at 2^18
            # (top of the round-4 variance band) — ON within the gates
            # for base-field coords; Fp2 pending a G2 compile that
            # survives (see the fp2-aware note at pack_flags)
            hoist_sort = base_coords
        else:
            hoist_sort = bool(hoist_flag)
        hoist_sort = (
            hoist_sort and nchunks > 1 and nshards == 1
            and not _flag(ops.f, "msm_sort_merge_windows", False)
            and not _flag(ops.f, "use_sort_kernel", False)
            # 4.5 GB cap admits 2^21 G1 (3.77 GB live sorted payload)
            # and still excludes 2^22 (7.5 GB — would crowd the 16 GB
            # HBM next to the gathered coordinate arrays and bucket
            # planes); A/B at 2^21 in BASELINE.md round 5
            and sort_bytes <= (9 << 29)
        )
        if hoist_flag is True and not hoist_sort:
            import sys as _sys
            print(
                "# msm: forced use_hoisted_sort=True OVERRIDDEN by gate "
                f"(nchunks={nchunks}, nshards={nshards}, "
                f"sort_bytes={sort_bytes}) — running the per-chunk path",
                file=_sys.stderr,
            )
        LAST_PATH.clear()
        LAST_PATH.update(
            hoisted_sort=bool(hoist_sort), nshards=nshards,
            nchunks=nchunks, wc=wc, c=c, block=block,
            merged=bool(_flag(ops.f, "msm_sort_merge_windows", False)),
            hoisted_wsum=bool(hoisted), sort_bytes=sort_bytes,
        )

        if hoist_sort:
            ad_all, rows_all = build_rows(digits.reshape(nchunks * wc, n))
            d_sorted, srows = run_sorts(ad_all, rows_all)
            xs = tuple(
                r.reshape(nchunks, wc, n) for r in srows + [d_sorted]
            )

            def per_chunk_sorted(_, x):
                return bucket_stage(x[-1], list(x[:-1]), wc, n)

            # scan leaves: (nchunks, L.., wc) window points on the legacy
            # per-chunk path, (nchunks, L.., wc, B) full bucket planes
            # when the weighted sum is hoisted (the default)
            _, Ws = lax.scan(per_chunk_sorted, None, xs)
        else:
            _, Ws = lax.scan(per_chunk, None, digits)

        if hoisted:
            # HOISTED weighted bucket sum: the per-chunk scan emits raw
            # bucket arrays; ONE weighted sum runs with ALL windows
            # batched on the VPU axis instead of once per chunk — the
            # serial scan-step count of the weighted sum drops by the
            # chunk count (~5x at 2^20) at the cost of materializing the
            # (W, 2^(c-1)) bucket planes (~100 MB at the headline shape).
            def merge(x):                 # (nchunks, L.., wc, B) -> (L.., W, B)
                x = jnp.moveaxis(x, 0, -3)
                return x.reshape(
                    x.shape[:-3] + (nchunks * wc, x.shape[-1])
                )

            Ws = _weighted_bucket_sum(ops, tuple(merge(x) for x in Ws))
        else:
            # flatten chunk-major window order -> (L.., W_padded)
            def flatten(x):
                x = jnp.moveaxis(x, 0, -2)          # (L.., nchunks, wc)
                return x.reshape(x.shape[:-2] + (nchunks * wc,))

            Ws = tuple(flatten(x) for x in Ws)

        # Horner combine from the top window: res = 2^c * res + W_w
        def combine(res, Wp):
            def dbl_step(_, r):
                return ops.dbl(r)
            res = lax.fori_loop(0, c, dbl_step, res)
            return ops.add(res, Wp), None

        res0 = ops.infinity(())
        Ws_rev = tuple(jnp.flip(x, -1) for x in Ws)
        Ws_scan = tuple(jnp.moveaxis(x, -1, 0) for x in Ws_rev)
        res, _ = lax.scan(combine, res0, Ws_scan)
        return res

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class CurveMSM(MSM):
    """MSM with the scalar field attached (handles mont->std conversion)."""

    def __init__(self, ops: ProjCurveOps, fr):
        super().__init__(ops, fr.p.bit_length())
        self.fr = fr

    @jit_method(static_argnums=(3,))
    def msm_mont(self, k_mont: jax.Array, points: AffBatch,
                 c: Optional[int] = None) -> Point:
        """MSM with Montgomery-form scalars (converts first, as the
        reference does — bn128_G1_jac.c:678-692)."""
        return self.msm_std(self.fr.from_mont(k_mont), points, c)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
