"""Pallas TPU kernels for the curve hot path (G1 bucket accumulation).

The MSM profile (BASELINE.md) showed the level-1 blocked segmented
reduction dominating: a lax.scan of `m` steps whose every step is a
complete group addition composed of 2 fused CIOS launches plus a dozen
elementwise XLA ops — each op a full HBM round trip.  Here the WHOLE
level-1 pass is ONE Mosaic kernel: the grid streams the m block-steps
through VMEM while the (X, Y, Z) accumulator stays resident in scratch,
and each step runs a fully-unrolled complete mixed addition (RCB15
algorithm 8) on (L, T) limb tiles — 11 CIOS products with zero
intermediate HBM traffic.

TPU analog of the reference's serial bucket loop
(lib/cbits/curves/g1/jac/bn128_G1_jac.c:607-618 `bucket[e-1] += point`),
restructured as: sorted digits -> per-block running mixed-add chains
(this kernel) -> cross-block carry combination (ops/msm.py level 2).

Two instantiations share the streaming/restart machinery:
  * G1 (coordinate field = Fp, b3 a small int): `block_madd_scan`;
  * G2 (coordinate field = Fp2, b3 an Fp2 constant): `block_madd_scan2` —
    every Fp2 multiply is the same 3-product Karatsuba the XLA tower path
    uses (ops/tower.py QuadExt.mul_list), so the kernel stays bit-exact
    against the composed ops.madd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import _cios, _partial_carry
from .limbs15 import unpack32

I32 = jnp.int32

# flag bit positions in the packed per-element flag plane
SIGN_BIT = 1      # negate y (balanced-digit sign)
INF_BIT = 2       # affine point is the identity
NEW_BIT = 4       # segment restart (first element of a digit run / block)


def _sel(mask, a, b):
    """mask: (1, T) bool; a, b: (L, T)."""
    return jnp.where(mask, a, b)


def _scale_small(x, k: int):
    return _partial_carry(_partial_carry(x * jnp.int32(k)))


def _madd(L: int, pinv15: int, b3: int, acc, x2, y2, inf2, p):
    """Complete mixed addition acc + (x2, y2, inf2), RCB15 algorithm 8
    (a=0, b3 small) — the Pallas mirror of ProjCurveOps.madd
    (ops/curve.py:142-170), every f.mul a _cios on resident tiles."""
    X1, Y1, Z1 = acc
    mul = lambda a, b: _cios(L, pinv15, a, b, p)
    add = lambda a, b: _partial_carry(a + b)
    sub = lambda a, b: _partial_carry(a - b)

    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    m3 = mul(add(x2, y2), add(X1, Y1))
    m4 = mul(x2, Z1)
    m5 = mul(y2, Z1)
    t3 = sub(m3, add(t0, t1))
    t4 = add(m4, X1)
    t5 = add(m5, Y1)
    X3 = _scale_small(t0, 3)
    t2 = _scale_small(Z1, b3)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = _scale_small(t4, b3)
    p0 = mul(t3, t1)
    p1 = mul(t5, Y3)
    p2 = mul(Y3, X3)
    p3 = mul(t1, Z3)
    p4 = mul(Z3, t5)
    p5 = mul(X3, t3)
    X3n = sub(p0, p1)
    Y3n = add(p2, p3)
    Z3n = add(p4, p5)
    return (
        _sel(inf2, X1, X3n),
        _sel(inf2, Y1, Y3n),
        _sel(inf2, Z1, Z3n),
    )


def _unpack(pk, L: int):
    """(W, T) dense radix-2^32 rows (limbs15.pack32, the sort-payload
    format built in ops/msm.py) -> (L, T) canonical 15-bit limb planes."""
    return unpack32(pk, L)


# ---------------------------------------------------------------------------
# Fp2 arithmetic on pairs of (L, T) tiles — bit-exact mirrors of the XLA
# tower ops (ops/tower.py QuadExt over Field): same op sequences, same
# partial-carry placement.
# ---------------------------------------------------------------------------


def _f2_mul_nr(qnr: int, t):
    """base element * nonresidue (u^2 = qnr, small int): neg for -1,
    small scaling otherwise — mirrors TowerKernels mul_u2."""
    if qnr == -1:
        return _partial_carry(-t)
    return _scale_small(t, qnr)


def _f2_mul(L: int, pinv15: int, qnr: int, a, b, p):
    """Karatsuba (a0 + a1 u)(b0 + b1 u), the QuadExt.mul_list recipe."""
    a0, a1 = a
    b0, b1 = b
    mul = lambda x, y: _cios(L, pinv15, x, y, p)
    add = lambda x, y: _partial_carry(x + y)
    sub = lambda x, y: _partial_carry(x - y)
    t0 = mul(a0, b0)
    t1 = mul(a1, b1)
    t2 = mul(add(a0, a1), add(b0, b1))
    c0 = add(t0, _f2_mul_nr(qnr, t1))
    c1 = sub(sub(t2, t0), t1)
    return (c0, c1)


def _f2_add(a, b):
    return (_partial_carry(a[0] + b[0]), _partial_carry(a[1] + b[1]))


def _f2_sub(a, b):
    return (_partial_carry(a[0] - b[0]), _partial_carry(a[1] - b[1]))


def _f2_neg(a):
    return (_partial_carry(-a[0]), _partial_carry(-a[1]))


def _f2_scale_small(a, k: int):
    return (_scale_small(a[0], k), _scale_small(a[1], k))


def _f2_sel(mask, a, b):
    return (_sel(mask, a[0], b[0]), _sel(mask, a[1], b[1]))


def _madd2(L: int, pinv15: int, qnr: int, acc, x2, y2, inf2, p, b3):
    """Complete mixed addition over Fp2 (RCB15 algorithm 8, general b3 as
    an Fp2 constant) — the Pallas mirror of ProjCurveOps.madd with
    mul_b3 = f.mul(t, b3) (ops/curve.py:142-170, 57-63)."""
    X1, Y1, Z1 = acc
    mul = lambda a, b: _f2_mul(L, pinv15, qnr, a, b, p)
    add = _f2_add
    sub = _f2_sub

    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    m3 = mul(add(x2, y2), add(X1, Y1))
    m4 = mul(x2, Z1)
    m5 = mul(y2, Z1)
    t3 = sub(m3, add(t0, t1))
    t4 = add(m4, X1)
    t5 = add(m5, Y1)
    X3 = _f2_scale_small(t0, 3)
    t2 = mul(Z1, b3)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(t4, b3)
    p0 = mul(t3, t1)
    p1 = mul(t5, Y3)
    p2 = mul(Y3, X3)
    p3 = mul(t1, Z3)
    p4 = mul(Z3, t5)
    p5 = mul(X3, t3)
    X3n = sub(p0, p1)
    Y3n = add(p2, p3)
    Z3n = add(p4, p5)
    return (
        _f2_sel(inf2, X1, X3n),
        _f2_sel(inf2, Y1, Y3n),
        _f2_sel(inf2, Z1, Z3n),
    )


def _block_scan_kernel(L: int, pinv15: int, b3: int, unroll: int,
                       x_ref, y_ref, flg_ref, p_ref, one_ref,
                       ox_ref, oy_ref, oz_ref,
                       ax, ay, az):
    """One grid step = `unroll` consecutive block-positions of every
    block in this lane tile.  acc := restart ? from_affine(pt)
    : acc (+) pt, streamed out.  Inputs arrive PACKED (straight off the
    sort network payload — halves the streamed bytes); outputs go out in
    (L, m, B) layout so the bucket scatter needs no relayout.  The
    unroll keeps the accumulator in registers across the inner madds."""
    i = pl.program_id(1)
    p = p_ref[:, :]
    onem = one_ref[:, :]                   # MONTGOMERY one (R mod p)
    T = p.shape[1]
    zero = jnp.zeros((L, T), I32)

    acc = (ax[:, :], ay[:, :], az[:, :])
    for u in range(unroll):
        x = _unpack(x_ref[u], L)
        y = _unpack(y_ref[u], L)
        flg = flg_ref[u]                   # (1, T) int32 bitmask
        sgn = (flg & SIGN_BIT) != 0
        inf = (flg & INF_BIT) != 0
        new = (flg & NEW_BIT) != 0

        y = _sel(sgn, _partial_carry(-y), y)

        # from_affine(pt): inf -> (0, 1_mont, 0); else (x, y, 1_mont)
        fx = _sel(inf, zero, x)
        fy = _sel(inf, onem, y)
        fz = _sel(inf, zero, onem)

        sx, sy, sz = _madd(L, pinv15, b3, acc, x, y, inf, p)
        restart = new
        if u == 0:
            # very first grid step: the scratch accumulator is
            # uninitialized — force a restart on every lane (the caller
            # also sets NEW_BIT at block starts, so this is belt and
            # braces; the discarded madd on garbage wraps harmlessly)
            restart = jnp.logical_or(new, i == 0)
        acc = (
            _sel(restart, fx, sx),
            _sel(restart, fy, sy),
            _sel(restart, fz, sz),
        )
        ox_ref[:, u] = acc[0]
        oy_ref[:, u] = acc[1]
        oz_ref[:, u] = acc[2]
    ax[:, :] = acc[0]
    ay[:, :] = acc[1]
    az[:, :] = acc[2]


@functools.lru_cache(maxsize=None)
def _build_block_scan(L: int, Lp: int, pinv15: int, b3: int, m: int,
                      nb: int, tile: int, unroll: int, interpret: bool):
    kernel = functools.partial(_block_scan_kernel, L, pinv15, b3, unroll)
    grid = (nb // tile, m // unroll)
    inspec = pl.BlockSpec((unroll, Lp, tile), lambda j, i: (i, 0, j),
                          memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((unroll, 1, tile), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, tile), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((L, unroll, tile), lambda j, i: (0, i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, m, nb), I32),
            jax.ShapeDtypeStruct((L, m, nb), I32),
            jax.ShapeDtypeStruct((L, m, nb), I32),
        ),
        grid=grid,
        in_specs=[inspec, inspec, fspec, cspec, cspec],
        out_specs=(ospec, ospec, ospec),
        scratch_shapes=[
            pltpu.VMEM((L, tile), I32),
            pltpu.VMEM((L, tile), I32),
            pltpu.VMEM((L, tile), I32),
        ],
        interpret=interpret,
    )


def _block_scan_kernel2(L: int, pinv15: int, qnr: int, unroll: int,
                        x0_ref, x1_ref, y0_ref, y1_ref, flg_ref,
                        p_ref, one_ref, b30_ref, b31_ref,
                        ox0_ref, ox1_ref, oy0_ref, oy1_ref,
                        oz0_ref, oz1_ref,
                        ax0, ax1, ay0, ay1, az0, az1):
    """Fp2 (G2) twin of _block_scan_kernel: same streaming/restart
    machinery, accumulator and point coordinates are PAIRS of (L, T)
    tiles, every group-add multiply a 3-CIOS Karatsuba."""
    i = pl.program_id(1)
    p = p_ref[:, :]
    onem = one_ref[:, :]
    b3 = (b30_ref[:, :], b31_ref[:, :])
    T = p.shape[1]
    zero = jnp.zeros((L, T), I32)
    zero2 = (zero, zero)
    one2 = (onem, zero)                    # Fp2 Montgomery one = (1, 0)

    acc = ((ax0[:, :], ax1[:, :]), (ay0[:, :], ay1[:, :]),
           (az0[:, :], az1[:, :]))
    for u in range(unroll):
        x = (_unpack(x0_ref[u], L), _unpack(x1_ref[u], L))
        y = (_unpack(y0_ref[u], L), _unpack(y1_ref[u], L))
        flg = flg_ref[u]                   # (1, T) int32 bitmask
        sgn = (flg & SIGN_BIT) != 0
        inf = (flg & INF_BIT) != 0
        new = (flg & NEW_BIT) != 0

        y = _f2_sel(sgn, _f2_neg(y), y)

        # from_affine(pt): inf -> (0, 1_mont, 0); else (x, y, 1_mont)
        fx = _f2_sel(inf, zero2, x)
        fy = _f2_sel(inf, one2, y)
        fz = _f2_sel(inf, zero2, one2)

        sx, sy, sz = _madd2(L, pinv15, qnr, acc, x, y, inf, p, b3)
        restart = new
        if u == 0:
            restart = jnp.logical_or(new, i == 0)
        acc = (
            _f2_sel(restart, fx, sx),
            _f2_sel(restart, fy, sy),
            _f2_sel(restart, fz, sz),
        )
        ox0_ref[:, u] = acc[0][0]
        ox1_ref[:, u] = acc[0][1]
        oy0_ref[:, u] = acc[1][0]
        oy1_ref[:, u] = acc[1][1]
        oz0_ref[:, u] = acc[2][0]
        oz1_ref[:, u] = acc[2][1]
    ax0[:, :], ax1[:, :] = acc[0]
    ay0[:, :], ay1[:, :] = acc[1]
    az0[:, :], az1[:, :] = acc[2]


@functools.lru_cache(maxsize=None)
def _build_block_scan2(L: int, Lp: int, pinv15: int, qnr: int, m: int,
                       nb: int, tile: int, unroll: int, interpret: bool):
    kernel = functools.partial(_block_scan_kernel2, L, pinv15, qnr, unroll)
    grid = (nb // tile, m // unroll)
    inspec = pl.BlockSpec((unroll, Lp, tile), lambda j, i: (i, 0, j),
                          memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((unroll, 1, tile), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, tile), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((L, unroll, tile), lambda j, i: (0, i, j),
                         memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((L, m, nb), I32)
    return pl.pallas_call(
        kernel,
        out_shape=(shp,) * 6,
        grid=grid,
        in_specs=[inspec] * 4 + [fspec] + [cspec] * 4,
        out_specs=(ospec,) * 6,
        scratch_shapes=[pltpu.VMEM((L, tile), I32)] * 6,
        interpret=interpret,
    )


def block_madd_scan2(px0, px1, py0, py1, flg: jax.Array,
                     L: int, p_np, pinv15: int, qnr: int, b3,
                     one_np, tile: int = 256, unroll: int = 8,
                     interpret: bool = False):
    """Fp2 masked running mixed-add scan (G2 twin of block_madd_scan).

    px0, px1, py0, py1: (m, W32, B) PACKED canonical affine coordinate
    component rows in block-stream layout; flg: (m, B) int32 bitmask;
    b3: (L, 2) Montgomery-encoded Fp2 curve constant 3*b.  Returns the
    running projective values as six (L, m, B) planes
    (X0, X1, Y0, Y1, Z0, Z1)."""
    m, Lp, B = px0.shape
    while m % unroll:
        unroll //= 2
    pad = (-B) % tile
    if pad:
        padf = jnp.full((m, pad), NEW_BIT | INF_BIT, I32)
        px0, px1, py0, py1 = (
            jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
            for a in (px0, px1, py0, py1)
        )
        flg = jnp.concatenate([flg, padf], 1)
    nb = B + pad
    pb = jnp.broadcast_to(jnp.asarray(p_np)[:, None], (L, tile))
    oneb = jnp.broadcast_to(jnp.asarray(one_np)[:, None], (L, tile))
    b30 = jnp.broadcast_to(b3[:, 0][:, None], (L, tile))
    b31 = jnp.broadcast_to(b3[:, 1][:, None], (L, tile))
    call = _build_block_scan2(L, Lp, pinv15, qnr, m, nb, tile, unroll,
                              interpret)
    outs = call(px0, px1, py0, py1, flg[:, None, :], pb, oneb, b30, b31)
    if pad:
        outs = tuple(o[..., :B] for o in outs)
    return outs


def block_madd_scan(px: jax.Array, py: jax.Array, flg: jax.Array,
                    L: int, p_np, pinv15: int, b3: int, one_np,
                    tile: int = 256, unroll: int = 8,
                    interpret: bool = False):
    """Masked running mixed-add scan.

    px, py: (m, W, B) PACKED canonical affine coordinate rows (dense
    radix-2^32, the sort-payload format) in block-stream layout (axis 0 =
    position within block, axis 2 = block lanes); flg: (m, B) int32
    bitmask (SIGN_BIT | INF_BIT | NEW_BIT); one_np the Montgomery one.
    Returns projective running values (X, Y, Z), each (L, m, B): column
    (i, j) holds the sum of lane j's current segment up to step i.
    """
    m, Lp, B = px.shape
    # Mosaic needs the OUTPUT block (L, unroll, tile) sublane dim
    # divisible by 8, so unroll must be a multiple of 8 on hardware
    # (measured best at 8; interpret mode accepts any power of two)
    while m % unroll:
        unroll //= 2
    pad = (-B) % tile
    if pad:
        padf = jnp.full((m, pad), NEW_BIT | INF_BIT, I32)
        px = jnp.pad(px, ((0, 0), (0, 0), (0, pad)))
        py = jnp.pad(py, ((0, 0), (0, 0), (0, pad)))
        flg = jnp.concatenate([flg, padf], 1)
    nb = B + pad
    pb = jnp.broadcast_to(jnp.asarray(p_np)[:, None], (L, tile))
    oneb = jnp.broadcast_to(jnp.asarray(one_np)[:, None], (L, tile))
    call = _build_block_scan(L, Lp, pinv15, b3, m, nb, tile, unroll,
                             interpret)
    X, Y, Z = call(px, py, flg[:, None, :], pb, oneb)
    if pad:
        X, Y, Z = X[..., :B], Y[..., :B], Z[..., :B]
    return X, Y, Z
