"""MSM tests: differential vs the oracle's slow-reference MSM and the
triple-check pattern of examples/MSM.hs:65-77 (std-coeff vs mont-coeff vs
scalar-mul-and-sum)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.ops.curve import get_curves
from zikkurat_algebra_tpu.ops.msm import digits_from_limbs, window_size


@pytest.fixture(params=[P.BN128, P.BLS12_381], ids=["BN128", "BLS"])
def ck(request):
    return get_curves(request.param)


def test_digit_extraction(rng, ck):
    fr = ck.fr
    n, c = 7, 13
    ks = [rng.randrange(fr.p) for _ in range(n)]
    limbs = fr.encode(ks, mont=False)
    nbits = fr.p.bit_length()
    digits = np.asarray(digits_from_limbs(limbs, c, nbits))
    windows = -(-nbits // c)
    assert digits.shape == (windows, n)
    for w in range(windows):
        for j, k in enumerate(ks):
            assert digits[w, j] == (k >> (w * c)) & ((1 << c) - 1)


@pytest.mark.parametrize("n,c", [(1, 2), (8, 3), (33, 5), (64, None)])
def test_msm_vs_oracle_g1(rng, ck, n, c):
    og = ck.oracle_g1
    msm = ck.msm("g1")
    pts = [og.rnd(rng) for _ in range(n)]
    if n >= 8:
        pts[3] = None                     # infinity input
    ks = [rng.randrange(og.r) for _ in range(n)]
    if n >= 8:
        ks[1] = 0                         # zero scalar
    want = og.msm(ks, pts)
    k_limbs = ck.fr.encode(ks, mont=False)
    A = ck.encode_g1(pts)
    res = msm.msm_std(k_limbs, A, c)
    got = ck.decode_g1(ck.g1.to_affine(res))
    assert got == want
    # mont-coeff path agrees (examples/MSM.hs triple check)
    k_mont = ck.fr.encode(ks, mont=True)
    res2 = msm.msm_mont(k_mont, A, c)
    got2 = ck.decode_g1(ck.g1.to_affine(res2))
    assert got2 == want


def test_msm_vs_oracle_g2(rng, ck):
    og = ck.oracle_g2
    msm = ck.msm("g2")
    n = 9
    pts = [og.rnd(rng) for _ in range(n)]
    ks = [rng.randrange(og.r) for _ in range(n)]
    want = og.msm(ks, pts)
    k_limbs = ck.fr.encode(ks, mont=False)
    A = ck.encode_g2(pts)
    res = msm.msm_std(k_limbs, A, 4)
    got = ck.decode_g2(ck.g2.to_affine(res))
    assert got == want


def test_msm_split_sort_path(rng, ck):
    """The experimental two-sort variadic path (Field.use_split_sort)
    must agree with the default broadcast-key sort_key_val path and the
    oracle: its correctness hinges on the composite (digit, lane) key
    making the two sorts' permutations IDENTICAL so x/y rows stay
    paired (ops/msm.py per_chunk)."""
    og = ck.oracle_g1
    msm = ck.msm("g1")
    f = ck.g1.f
    n = 40
    pts = [og.rnd(rng) for _ in range(n)]
    pts[5] = None
    ks = [rng.randrange(og.r) for _ in range(n)]
    ks[2] = 0
    want = og.msm(ks, pts)
    k_limbs = ck.fr.encode(ks, mont=False)
    A = ck.encode_g1(pts)
    old = f.use_split_sort
    try:
        type(f).use_split_sort = True
        # fresh jit cache key: different static arg (window chunk)
        res = msm.msm_std(k_limbs, A, 5, 3)
        got = ck.decode_g1(ck.g1.to_affine(res))
    finally:
        type(f).use_split_sort = old
    assert got == want


@pytest.mark.parametrize("gather_mode", [False, True, "pos"])
def test_msm_pallas_bucket_path(rng, gather_mode):
    """End-to-end msm_std through the fused Pallas bucket kernel
    (interpret mode) must equal the XLA scan path and the oracle — this
    covers the packed sort payload -> kernel -> bucket-extraction wiring
    in _buckets_pallas (scatter, searchsorted-gather, and position-
    scatter-gather modes), incl. cross-block carries."""
    ck = get_curves(P.BLS12_381)
    og = ck.oracle_g1
    msm = ck.msm("g1")
    f = ck.g1.f
    n = 48
    pts = [og.rnd(rng) for _ in range(n)]
    pts[5] = None                         # infinity input
    ks = [rng.randrange(og.r) for _ in range(n)]
    ks[2] = 0
    want = og.msm(ks, pts)
    k_limbs = ck.fr.encode(ks, mont=False)
    A = ck.encode_g1(pts)
    old = (f.use_pallas, f.pallas_tile_msm, f.pallas_interpret,
           f.use_gather_buckets)
    f.use_pallas, f.pallas_tile_msm, f.pallas_interpret = True, 32, True
    type(f).use_gather_buckets = gather_mode
    try:
        # c=3 keeps segments long (cross-block carries), block=8 small;
        # fresh jit: the cached trace was taken with use_pallas False
        import jax

        res = jax.jit(
            msm.msm_std.__wrapped__, static_argnums=(0, 3, 4, 5)
        )(msm, k_limbs, A, 3, 4, 8)
    finally:
        (f.use_pallas, f.pallas_tile_msm, f.pallas_interpret,
         type(f).use_gather_buckets) = old
    got = ck.decode_g1(ck.g1.to_affine(res))
    assert got == want


def test_msm_legacy_per_chunk_wsum(rng, ck):
    """The legacy per-chunk weighted-sum path (use_hoisted_wsum=False)
    is kept as a bench A/B knob; it must stay bit-exact vs the oracle.
    A fresh jit trace is taken via __wrapped__ because the jit_method
    cache keys on id(self) and would replay the default-flag trace."""
    import jax

    og = ck.oracle_g1
    msm = ck.msm("g1")
    f = ck.g1.f
    n = 37
    pts = [og.rnd(rng) for _ in range(n)]
    pts[4] = None
    ks = [rng.randrange(og.r) for _ in range(n)]
    ks[6] = 0
    want = og.msm(ks, pts)
    k_limbs = ck.fr.encode(ks, mont=False)
    A = ck.encode_g1(pts)
    old = f.use_hoisted_wsum
    try:
        type(f).use_hoisted_wsum = False
        res = jax.jit(
            msm.msm_std.__wrapped__, static_argnums=(0, 3, 4, 5)
        )(msm, k_limbs, A, 5, 2, 8)
    finally:
        type(f).use_hoisted_wsum = old
    got = ck.decode_g1(ck.g1.to_affine(res))
    assert got == want


def test_msm_hoisted_sort_path(rng, ck):
    """The hoisted batched sort (use_hoisted_sort=True: all window
    chunks' grouping sorts run as ONE batched sort set before the chunk
    scan) must stay bit-exact vs the oracle, G1 and G2."""
    import jax

    for grp in ("g1", "g2"):
        og = ck.oracle_g1 if grp == "g1" else ck.oracle_g2
        msm = ck.msm(grp)
        gops = getattr(ck, grp)
        f = gops.f
        n = 23
        pts = [og.rnd(rng) for _ in range(n)]
        pts[4] = None
        ks = [rng.randrange(og.r) for _ in range(n)]
        ks[6] = 0
        want = og.msm(ks, pts)
        k_limbs = ck.fr.encode(ks, mont=False)
        enc = ck.encode_g1 if grp == "g1" else ck.encode_g2
        dec = ck.decode_g1 if grp == "g1" else ck.decode_g2
        A = enc(pts)
        old = getattr(f, "use_hoisted_sort", "auto")
        try:
            type(f).use_hoisted_sort = True
            res = jax.jit(
                msm.msm_std.__wrapped__, static_argnums=(0, 3, 4, 5)
            )(msm, k_limbs, A, 5, 2, 8)
        finally:
            type(f).use_hoisted_sort = old
        got = dec(gops.to_affine(res))
        assert got == want


def test_window_size_heuristic():
    # c = round(log2 N - 3.5) (bn128_G1_jac.c:648-650), upper clamp 15
    # (measured: c=15 beats c=16 at 2^20, 352.2k vs 336.3k pts/s)
    assert window_size(1 << 20) == 15
    assert window_size(1 << 22) == 15
    assert window_size(1 << 10) == 6
    assert window_size(10) == 1
    assert window_size(1) == 1


def test_blocked_segment_reduce_cross_block(rng, ck):
    """Long segments spanning many level-1 blocks (c small => few digits)
    exercise the cross-block carry path of the blocked reduction."""
    og = ck.oracle_g1
    msm = ck.msm("g1")
    n = 160
    pts = [og.rnd(rng) for _ in range(n)]
    ks = [rng.randrange(og.r) for _ in range(n)]
    want = og.msm(ks, pts)
    k_limbs = ck.fr.encode(ks, mont=False)
    A = ck.encode_g1(pts)
    # c=2 -> digits in {0..3}: segments of ~40 elements span 16-blocks
    res = msm.msm_std(k_limbs, A, 2, 4, 16)
    got = ck.decode_g1(ck.g1.to_affine(res))
    assert got == want
    # and agreement with the associative-scan formulation (block=0)
    res2 = msm.msm_std(k_limbs, A, 2, 4, 0)
    got2 = ck.decode_g1(ck.g1.to_affine(res2))
    assert got2 == want

def test_msm_sharded_sort_path(rng, ck):
    """The sharded grouping sort (Field.msm_sort_shard_log2): each
    window's digit sort runs over independent shards and the per-shard
    bucket arrays are group-added in finish() — must stay bit-exact vs
    the oracle, including infinities, zero scalars, and a point whose
    digit collides across shards (the cross-shard merge case)."""
    import jax

    og = ck.oracle_g1
    msm = ck.msm("g1")
    f = ck.g1.f
    n = 96
    pts = [og.rnd(rng) for _ in range(n)]
    pts[4] = None
    ks = [rng.randrange(og.r) for _ in range(n)]
    ks[6] = 0
    ks[40] = ks[10]                       # same digits in two shards
    want = og.msm(ks, pts)
    k_limbs = ck.fr.encode(ks, mont=False)
    A = ck.encode_g1(pts)
    old = f.msm_sort_shard_log2
    try:
        type(f).msm_sort_shard_log2 = 5   # shards of 32 -> nshards=3
        res = jax.jit(
            msm.msm_std.__wrapped__, static_argnums=(0, 3, 4, 5)
        )(msm, k_limbs, A, 5, 2, 8)
    finally:
        type(f).msm_sort_shard_log2 = old
    got = ck.decode_g1(ck.g1.to_affine(res))
    assert got == want

def test_msm_merged_window_sort_path(rng, ck):
    """The window-merged sort (Field.msm_sort_merge_windows): all wc
    windows ride ONE sort row under a composite (window | digit) key;
    the reshape back must recover per-window sorted segments exactly —
    bit-exact vs the oracle incl. infinities and zero scalars."""
    import jax

    og = ck.oracle_g1
    msm = ck.msm("g1")
    f = ck.g1.f
    n = 48
    pts = [og.rnd(rng) for _ in range(n)]
    pts[2] = None
    ks = [rng.randrange(og.r) for _ in range(n)]
    ks[7] = 0
    want = og.msm(ks, pts)
    k_limbs = ck.fr.encode(ks, mont=False)
    A = ck.encode_g1(pts)
    old = f.msm_sort_merge_windows
    try:
        type(f).msm_sort_merge_windows = True
        res = jax.jit(
            msm.msm_std.__wrapped__, static_argnums=(0, 3, 4, 5)
        )(msm, k_limbs, A, 5, 3, 8)
    finally:
        type(f).msm_sort_merge_windows = old
    got = ck.decode_g1(ck.g1.to_affine(res))
    assert got == want


def test_flag_resolution_fp2_aware(ck):
    """Tuning flags resolve through tower wrappers to the base Field
    (round-5 fix: G2's Fp2 coordinate object has no tuning attributes,
    so bare getattr silently fell back to getattr defaults there), and
    the sort-flag autos split per coordinate field: base-field coords
    get the measured G1 defaults, Fp2 keeps the proven G2 graph."""
    from zikkurat_algebra_tpu.ops.msm import _flag
    from zikkurat_algebra_tpu.ops.field import Field

    f2 = ck.g2.f                      # QuadExt over Fp
    # other tests may have left tower-CLASS flag attributes behind
    # (type(f).flag = ... force/restore); normalize, restore at the end
    saved = {}
    for name in ("use_hoisted_sort", "use_stable_sort"):
        if name in type(f2).__dict__:
            saved[name] = type(f2).__dict__[name]
            delattr(type(f2), name)
    old = Field.use_hoisted_sort
    try:
        # class-level Field defaults are visible THROUGH the tower wrapper
        assert _flag(f2, "use_hoisted_sort", "x") == Field.use_hoisted_sort
        assert _flag(f2, "use_stable_sort", "x") == Field.use_stable_sort
        # env/class overrides forced on Field reach the tower field too
        Field.use_hoisted_sort = True
        assert _flag(f2, "use_hoisted_sort", "x") is True
    finally:
        Field.use_hoisted_sort = old
        for name, v in saved.items():
            setattr(type(f2), name, v)
    # the fp2-aware auto split: struct_ndim discriminates coordinates
    assert ck.g1.f.struct_ndim == 1 and f2.struct_ndim == 2
