"""Curve / field parameter registry for the TPU-native ZK-algebra framework.

This is the analog of the reference's codegen parameter tables
(/root/reference/codegen/src/Zikkurat/CodeGen/Curve/Params.hs:150-218 and
/root/reference/codegen/src/Zikkurat/Generate.hs:134-145).  In the reference
these records drive a Haskell source-level code generator; here they are plain
dataclasses consumed at import time to build constant tables (Montgomery
constants, twiddle factors, Frobenius tables) as JAX arrays.

All values below are mathematical constants of the BN128 (alt-bn128 / BN254)
and BLS12-381 curves; derived quantities (R, R^2, p' = -p^-1 mod 2^16, ...)
are computed on the fly by the limb-plane layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Limb layout: TPU-native 16-bit limbs held in uint32 planes.
#
# The reference uses 4-12 x 64-bit limbs with hardware add-with-carry
# (lib/cbits/platform.h).  TPUs have neither 64-bit integer multiply nor carry
# chains, so we use radix 2^16: a 16-bit x 16-bit product fits exactly in a
# uint32 lane and column sums stay far below 2^32, making carry handling a
# vectorized shift/mask pass on the VPU.
# ---------------------------------------------------------------------------

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def nlimbs_for(p: int) -> int:
    """Number of 16-bit limbs, rounded up to a multiple of 4 (64-bit words)
    so that R = 2^(16*L) coincides with the reference's Montgomery R."""
    bits = p.bit_length()
    words64 = -(-bits // 64)
    return words64 * 4


@dataclass(frozen=True)
class FieldParams:
    """A prime field with optional power-of-two FFT domain.

    Mirrors the reference's `primefield_list`
    (codegen/src/Zikkurat/Generate.hs:134-145).
    """

    name: str
    p: int
    # smallest primitive generator of the multiplicative group
    multiplicative_gen: int
    # (log2 size, generator) of the maximal power-of-two subgroup, if any
    fft_domain: Optional[Tuple[int, int]] = None

    @cached_property
    def nlimbs(self) -> int:
        return nlimbs_for(self.p)

    @cached_property
    def r_mont(self) -> int:
        """Montgomery R = 2^(16*L) == 2^(64*nwords64), same as the reference."""
        return 1 << (LIMB_BITS * self.nlimbs)

    @cached_property
    def r2_mont(self) -> int:
        return (self.r_mont * self.r_mont) % self.p

    @cached_property
    def r3_mont(self) -> int:
        return (self.r_mont * self.r2_mont) % self.p

    @cached_property
    def p_inv_neg_limb(self) -> int:
        """-p^-1 mod 2^16 - the per-limb Montgomery reduction constant."""
        return (-pow(self.p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @cached_property
    def p_inv_neg_word64(self) -> int:
        """-p^-1 mod 2^64 (for the 64-bit host-side C oracle)."""
        return (-pow(self.p, -1, 1 << 64)) % (1 << 64)


@dataclass(frozen=True)
class TowerParams:
    """Extension tower Fp2/Fp6/Fp12 over a base field.

    Mirrors codegen/src/Zikkurat/CodeGen/Towers.hs:40-48 plus the pure
    instances (pure/src/ZK/Algebra/Pure/Instances/{BN254,BLS12_381}.hs:33-35):

        Fp2  = Fp [u] / (u^2 + 1)
        Fp6  = Fp2[v] / (v^3 - xi)          xi in Fp2
        Fp12 = Fp6[w] / (w^2 - v)
    """

    # xi = xi0 + xi1*u, the Fp6 non-residue
    xi0: int
    xi1: int
    # Fp2 = Fp[u]/(u^2 - qnr); BN128/BLS12-381 use u^2 + 1, BLS12-377
    # uses u^2 + 5 (pure/src/.../Instances/BLS12_377.hs:26)
    qnr: int = -1


@dataclass(frozen=True)
class CurveParams:
    """A pairing-friendly curve family (G1 over Fp, twisted G2 over Fp2).

    Mirrors Curve1/Curve2/Curve12 records
    (codegen/src/Zikkurat/CodeGen/Curve/Params.hs:35-64, 150-218).
    """

    name: str
    fp: FieldParams
    fr: FieldParams
    a: int
    b: int
    cofactor: int
    g1_gen: Tuple[int, int]
    glv_beta_lambda: Optional[Tuple[int, int]]
    # twisted curve over Fp2: y^2 = x^3 + b2, b2 = b20 + b21*u
    # G2 twist data; None => the family is supported at the
    # fields+towers+G1 level only (the reference's pure layer likewise
    # carries BLS12-377 only as field/tower instances, Run.hs:72-134)
    b2: Optional[Tuple[int, int]]
    g2_cofactor: Optional[int]
    g2_gen: Optional[Tuple[Tuple[int, int], Tuple[int, int]]]
    tower: TowerParams
    # curve seed x; ate loop parameter and sign conventions derive from this
    seed: int
    family: str = "bls"  # "bn" or "bls"

    @cached_property
    def ate_loop_count(self) -> int:
        """|Miller loop scalar|: 6x+2 for BN, |x| for BLS.

        cf. bn128_pairing.c:26-30 (0x19d797039be763ba8) and
        bls12_381_pairing.c:26-28 (0xd201000000010000)."""
        if self.family == "bn":
            return 6 * self.seed + 2
        return abs(self.seed)


# ---------------------------------------------------------------------------
# BN128 (alt-bn128 / BN254)
# constants from codegen/src/Zikkurat/CodeGen/Curve/Params.hs:150-181 and
# codegen/src/Zikkurat/Generate.hs:134-145
# ---------------------------------------------------------------------------

BN128_P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN128_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

BN128_FP = FieldParams(name="BN128/Fp", p=BN128_P, multiplicative_gen=3)
BN128_FR = FieldParams(
    name="BN128/Fr",
    p=BN128_R,
    multiplicative_gen=5,
    fft_domain=(
        28,
        19103219067921713944291392827692070036145651957329286315305642004821462161904,
    ),
)

BN128 = CurveParams(
    name="BN128",
    fp=BN128_FP,
    fr=BN128_FR,
    a=0,
    b=3,
    cofactor=1,
    g1_gen=(1, 2),
    glv_beta_lambda=(
        2203960485148121921418603742825762020974279258880205651966,
        4407920970296243842393367215006156084916469457145843978461,
    ),
    b2=(
        19485874751759354771024239261021720505790618469301721065564631296452457478373,
        266929791119991161246907387137283842545076965332900288569378510910307636690,
    ),
    g2_cofactor=21888242871839275222246405745257275088844257914179612981679871602714643921549,
    g2_gen=(
        (
            0x1ADCD0ED10DF9CB87040F46655E3808F98AA68A570ACF5B0BDE23FAB1F149701,
            0x09E847E9F05A6082C3CD2A1D0A3A82E6FBFBE620F7F31269FA15D21C1C13B23B,
        ),
        (
            0x056C01168A5319461F7CA7AA19D4FCFD1C7CDF52DBFC4CBEE6F915250B7F6FC8,
            0x0EFE500A2D02DD77F5F401329F30895DF553B878FC3C0DADAAA86456A623235C,
        ),
    ),
    tower=TowerParams(xi0=9, xi1=1),  # v^3 = 9 + u
    seed=4965661367192848881,
    family="bn",
)

# ---------------------------------------------------------------------------
# BLS12-381
# constants from codegen/src/Zikkurat/CodeGen/Curve/Params.hs:185-218
# ---------------------------------------------------------------------------

BLS12_381_P = 4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559787
BLS12_381_R = 52435875175126190479447740508185965837690552500527637822603658699938581184513

BLS12_381_FP = FieldParams(name="BLS12-381/Fp", p=BLS12_381_P, multiplicative_gen=2)
BLS12_381_FR = FieldParams(
    name="BLS12-381/Fr",
    p=BLS12_381_R,
    multiplicative_gen=7,
    fft_domain=(
        32,
        10238227357739495823651030575849232062558860180284477541189508159991286009131,
    ),
)

BLS12_381 = CurveParams(
    name="BLS12-381",
    fp=BLS12_381_FP,
    fr=BLS12_381_FR,
    a=0,
    b=4,
    cofactor=76329603384216526031706109802092473003,
    g1_gen=(
        3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507,
        1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569,
    ),
    glv_beta_lambda=(
        4002409555221667392624310435006688643935503118305586438271171395842971157480381377015405980053539358417135540939436,
        228988810152649578064853576960394133503,
    ),
    b2=(4, 4),  # 4(1+u)
    g2_cofactor=305502333931268344200999753193121504214466019254188142667664032982267604182971884026507427359259977847832272839041616661285803823378372096355777062779109,
    g2_gen=(
        (
            352701069587466618187139116011060144890029952792775240219908644239793785735715026873347600343865175952761926303160,
            3059144344244213709971259814753781636986470325476647558659373206291635324768958432433509563104347017837885763365758,
        ),
        (
            1985150602287291935568054521177171638300868978215655730859378665066344726373823718423869104263333984641494340347905,
            927553665492332455747201965776037880757740193453592970025027978793976877002675564980949289727957565575433344219582,
        ),
    ),
    tower=TowerParams(xi0=1, xi1=1),  # v^3 = 1 + u
    seed=-0xD201000000010000,
    family="bls",
)

# ---------------------------------------------------------------------------
# BLS12-377
# p, r and the tower shape (u^2+5, v^3-u, w^2-v) from the reference's pure
# layer (pure/src/ZK/Algebra/Pure/Curve/SomeCurves.hs:72-74 and
# Instances/BLS12_377.hs:26-28) — the reference supports this family at the
# FIELD+TOWER level only (pure/test/Run.hs), with no generated C.  Here the
# width-generic kernels extend it to G1 (curve constants derived and
# verified offline: G = h1 * (1, sqrt(2)), r*G = inf; GLV lambda = z^2 - 1,
# beta checked by phi(G) == lambda*G).  G2/pairing are out of scope to
# match the reference (b2 = None).
# ---------------------------------------------------------------------------

BLS12_377_P = 0x01AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001
BLS12_377_R = 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001

BLS12_377_FP = FieldParams(
    name="BLS12-377/Fp", p=BLS12_377_P, multiplicative_gen=5
)
BLS12_377_FR = FieldParams(
    name="BLS12-377/Fr",
    p=BLS12_377_R,
    multiplicative_gen=11,
    # (r - 1) has 2-adicity 47; generator = 11^((r-1)/2^47), order verified
    fft_domain=(
        47,
        6924886788847882060123066508223519077232160750698452411071850219367055984476,
    ),
)

BLS12_377 = CurveParams(
    name="BLS12-377",
    fp=BLS12_377_FP,
    fr=BLS12_377_FR,
    a=0,
    b=1,
    cofactor=0x170B5D44300000000000000000000000,   # (z-1)^2 / 3
    g1_gen=(
        81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
        241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
    ),
    glv_beta_lambda=(
        80949648264912719408558363140637477264845294720710499478137287262712535938301461879813459410945,
        0x452217CC900000010A11800000000000,        # z^2 - 1 mod r
    ),
    b2=None,
    g2_cofactor=None,
    g2_gen=None,
    tower=TowerParams(xi0=0, xi1=1, qnr=-5),      # u^2 = -5, v^3 = u
    seed=0x8508C00000000001,
    family="bls",
)

# ---------------------------------------------------------------------------
# Corner-case TEST primes (near powers of two), the analog of the
# reference's test-prime table (codegen/src/Zikkurat/Primes.hs:17-62).
# Chosen to stress the signed radix-2^15 limb core: limb counts L in
# 5..20, p straddling the 15-bit limb boundaries (2^45, 2^60 are exactly
# 3 and 4 limbs), Mersenne primes (all-ones limbs), goldilocks, and both
# p mod 4 classes (the p = 1 mod 4 ones exercise constant-iteration
# Tonelli-Shanks).  `multiplicative_gen` is a quadratic non-residue.
# ---------------------------------------------------------------------------

TEST_PRIMES = {
    "M31": FieldParams(name="test/2^31-1", p=2**31 - 1, multiplicative_gen=3),
    "P45-": FieldParams(name="test/2^45-55", p=2**45 - 55, multiplicative_gen=5),
    "P45+": FieldParams(name="test/2^45+59", p=2**45 + 59, multiplicative_gen=2),
    "P60-": FieldParams(name="test/2^60-93", p=2**60 - 93, multiplicative_gen=2),
    "M61": FieldParams(name="test/2^61-1", p=2**61 - 1, multiplicative_gen=3),
    "goldilocks": FieldParams(
        name="test/goldilocks", p=2**64 - 2**32 + 1, multiplicative_gen=7,
        fft_domain=(32, pow(7, (2**64 - 2**32) >> 32, 2**64 - 2**32 + 1)),
    ),
    "P64+": FieldParams(name="test/2^64+13", p=2**64 + 13, multiplicative_gen=2),
    "M127": FieldParams(name="test/2^127-1", p=2**127 - 1, multiplicative_gen=3),
    "P255-19": FieldParams(
        name="test/2^255-19", p=2**255 - 19, multiplicative_gen=2
    ),
    "P255+": FieldParams(name="test/2^255+95", p=2**255 + 95, multiplicative_gen=3),
}

# ---------------------------------------------------------------------------
# Standard-curve prime database, the analog of the reference pure
# library's curve DB (pure/src/ZK/Algebra/Pure/Curve/SomeCurves.hs:61-103
# `curvePrimes`): (base field prime, scalar field prime) per curve.  The
# reference carries these as a lookup table for its generic pure fields;
# here any entry instantiates a full device `Field` (the limb core is
# width-generic), covered by tests/test_curve_db.py.  Scalar fields of
# the cofactor curves (JubJub/Bandersnatch/BabyJubJub/Curve25519) are the
# subgroup orders, as in the reference.
# ---------------------------------------------------------------------------

CURVE_DB = {
    "BN254": (
        21888242871839275222246405745257275088696311157297823662689037894645226208583,
        21888242871839275222246405745257275088548364400416034343698204186575808495617,
    ),
    "BLS12-381": (BLS12_381_FP.p, BLS12_381_FR.p),
    "BLS12-377": (BLS12_377_FP.p, BLS12_377_FR.p),
    "JubJub": (
        BLS12_381_FR.p,
        0xE7DB4EA6533AFA906673B0101343B00A6682093CCC81082D0970E5ED6F72CB7,
    ),
    "Bandersnatch": (
        BLS12_381_FR.p,
        0x1CFB69D4CA675F520CCE760202687600FF8F87007419047174FD06B52876E7E1,
    ),
    "BabyJubJub": (
        21888242871839275222246405745257275088548364400416034343698204186575808495617,
        2736030358979909402780800718157159386076813972158567259200215660948447373041,
    ),
    "Pallas": (
        0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001,
        0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001,
    ),
    "Secp256k1": (
        0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F,
        0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141,
    ),
    "Curve25519": (
        2**255 - 19,
        7237005577332262213973186563042994240857116359379907606001950938285454250989,
    ),
}
# field-swapped partner curves (SomeCurves.hs:100-103)
CURVE_DB["Vesta"] = (CURVE_DB["Pallas"][1], CURVE_DB["Pallas"][0])
CURVE_DB["Grumpkin"] = (CURVE_DB["BN254"][1], CURVE_DB["BN254"][0])
CURVE_DB["Secq256k1"] = (CURVE_DB["Secp256k1"][1], CURVE_DB["Secp256k1"][0])


def smallest_nonresidue(p: int) -> int:
    """Smallest quadratic non-residue of p (what `multiplicative_gen`
    is actually used for on device: seeding Tonelli-Shanks)."""
    g = 2
    while pow(g, (p - 1) // 2, p) == 1:
        g += 1
    return g


def curve_db_field(curve: str, which: str = "scalar") -> FieldParams:
    """FieldParams for a standard curve's base or scalar prime field
    (the device analog of the reference's `curvePrimes` lookup)."""
    base_p, scalar_p = CURVE_DB[curve]
    p = scalar_p if which == "scalar" else base_p
    return FieldParams(
        name=f"{curve}/{'Fr' if which == 'scalar' else 'Fp'}",
        p=p, multiplicative_gen=smallest_nonresidue(p),
    )


CURVES = {"BN128": BN128, "BLS12-381": BLS12_381, "BLS12-377": BLS12_377}
FIELDS = {
    "BN128/Fp": BN128_FP,
    "BN128/Fr": BN128_FR,
    "BLS12-381/Fp": BLS12_381_FP,
    "BLS12-381/Fr": BLS12_381_FR,
    "BLS12-377/Fp": BLS12_377_FP,
    "BLS12-377/Fr": BLS12_377_FR,
}


def sage_setup(curve: "CurveParams") -> str:
    """Printable Sage verification script for a curve's G1 — mirrors the
    reference's `sageSetup`/`printSageSetup` audit helpers
    (codegen/src/Zikkurat/CodeGen/Curve/Params.hs:100-133)."""
    lines = [
        f"# {curve.name} elliptic curve",
        f"p  = {curve.fp.p}",
        f"r  = {curve.fr.p}",
        f"h  = {curve.cofactor}",
        "Fp = GF(p)",
        "Fr = GF(r)",
        f"A  = Fp({curve.a})",
        f"B  = Fp({curve.b})",
        "E  = EllipticCurve(Fp,[A,B])",
        f"gx = Fp({curve.g1_gen[0]})",
        f"gy = Fp({curve.g1_gen[1]})",
        "gen = E(gx,gy)  # subgroup generator",
        'print("scalar field check: ", gen.additive_order() == r )',
        'print("cofactor check:     ", E.cardinality() == r*h )',
    ]
    if curve.glv_beta_lambda is not None:
        beta, lam = curve.glv_beta_lambda
        lines += [
            "",
            "# GLV beta and lambda parameters",
            f"beta = Fp({beta})",
            f"lam  = {lam}",
            "pt   = 1234567 * gen;",
            "pt2  = E( beta*pt[0] , pt[1], pt[2] )",
            'print("beta check:   ", beta^3 == 1 )',
            'print("lambda check: ", Fr(lam)^3 == 1 )',
            'print("GLV check:    ", lam * pt == pt2 )',
        ]
    return "\n".join(lines)
