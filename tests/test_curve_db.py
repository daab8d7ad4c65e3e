"""Standard-curve prime database: every entry of the SomeCurves analog
(params.CURVE_DB, mirroring
/root/reference/pure/src/ZK/Algebra/Pure/Curve/SomeCurves.hs:61-103)
instantiates a working device Field.

All 12 curves' primes get an encode/decode roundtrip + host-side sanity;
a subset of distinct NEW moduli (not already covered by the production
suites) runs the device differential check vs the pure-int oracle —
kept small because every fresh modulus compiles its own kernel set
(pytest.ini compile-budget note).
"""

import numpy as np
import pytest

from zikkurat_algebra_tpu.params import CURVE_DB, curve_db_field, smallest_nonresidue
from zikkurat_algebra_tpu.ops.field import Field


def test_db_matches_reference_table():
    # spot-pin values transcribed from SomeCurves.hs:61-103
    assert CURVE_DB["Pallas"][0] % 2**64 == 0x992D30ED00000001 % 2**64
    assert CURVE_DB["Vesta"] == (CURVE_DB["Pallas"][1], CURVE_DB["Pallas"][0])
    assert CURVE_DB["Grumpkin"] == (CURVE_DB["BN254"][1], CURVE_DB["BN254"][0])
    assert CURVE_DB["Secq256k1"][0] == CURVE_DB["Secp256k1"][1]
    assert CURVE_DB["Curve25519"][0] == 2**255 - 19
    # JubJub/Bandersnatch live over the BLS12-381 scalar field
    assert CURVE_DB["JubJub"][0] == CURVE_DB["BLS12-381"][1]
    assert CURVE_DB["Bandersnatch"][0] == CURVE_DB["BLS12-381"][1]
    for name, (base_p, scalar_p) in CURVE_DB.items():
        for p in (base_p, scalar_p):
            assert p > 2 and pow(2, p, p) == 2, (name, p)  # Fermat PRP


@pytest.mark.parametrize("curve", sorted(CURVE_DB))
def test_db_fields_encode_roundtrip(curve):
    for which in ("base", "scalar"):
        fp = curve_db_field(curve, which)
        f = Field(fp)
        p = fp.p
        g = fp.multiplicative_gen
        assert pow(g, (p - 1) // 2, p) == p - 1  # genuine non-residue
        vals = [0, 1, 2, p - 1, (p - 1) // 2, pow(3, 100, p)]
        assert f.decode(f.encode(vals)) == vals
        assert f.decode(f.encode(vals, mont=False), mont=False) == vals


# distinct new moduli not already exercised by the BN/BLS suites
DEVICE_SUBSET = [
    ("Pallas", "base"),
    ("Secp256k1", "base"),
    ("Curve25519", "scalar"),
    ("BabyJubJub", "scalar"),
]


@pytest.mark.parametrize("curve,which", DEVICE_SUBSET,
                         ids=[f"{c}/{w}" for c, w in DEVICE_SUBSET])
def test_db_fields_device_ops_vs_oracle(curve, which):
    fp = curve_db_field(curve, which)
    f = Field(fp)
    p = fp.p
    rng = np.random.default_rng(p % 2**32)
    n = 24
    a_int = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(n)]
    b_int = [int.from_bytes(rng.bytes(40), "little") % p for _ in range(n)]
    a = f.encode(a_int)
    b = f.encode(b_int)
    assert f.decode(f.mul(a, b)) == [x * y % p for x, y in zip(a_int, b_int)]
    assert f.decode(f.add(a, b)) == [(x + y) % p for x, y in zip(a_int, b_int)]
    assert f.decode(f.sub(a, b)) == [(x - y) % p for x, y in zip(a_int, b_int)]
    inv = f.decode(f.inv(a))
    for x, got in zip(a_int, inv):
        assert got == (pow(x, p - 2, p) if x else 0)
    # sqrt on squares (exercises both p mod 4 classes across the subset)
    sq = f.sqr(a)
    r, ok = f.sqrt(sq)
    got = f.decode(r)
    for x, rt, k in zip(a_int, got, np.asarray(ok)):
        assert bool(k)
        assert rt * rt % p == x * x % p
