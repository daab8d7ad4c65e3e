"""Pure-Python `int` oracle - the analog of the reference's `pure/` subproject
(/root/reference/pure/README.md:1-11): a slow, trusted implementation used as

  * the differential-test oracle for every TPU kernel, and
  * the generator of precomputed constant tables (Montgomery constants,
    Frobenius tables, twiddle factors) consumed by the JAX/Pallas layer.

Nothing in here touches JAX; everything is exact bignum arithmetic.
"""

from .field import Fp, batch_inv
from .ext import Tower, Fp2Field, Fp6Field, Fp12Field
from .curve import AffinePoint, CurveGroup
from .ntt import ntt, intt
from .poly import Poly
from .pairing import Pairing
