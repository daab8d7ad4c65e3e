"""Typed API-boundary errors.

The reference raises dimension/domain errors at its Haskell binding
layer (lib/src/ZK/Algebra/Curves/BN128/G1/Proj.hs:239 "incompatible
array dimensions", Class/FFT.hs:61-63 domain-size errors); the TPU
framework raises these typed exceptions at the same boundaries.  They
survive `python -O` (unlike asserts) and are catchable by protocol code.
"""

from __future__ import annotations


class ZikkuratError(ValueError):
    """Base class for all boundary-validation errors."""


class DimensionError(ZikkuratError):
    """Array/batch dimensions incompatible with the requested operation."""


class DomainSizeError(ZikkuratError):
    """Evaluation-domain size mismatch (NTT/FFT domain vs array length)."""


class MeshError(ZikkuratError):
    """Device-mesh shape unsupported by the sharded kernel."""


class UnsupportedError(ZikkuratError):
    """Operation not supported for this curve family (e.g. G2/pairing on
    a fields+towers+G1-only family like BLS12-377)."""
