"""zikkurat_algebra_tpu — a TPU-native ZK-algebra framework.

A from-scratch JAX/XLA re-design of the capability surface of
bkomuves/zikkurat-algebra (big integers, prime fields, extension towers,
BN128 + BLS12-381 curves, NTT, MSM, pairings, KZG), built batch-first on
redundant limb-plane integer arithmetic with multi-chip scale-out.

Entry points:
    zikkurat_algebra_tpu.api        — per-curve kernel bundles
    zikkurat_algebra_tpu.params     — curve/field parameter registry
    zikkurat_algebra_tpu.oracle     — slow trusted int oracle (pure/ analog)
    zikkurat_algebra_tpu.protocols  — KZG pipeline (examples/ analog)
    zikkurat_algebra_tpu.parallel   — mesh sharding (new vs reference)
"""

from . import params  # noqa: F401

__version__ = "0.1.0"
