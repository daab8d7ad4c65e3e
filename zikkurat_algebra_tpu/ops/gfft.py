"""Group-element FFT (curve FFT) on limb planes.

TPU analog of the reference's point-valued radix-2 FFT
(lib/cbits/curves/g1/jac/bn128_G1_jac.c:727-838, exposed as
`curveFFT`/`curveIFFT` in Class/Curve.hs:92-96) — the identical butterfly
recursion as the scalar NTT but with point add/sub and
scalar-multiplication-by-twiddle.  Used for Lagrange-basis SRS conversion
(examples/KZG.hs:55).

Iterative Cooley-Tukey over a batch of projective points; twiddle scalars
are STATIC per (domain, stage), so their double-and-add chains are baked
as bit-plane constants.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.jit import jit_method
from .curve import ProjCurveOps, Point
from .ntt import bit_reverse_perm
from ..oracle.ntt import subgroup_gen

U32 = jnp.uint32


class GroupFFT:
    """FFT over curve points for a 2^m domain in the scalar field."""

    def __init__(self, ops: ProjCurveOps, fr_params, log2_size: int):
        self.ops = ops
        self.m = log2_size
        self.n = 1 << log2_size
        self.r = fr_params.p
        self.nbits = self.r.bit_length()
        self.gen = subgroup_gen(fr_params, log2_size)
        self.gen_inv = pow(self.gen, -1, self.r)
        self.n_inv = pow(self.n, -1, self.r)
        self._perm = bit_reverse_perm(self.m)
        self._fwd = self._stage_bits(self.gen)
        self._inv = self._stage_bits(self.gen_inv)
        self._ninv_digits = jnp.asarray(self._to_digits([self.n_inv])[:, 0])

    def _to_bits(self, vals: List[int]) -> np.ndarray:
        """Vectorized int -> bit-plane conversion (a per-bit Python loop
        would cost nbits*half operations — prohibitive for big domains)."""
        n = len(vals)
        nbytes = (self.nbits + 7) // 8
        buf = bytearray(n * nbytes)
        for j, v in enumerate(vals):
            buf[j * nbytes:(j + 1) * nbytes] = v.to_bytes(nbytes, "little")
        B = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(n, nbytes)
        bits = np.unpackbits(B, axis=1, bitorder="little")[:, :self.nbits]
        return np.ascontiguousarray(bits.T.astype(np.uint32))

    def _to_digits(self, vals: List[int], w: int = 4) -> np.ndarray:
        """int list -> (S, n) MSB-first w-bit digit planes (windowed
        scalar-mul input)."""
        bits = self._to_bits(vals)                    # (nbits, n) LSB-first
        nb = bits.shape[0]
        pad = (-nb) % w
        if pad:
            bits = np.concatenate(
                [bits, np.zeros((pad, bits.shape[1]), np.uint32)], 0
            )
        s = bits.shape[0] // w
        weights = (1 << np.arange(w, dtype=np.uint32)).reshape(1, w, 1)
        digits = (bits.reshape(s, w, -1) * weights).sum(1).astype(np.int32)
        return np.ascontiguousarray(digits[::-1])

    def _stage_bits(self, g: int) -> List[jax.Array]:
        tables = []
        for s in range(1, self.m + 1):
            w = pow(g, 1 << (self.m - s), self.r)
            half = 1 << (s - 1)
            tw, acc = [], 1
            for _ in range(half):
                tw.append(acc)
                acc = acc * w % self.r
            tables.append(jnp.asarray(self._to_digits(tw)))  # (S, half)
        return tables

    def _transform(self, P: Point, tables: List[jax.Array]) -> Point:
        ops = self.ops
        n = self.n
        nb = P[0].ndim - ops.f.struct_ndim  # batch rank (should be 1: the domain)
        assert P[0].shape[-1] == n
        from .ntt import bit_reverse, bit_reverse_halves

        ra, rb = (jnp.asarray(r) for r in bit_reverse_halves(self.m))
        P = tuple(bit_reverse(p, ra, rb) for p in P)
        struct = P[0].shape[:-1]
        for s in range(1, self.m + 1):
            half = 1 << (s - 1)
            nblocks = n >> s
            Pb = tuple(p.reshape(struct + (nblocks, 2, half)) for p in P)
            U = tuple(p[..., 0, :] for p in Pb)
            V = tuple(p[..., 1, :] for p in Pb)
            digits = tables[s - 1][:, None, :]        # (S, 1, half)
            T = ops.scalar_mul_digits(digits, V)
            hi = ops.add(U, T)
            lo = ops.sub(U, T)
            P = tuple(
                jnp.concatenate([h, l], axis=-1).reshape(struct + (n,))
                for h, l in zip(hi, lo)
            )
        return P

    @jit_method
    def fft(self, P: Point) -> Point:
        """Forward curve FFT (cf. fft_forward, bn128_G1_jac.c:727+)."""
        return self._transform(P, self._fwd)

    @jit_method
    def ifft(self, P: Point) -> Point:
        """Inverse curve FFT incl. 1/N scalar mul (fft_inverse)."""
        Q = self._transform(P, self._inv)
        d = self._ninv_digits[:, None]
        return self.ops.scalar_mul_digits(
            jnp.broadcast_to(d, (d.shape[0], Q[0].shape[-1])), Q
        )

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_GFFT_CACHE: dict = {}


def get_group_fft(ops: ProjCurveOps, fr_params, log2_size: int) -> GroupFFT:
    key = (id(ops), log2_size)
    g = _GFFT_CACHE.get(key)
    if g is None:
        g = GroupFFT(ops, fr_params, log2_size)
        _GFFT_CACHE[key] = g
    return g
