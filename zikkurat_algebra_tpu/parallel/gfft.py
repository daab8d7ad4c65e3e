"""Distributed group-element FFT (curve FFT) over a device mesh.

SURVEY.md §2.4: the reference's point-valued radix-2 FFT
(lib/cbits/curves/g1/jac/bn128_G1_jac.c:727-838, `curveFFT`/`curveIFFT`
in Class/Curve.hs:92-96) re-expressed as the four-step / transpose
algorithm over the flat 'data' mesh axis — the point twin of
parallel/ntt.py (same index algebra, with field butterflies replaced by
complete-formula point add/sub and twiddle multiplication replaced by
windowed scalar multiplication by baked digit planes):

    X[k2*N1 + k1] = GFFT_{n2->k2}( [g^(k1*n2)] * GFFT_{n1->k1}(P) )

Three all_to_all transposes move the axis being transformed on-device;
the inverse reuses the pipeline with inverse twiddles and the local
iffts (whose 1/N1 and 1/N2 scalar muls compose to 1/N).

Used for sharding the Lagrange-basis SRS conversion of the KZG setup
(examples/KZG.hs:55) across chips.
"""

from __future__ import annotations

from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.curve import ProjCurveOps, Point
from ..ops.gfft import GroupFFT, get_group_fft
from ..oracle.ntt import subgroup_gen
from .mesh import DATA_AXIS


class ShardedGroupFFT:
    """Four-step curve FFT of size 2^m over a power-of-two device mesh.
    Points are sharded on their trailing (domain) axis."""

    def __init__(self, ops: ProjCurveOps, fr_params, log2_size: int,
                 mesh: Mesh):
        self.ops = ops
        self.m = log2_size
        self.n = 1 << log2_size
        self.mesh = mesh
        from ..errors import DomainSizeError, MeshError

        d = mesh.devices.size
        if d & (d - 1) != 0:
            raise MeshError(f"device count {d} must be a power of two")
        self.ndev = d
        m2 = max((log2_size + 1) // 2, (d - 1).bit_length())
        m1 = log2_size - m2
        if (1 << m1) < d or (1 << m2) < d:
            raise DomainSizeError(
                f"domain 2^{log2_size} too small for {d} devices"
            )
        self.m1, self.m2 = m1, m2
        self.n1, self.n2 = 1 << m1, 1 << m2
        self.f1 = get_group_fft(ops, fr_params, m1)
        self.f2 = get_group_fft(ops, fr_params, m2)
        self.r = fr_params.p
        g = subgroup_gen(fr_params, log2_size)
        self._tw_fwd = self._tw_digits(g)
        self._tw_inv = self._tw_digits(pow(g, -1, self.r))

    def _tw_digits(self, g: int) -> jax.Array:
        """(S, n1, n2) MSB-first 4-bit digit planes of g^(k1*n2): the
        twiddle SCALARS of step 2, baked once (they are domain
        constants, exactly like the single-chip stage tables)."""
        vals: List[int] = []
        for k1 in range(self.n1):
            w = pow(g, k1, self.r)
            acc = 1
            for _ in range(self.n2):
                vals.append(acc)
                acc = acc * w % self.r
        digits = self.f1._to_digits(vals)          # (S, n1*n2)
        return jnp.asarray(
            digits.reshape(digits.shape[0], self.n1, self.n2)
        )

    def _transform(self, Pt: Point, inverse: bool) -> Point:
        ops = self.ops
        n1, n2, nd = self.n1, self.n2, self.ndev
        tw = self._tw_inv if inverse else self._tw_fwd
        fft1 = self.f1.ifft if inverse else self.f1.fft
        fft2 = self.f2.ifft if inverse else self.f2.fft
        sd = ops.f.struct_ndim                     # leading limb/struct rank

        def to_cols(A):
            """(.., n1/D, n2) -> (.., n1, n2/D) via all_to_all."""
            r = A.ndim
            A = A.reshape(A.shape[:-1] + (nd, n2 // nd))
            A = lax.all_to_all(A, DATA_AXIS, split_axis=r - 1,
                               concat_axis=r - 2)
            return A.reshape(A.shape[:-3] + (n1, n2 // nd))

        def to_rows(B):
            """(.., n1, n2/D) -> (.., n1/D, n2) via all_to_all."""
            r = B.ndim
            B = B.reshape(B.shape[:-2] + (nd, n1 // nd, B.shape[-1]))
            B = lax.all_to_all(B, DATA_AXIS, split_axis=r - 2,
                               concat_axis=r - 1)
            return B.reshape(B.shape[:-3] + (n1 // nd,
                                             B.shape[-2] * B.shape[-1]))

        def spec(x):
            return P(*((None,) * (x.ndim - 1) + (DATA_AXIS,)))

        in_specs = (
            tuple(spec(x) for x in Pt),
            P(None, None, DATA_AXIS),
        )

        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=tuple(spec(x) for x in Pt),
            check_vma=False,
        )
        def run(Pl, twl):
            A = tuple(
                x.reshape(x.shape[:-1] + (n1 // nd, n2)) for x in Pl
            )
            At = tuple(to_cols(x) for x in A)      # (.., n1, n2/D)
            # step 1: group FFT over n1 — move to last axis, batched
            Y = fft1(tuple(jnp.swapaxes(x, -1, -2) for x in At))
            # step 2: twiddle scalar-mul by g^(k1*n2) (twl sliced on n2);
            # Y is (.., n2/D, n1), twl (S, n1, n2/D) -> (S, n2/D, n1)
            Y = ops.scalar_mul_digits(jnp.swapaxes(twl, -1, -2), Y)
            Y = tuple(jnp.swapaxes(x, -1, -2) for x in Y)
            # step 3: group FFT over n2 — needs n2 local again
            Z = fft2(tuple(to_rows(x) for x in Y))  # (.., n1/D, n2)
            # step 4: natural order X[k2*N1 + k1] = Z[k1, k2]
            Zt = tuple(to_cols(x) for x in Z)       # (.., n1, n2/D)
            return tuple(
                jnp.swapaxes(x, -1, -2).reshape(
                    x.shape[:-2] + ((n2 // nd) * n1,)
                )
                for x in Zt
            )

        return run(Pt, tw)

    def fft(self, Pt: Point) -> Point:
        return self._transform(Pt, inverse=False)

    def ifft(self, Pt: Point) -> Point:
        return self._transform(Pt, inverse=True)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
