"""Distributed NTT over a device mesh (four-step / transpose algorithm).

SURVEY.md §2.4 row 2: local butterfly stages per chip + all_to_all
transposes over ICI for the cross-shard stages — the distributed
re-formulation of the recursive radix-2 NTT (bn128_poly_mont.c:418-522).

Math: N = N1*N2, input index n = n1*N2 + n2 (n1 outer), output index
k = k2*N1 + k1 (k2 outer — natural order):

    X[k2*N1 + k1] = NTT_{n2->k2}( g^(k1*n2) * NTT_{n1->k1}(A)[k1, n2] )

with g the order-N generator, g1 = g^N2 (order N1), g2 = g^N1 (order N2).

Device layout: the flat (L, N) array is sharded on its last axis, so each
device holds N1/D complete rows.  Three all_to_all transposes move the
axis being transformed on-device:

  T1: (L, n1/D, n2) -> (L, n1, n2/D)    step 1: NTT over n1 (local)
                                         step 2: twiddle g^(k1*n2) (local)
  T2: (L, n1, n2/D) -> (L, n1/D, n2)    step 3: NTT over n2 (local)
  T3: (L, n1/D, n2) -> (L, n1, n2/D)    step 4: local transpose+reshape
                                         -> natural-order output chunks.

The inverse transform reuses the same pipeline with inverse twiddles and
the domains' intt (whose 1/N1 and 1/N2 scalings compose to 1/N).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.field import Field
from ..ops.ntt import get_domain
from .mesh import DATA_AXIS


class ShardedNTT:
    """Four-step NTT of size 2^m over a power-of-two device mesh."""

    def __init__(self, field: Field, log2_size: int, mesh: Mesh):
        self.field = field
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
        self.dom1 = get_domain(field, m1)
        self.dom2 = get_domain(field, m2)
        self.dom = get_domain(field, log2_size)
        self._tw_fwd = self._twiddle_table(self.dom.gen)
        self._tw_inv = self._twiddle_table(self.dom.gen_inv)

    def _twiddle_table(self, g: int) -> jax.Array:
        """(L, n1, n2) table of g^(k1*n2) in Montgomery form, built on
        device with two nested log-depth prefix products (host int loops
        would cost seconds at 2^20)."""
        f = self.field
        from ..ops.vector import powers

        bases = powers(f, f.one(()), f.encode(g), self.n1)   # (L, n1): g^k1
        one_col = f.one((self.n1, 1))
        rest = jnp.broadcast_to(
            bases[:, :, None], (f.L, self.n1, self.n2 - 1)
        )
        elems = jnp.concatenate([one_col, rest], axis=2)
        return jax.jit(
            lambda e: lax.associative_scan(
                lambda u, v: f.mul(u, v), e, axis=2
            )
        )(elems)

    def _transform(self, x: jax.Array, inverse: bool) -> jax.Array:
        f = self.field
        L, n1, n2, nd = f.L, self.n1, self.n2, self.ndev
        dom1, dom2 = self.dom1, self.dom2
        tw = self._tw_inv if inverse else self._tw_fwd
        ntt1 = dom1.intt if inverse else dom1.ntt
        ntt2 = dom2.intt if inverse else dom2.ntt

        # NOTE all_to_all(tiled=False) semantics: the split axis (size =
        # device count) is REMOVED and the received shards appear as a NEW
        # source-major axis at position concat_axis.

        def to_cols(A):
            """(L, n1/D, n2) -> (L, n1, n2/D) via all_to_all."""
            A = A.reshape(L, A.shape[1], nd, n2 // nd)
            # -> (L, src=nd, n1/D, n2/D); flatten (src, n1/D) = global n1
            A = lax.all_to_all(A, DATA_AXIS, split_axis=2, concat_axis=1)
            return A.reshape(L, n1, n2 // nd)

        def to_rows(B):
            """(L, n1, n2/D) -> (L, n1/D, n2) via all_to_all."""
            B = B.reshape(L, nd, n1 // nd, n2 // nd)
            # -> (L, n1/D, src=nd, n2/D); flatten (src, n2/D) = global n2
            B = lax.all_to_all(B, DATA_AXIS, split_axis=1, concat_axis=2)
            return B.reshape(L, n1 // nd, n2)

        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, DATA_AXIS), P(None, None, DATA_AXIS)),
            out_specs=P(None, DATA_AXIS),
            check_vma=False,
        )
        def run(xl, twl):
            A = xl.reshape(L, n1 // nd, n2)       # local rows
            At = to_cols(A)                        # (L, n1, n2/D)
            # step 1: NTT over n1 (axis 1) — move to last, transform, back
            Y = jnp.moveaxis(ntt1(jnp.moveaxis(At, 1, -1)), -1, 1)
            # step 2: twiddle (twl is the local (L, n1, n2/D) slice)
            Y = f.mul(Y, twl)
            # step 3: NTT over n2 — needs n2 local again
            Z = ntt2(to_rows(Y))                   # (L, n1/D, n2)
            # step 4: natural order: X[k2*N1 + k1] = Z[k1, k2]
            Zt = to_cols(Z)                        # (L, n1, n2/D)
            return jnp.moveaxis(Zt, 1, 2).reshape(L, (n2 // nd) * n1)

        return run(x, tw)

    def ntt(self, x: jax.Array) -> jax.Array:
        return self._transform(x, inverse=False)

    def intt(self, x: jax.Array) -> jax.Array:
        return self._transform(x, inverse=True)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
