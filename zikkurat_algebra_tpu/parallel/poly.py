"""Domain-partitioned polynomial pipeline over a device mesh.

SURVEY.md §2.4 row 4: the single-device PolyOps kernels
(ops/poly.py, TPU analog of lib/cbits/curves/poly/mont/*_poly_mont.c)
re-expressed with the coefficient axis sharded over the flat 'data'
mesh axis:

  - ring ops (add/sub/scale) are pointwise — jit + NamedSharding
    propagation runs them shard-local with zero collectives;
  - `mul` runs the four-step distributed NTT (parallel/ntt.py) on both
    operands, a shard-local pointwise product, and the distributed iNTT;
  - `eval_at` builds each shard's slice of the power ladder locally
    (offset x^(i*chunk) by square-and-multiply on the axis index) and
    finishes with one lazy-limb psum + a single wide Montgomery
    reduction (same trick as parallel/vector.sharded_dot);
  - `div_by_vanishing` (x^n - eta), the KZG quotient kernel
    (cf. bn128_poly_mont.c:317-397): the block recurrence
    Q_{j-1} = B_j + eta*Q_j is a SUFFIX scan under the affine operator
    (v1, s1) o (v2, s2) = (v1 + s1*v2, s1*s2) — run log-depth inside
    each shard, then combined across devices with an all_gather of one
    (L, n) summary block per device and a static D-step carry fold
    (the scale factor eta^(blocks/device) is compile-time constant).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.field import Field
from ..ops import vector as V
from ..ops.poly import get_poly_ops
from .mesh import DATA_AXIS
from .ntt import ShardedNTT

I32 = jnp.int32


class ShardedPolyOps:
    """Polynomial kernels over one field with the coefficient axis
    sharded; bound to a fixed power-of-two array size 2^m (static
    shapes, as everywhere in the package)."""

    def __init__(self, field: Field, log2_size: int, mesh: Mesh):
        self.f = field
        self.m = log2_size
        self.n = 1 << log2_size
        self.mesh = mesh
        self.ndev = mesh.devices.size
        self.chunk = self.n // self.ndev
        from ..errors import DomainSizeError

        if self.chunk * self.ndev != self.n or self.chunk < 1:
            raise DomainSizeError(
                f"poly size 2^{log2_size} not divisible over "
                f"{self.ndev} devices"
            )
        self.local = get_poly_ops(field)
        self._sntt = None

    @property
    def sntt(self) -> ShardedNTT:
        if self._sntt is None:
            self._sntt = ShardedNTT(self.f, self.m, self.mesh)
        return self._sntt

    # -- pointwise ring ops (sharding-propagated, no collectives) ----------
    def add(self, a, b):
        return self.local.add(a, b)

    def sub(self, a, b):
        return self.local.sub(a, b)

    def scale(self, s, a):
        return self.local.scale(s, a)

    # -- multiplication ----------------------------------------------------
    def mul(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Product of two sharded (L, n) coefficient arrays via the
        distributed NTT.  CYCLIC if deg a + deg b >= n — callers must
        leave the top half of each operand zero (same contract as one
        2^m NTT-mul step of ops/poly.mul_ntt)."""
        f = self.f
        fa = self.sntt.ntt(a)
        fb = self.sntt.ntt(b)
        return self.sntt.intt(f.mul(fa, fb))

    # -- evaluation --------------------------------------------------------
    def eval_at(self, x: jax.Array, a: jax.Array) -> jax.Array:
        """P(x) for replicated x (L,) and sharded coeffs (L, n) ->
        replicated (L,)."""
        f = self.f
        chunk = self.chunk
        ibits = max(1, (self.ndev - 1).bit_length())

        @partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(None), P(None, DATA_AXIS)), out_specs=P(None),
            check_vma=False,
        )
        def run(xv, al):
            # x^chunk: chunk is a power of two -> log2(chunk) squarings
            xc = xv
            for _ in range(chunk.bit_length() - 1):
                xc = f.sqr(xc)
            # offset = (x^chunk)^i, i = axis index (square-and-multiply
            # over the few bits of i)
            i = lax.axis_index(DATA_AXIS)
            off = f.one(())
            sq = xc
            for bit in range(ibits):
                hit = ((i >> bit) & 1) == 1
                off = f.select(
                    jnp.broadcast_to(hit, off.shape[1:]), f.mul(off, sq), off
                )
                sq = f.sqr(sq)
            pw = V.powers(f, off, xv, chunk)       # (L, chunk) ladder
            local = V.dot_prod(f, al, pw)
            lazy = lax.psum(local, DATA_AXIS)
            return V.reduce_wide(f, lazy)

        return run(x, a)

    # -- vanishing-polynomial division ------------------------------------
    def div_by_vanishing(self, a: jax.Array, n_van: int, eta: jax.Array
                         ) -> Tuple[jax.Array, jax.Array]:
        """Divide the sharded (L, n) coefficient array by (x^n_van - eta).

        Returns (quot, rem): quot is a FULL-SIZE (L, n) sharded array
        whose top n_van coefficients are zero (the valid quotient is
        quot[..., :n - n_van]), rem is a replicated (L, n_van) array.
        Requires n_van to divide the per-device chunk (blocks nest in
        shards); for larger n_van the single-device kernel under jit
        with sharded inputs is already shard-local per block."""
        f = self.f
        L = f.L
        chunk, ndev = self.chunk, self.ndev
        from ..errors import DimensionError

        if chunk % n_van:
            raise DimensionError(
                f"vanishing degree {n_van} must divide the per-device "
                f"chunk {chunk} (use the local kernel for larger blocks)"
            )
        kloc = chunk // n_van                      # blocks per device

        @partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(None, DATA_AXIS), P(None)),
            out_specs=(P(None, DATA_AXIS), P(None)),
            check_vma=False,
        )
        def run(al, etav):
            B = al.reshape(L, kloc, n_van)         # local little-endian blocks
            etab = jnp.broadcast_to(etav[:, None, None], (L, kloc, n_van))

            # local suffix scan: R_j = B_j + eta * R_{j+1} (affine pairs)
            def combine(hi, lo):
                # hi covers blocks left of lo in suffix (reversed) order
                (v1, s1), (v2, s2) = lo, hi
                return (f.add(v1, f.mul(s1, v2)), f.mul(s1, s2))

            elems = (jnp.flip(B, 1), etab)
            Rrev, _ = lax.associative_scan(combine, elems, axis=1)
            R = jnp.flip(Rrev, 1)                  # (L, kloc, n_van) local R_j

            # cross-device carry: R_j += eta^(kloc - j) * carry, where
            # carry = global suffix value at the next device's first
            # block.  Summary per device = its zero-carry R_0; the scale
            # eta^kloc is the same compile-time power for every device.
            i = lax.axis_index(DATA_AXIS)
            v_all = lax.all_gather(R[:, 0], DATA_AXIS)      # (D, L, n_van)
            s = etav
            for _ in range(kloc.bit_length() - 1):          # eta^kloc
                s = f.sqr(s)
            if kloc & (kloc - 1):                           # non-power-of-two
                s = f.pow_static(etav, kloc)
            sb = jnp.broadcast_to(s[:, None], (L, n_van))
            carries = [jnp.zeros((L, n_van), I32)]          # carry for dev D-1
            for d in range(ndev - 2, -1, -1):
                carries.append(f.add(v_all[d + 1], f.mul(sb, carries[-1])))
            carry_stack = jnp.stack(carries[::-1], 0)       # (D, L, n_van)
            carry = lax.dynamic_index_in_dim(
                carry_stack, i, axis=0, keepdims=False
            )
            # eta^(kloc-j) ladder for local blocks j = 0..kloc-1
            epow = V.powers(f, etav, etav, kloc)            # eta^1..eta^kloc
            epow = jnp.flip(epow, -1)                       # j=0 -> eta^kloc
            Rg = f.add(R, f.mul(
                jnp.broadcast_to(epow[:, :, None], (L, kloc, n_van)),
                jnp.broadcast_to(carry[:, None, :], (L, kloc, n_van)),
            ))

            # rem = global R_0 (device 0, block 0), replicated via psum
            rem_local = jnp.where(i == 0, Rg[:, 0], jnp.zeros((L, n_van), I32))
            rem = lax.psum(rem_local, DATA_AXIS)

            # quotient block q_j = R_{j+1}: shift blocks down by one —
            # each device takes its own blocks 1..kloc-1 plus the next
            # device's first block (ppermute left); the top device pads
            # with zeros (quotient has k-1 blocks).
            nxt = lax.ppermute(
                Rg[:, 0], DATA_AXIS,
                [(d, (d - 1) % ndev) for d in range(ndev)],
            )
            nxt = jnp.where(i == ndev - 1, jnp.zeros((L, n_van), I32), nxt)
            q = jnp.concatenate([Rg[:, 1:], nxt[:, None]], 1)
            return q.reshape(L, chunk), rem

        return run(a, eta)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
