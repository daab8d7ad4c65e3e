"""Host-side conversions between Python ints and uint32 limb planes.

The analog of the reference's Integer<->limb marshalling
(lib/src/ZK/Algebra/Helpers.hs:35-55 and `to`/`from` in Fr/Std.hs:69-73),
but batched: a list of N ints becomes one (L, N) uint32 array.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Union

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def ints_to_limbs(values: Union[int, Sequence[int]], L: int) -> np.ndarray:
    """Python int(s) -> uint32 limb planes.

    A single int gives shape (L,); a sequence of N ints gives (L, N).
    Values must be in [0, 2^(16 L)).
    """
    if isinstance(values, int):
        return np.array(
            [(values >> (LIMB_BITS * k)) & LIMB_MASK for k in range(L)],
            dtype=np.uint32,
        )
    vals = list(values)
    out = np.empty((L, len(vals)), dtype=np.uint32)
    for n, v in enumerate(vals):
        for k in range(L):
            out[k, n] = (v >> (LIMB_BITS * k)) & LIMB_MASK
    return out


def limbs_to_ints(limbs: np.ndarray) -> Union[int, List[int]]:
    """uint32 limb planes -> Python int(s).  (L,) -> int; (L, N) -> [int]*N;
    higher-rank batches are flattened to a list in C order."""
    arr = np.asarray(limbs)
    L = arr.shape[0]
    if arr.ndim == 1:
        acc = 0
        for k in range(L - 1, -1, -1):
            acc = (acc << LIMB_BITS) | int(arr[k])
        return acc
    flat = arr.reshape(L, -1)
    out = []
    for n in range(flat.shape[1]):
        acc = 0
        for k in range(L - 1, -1, -1):
            acc = (acc << LIMB_BITS) | int(flat[k, n])
        out.append(acc)
    return out


def int_to_bits(e: int, width: int | None = None) -> np.ndarray:
    """Non-negative int -> little-endian bit array (uint32), for pow scans."""
    if e < 0:
        raise ValueError("negative exponent")
    if width is None:
        width = max(1, e.bit_length())
    return np.array([(e >> i) & 1 for i in range(width)], dtype=np.uint32)
