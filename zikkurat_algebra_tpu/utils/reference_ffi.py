"""ctypes bindings to the REFERENCE's own compiled C kernels.

scripts/build_reference.sh compiles /root/reference/lib/cbits (read-only,
nothing copied into this repo) into /tmp/zikkurat_ref/libzikkurat_ref.so.
These bindings exist for two purposes only:

* differential testing: bit-exact comparison of our TPU kernels against
  the reference's generated C through the Montgomery word interchange
  (the strongest parity evidence available);
* baseline measurement: timing the reference's own MSM/pairing on this
  host (BASELINE.md requires measured, not copied, numbers).

Word conventions (reference): little-endian uint64 words; Fr = r_words,
Fp = p_words; affine G1 = (x, y) Montgomery = 2*p_words; Jacobian =
(X, Y, Z) = 3*p_words; Fp12 = 12 Fp coefficients in packPrimeBase order.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

LIB_PATH = "/tmp/zikkurat_ref/libzikkurat_ref.so"
_BUILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "..", "scripts", "build_reference.sh")


def ensure_built() -> Optional[str]:
    if os.path.exists(LIB_PATH):
        return LIB_PATH
    try:
        subprocess.run(["bash", _BUILD], check=True, capture_output=True,
                       timeout=300)
    except Exception:
        return None
    return LIB_PATH if os.path.exists(LIB_PATH) else None


class ReferenceLib:
    """Thin per-curve accessor over the reference shared library."""

    PREFIX = {"BN128": "bn128", "BLS12-381": "bls12_381"}

    def __init__(self, curve_name: str):
        path = ensure_built()
        if path is None:
            raise RuntimeError("reference library unavailable")
        self.lib = ctypes.CDLL(path)
        self.pre = self.PREFIX[curve_name]
        from .. import params as P

        self.curve = P.CURVES[curve_name]
        self.p_words = -(-self.curve.fp.p.bit_length() // 64)
        self.r_words = -(-self.curve.fr.p.bit_length() // 64)

    # -- helpers -------------------------------------------------------------
    @staticmethod
    def _arr(words: Sequence[int]) -> np.ndarray:
        return np.array(words, dtype=np.uint64)

    def int_to_words(self, v: int, n: int) -> np.ndarray:
        return np.array(
            [(v >> (64 * i)) & ((1 << 64) - 1) for i in range(n)],
            dtype=np.uint64,
        )

    @staticmethod
    def words_to_int(a: np.ndarray) -> int:
        acc = 0
        for w in reversed(list(a)):
            acc = (acc << 64) | int(w)
        return acc

    def _fn(self, name: str):
        return getattr(self.lib, f"{self.pre}_{name}")

    def _ptr(self, a: np.ndarray):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))

    # -- Fr Montgomery ops ----------------------------------------------------
    def fr_mont(self, op: str, *operands: int) -> int:
        """Run <curve>_Fr_mont_<op> on standard-rep int operands; returns
        a standard-rep int (converts via the reference's own from/to_std)."""
        n = self.r_words
        srcs = []
        for v in operands:
            std = self.int_to_words(v, n)
            mont = np.zeros(n, np.uint64)
            self._fn("Fr_mont_from_std")(self._ptr(std), self._ptr(mont))
            srcs.append(mont)
        out = np.zeros(n, np.uint64)
        self._fn(f"Fr_mont_{op}")(*[self._ptr(s) for s in srcs], self._ptr(out))
        back = np.zeros(n, np.uint64)
        self._fn("Fr_mont_to_std")(self._ptr(out), self._ptr(back))
        return self.words_to_int(back)

    def fr_to_mont_words(self, v: int) -> List[int]:
        n = self.r_words
        std = self.int_to_words(v, n)
        mont = np.zeros(n, np.uint64)
        self._fn("Fr_mont_from_std")(self._ptr(std), self._ptr(mont))
        return [int(w) for w in mont]

    # -- G1 -------------------------------------------------------------------
    def g1_affine_words(self, pt) -> np.ndarray:
        """Oracle affine point -> reference affine encoding (x, y mont);
        infinity = all-0xFF sentinel (bn128_G1_affine.c:43-92)."""
        n = self.p_words
        out = np.zeros(2 * n, np.uint64)
        if pt is None:
            out[:] = (1 << 64) - 1
            return out
        for i, c in enumerate(pt):
            std = self.int_to_words(c, n)
            mont = np.zeros(n, np.uint64)
            self._fn("Fp_mont_from_std")(self._ptr(std), self._ptr(mont))
            out[i * n:(i + 1) * n] = mont
        return out

    def g1_from_affine_words(self, words: np.ndarray):
        n = self.p_words
        if all(int(w) == (1 << 64) - 1 for w in words[:n]):
            return None
        out = []
        for i in range(2):
            std = np.zeros(n, np.uint64)
            self._fn("Fp_mont_to_std")(
                self._ptr(np.ascontiguousarray(words[i * n:(i + 1) * n])),
                self._ptr(std),
            )
            out.append(self.words_to_int(std))
        return tuple(out)

    def msm(self, scalars: Sequence[int], points) -> object:
        """Reference Pippenger MSM (std-rep scalars, oracle affine points)
        -> oracle affine point."""
        n = len(scalars)
        expos = np.concatenate(
            [self.int_to_words(s, self.r_words) for s in scalars]
        )
        grps = np.concatenate([self.g1_affine_words(p) for p in points])
        jac = np.zeros(3 * self.p_words, np.uint64)
        fn = self._fn("G1_jac_MSM_std_coeff_jac_out")
        fn(ctypes.c_int(n), self._ptr(expos), self._ptr(grps),
           self._ptr(jac), ctypes.c_int(self.r_words))
        aff = np.zeros(2 * self.p_words, np.uint64)
        self._fn("G1_jac_to_affine")(self._ptr(jac), self._ptr(aff))
        return self.g1_from_affine_words(aff)

    # -- pairing --------------------------------------------------------------
    def pairing(self, p1, q2) -> tuple:
        """Reference optimal-Ate pairing on oracle affine points ->
        oracle Fp12 nested-tuple (standard rep)."""
        n = self.p_words
        P = self.g1_affine_words(p1)
        Q = np.zeros(4 * n, np.uint64)
        if q2 is None:
            Q[:] = (1 << 64) - 1
        else:
            coords = [q2[0][0], q2[0][1], q2[1][0], q2[1][1]]
            for i, c in enumerate(coords):
                std = self.int_to_words(c, n)
                mont = np.zeros(n, np.uint64)
                self._fn("Fp_mont_from_std")(self._ptr(std), self._ptr(mont))
                Q[i * n:(i + 1) * n] = mont
        out = np.zeros(12 * n, np.uint64)
        self._fn("pairing_affine")(self._ptr(P), self._ptr(Q), self._ptr(out))
        coeffs = []
        for i in range(12):
            std = np.zeros(n, np.uint64)
            self._fn("Fp_mont_to_std")(
                self._ptr(np.ascontiguousarray(out[i * n:(i + 1) * n])),
                self._ptr(std),
            )
            coeffs.append(self.words_to_int(std))
        # packPrimeBase order == oracle coeffs() order
        f2 = [(coeffs[2 * i], coeffs[2 * i + 1]) for i in range(6)]
        return ((f2[0], f2[1], f2[2]), (f2[3], f2[4], f2[5]))

    # -- NTT ------------------------------------------------------------------
    def ntt_forward(self, values: Sequence[int], log2_size: int,
                    gen: int) -> List[int]:
        n = len(values)
        src = np.concatenate(
            [self._arr(self.fr_to_mont_words(v)) for v in values]
        )
        tgt = np.zeros(n * self.r_words, np.uint64)
        gen_m = self._arr(self.fr_to_mont_words(gen))
        self._fn("poly_mont_ntt_forward")(
            ctypes.c_int(log2_size), self._ptr(gen_m), self._ptr(src),
            self._ptr(tgt),
        )
        out = []
        for i in range(n):
            std = np.zeros(self.r_words, np.uint64)
            self._fn("Fr_mont_to_std")(
                self._ptr(np.ascontiguousarray(
                    tgt[i * self.r_words:(i + 1) * self.r_words])),
                self._ptr(std),
            )
            out.append(self.words_to_int(std))
        return out


def time_reference_pairing(curve_name: str, iters: int = 4,
                           seed: int = 777):
    """Measure the REFERENCE's own single-threaded optimal-Ate pairing
    (pairings/s) on this host — the CPU baseline for BASELINE config 5."""
    import time
    import random

    rl = ReferenceLib(curve_name)
    from ..oracle.groups import g1_group, g2_group
    from .. import params as P

    curve = P.CURVES[curve_name]
    og1 = g1_group(curve)
    og2 = g2_group(curve)
    rng = random.Random(seed)
    p1 = og1.rnd(rng)
    q2 = og2.rnd(rng)
    n = rl.p_words
    Pw = rl.g1_affine_words(p1)
    Q = np.zeros(4 * n, np.uint64)
    coords = [q2[0][0], q2[0][1], q2[1][0], q2[1][1]]
    for i, c in enumerate(coords):
        std = rl.int_to_words(c, n)
        mont = np.zeros(n, np.uint64)
        rl._fn("Fp_mont_from_std")(rl._ptr(std), rl._ptr(mont))
        Q[i * n:(i + 1) * n] = mont
    out = np.zeros(12 * n, np.uint64)
    fn = rl._fn("pairing_affine")
    fn(rl._ptr(Pw), rl._ptr(Q), rl._ptr(out))  # warm
    t0 = time.time()
    for _ in range(iters):
        fn(rl._ptr(Pw), rl._ptr(Q), rl._ptr(out))
    secs = (time.time() - t0) / iters
    return 1.0 / secs, secs


def time_reference_msm(curve_name: str, log2n: int, seed: int = 12345):
    """Measure the REFERENCE's own single-threaded C Pippenger MSM
    (points/s) on this host — the authoritative CPU baseline."""
    import time
    import random

    rl = ReferenceLib(curve_name)
    from ..oracle.groups import g1_group
    from .. import params as P

    og = g1_group(P.CURVES[curve_name])
    rng = random.Random(seed)
    n = 1 << log2n
    nbase = min(n, 256)
    base = [og.rnd(rng) for _ in range(nbase)]
    pts = [base[i % nbase] for i in range(n)]
    ks = [rng.randrange(og.r) for _ in range(n)]

    expos = np.concatenate([rl.int_to_words(s, rl.r_words) for s in ks])
    grps = np.concatenate([rl.g1_affine_words(p) for p in pts])
    jac = np.zeros(3 * rl.p_words, np.uint64)
    fn = rl._fn("G1_jac_MSM_std_coeff_jac_out")
    t0 = time.time()
    fn(ctypes.c_int(n), rl._ptr(expos), rl._ptr(grps), rl._ptr(jac),
       ctypes.c_int(rl.r_words))
    secs = time.time() - t0
    return n / secs, secs
