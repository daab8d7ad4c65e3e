"""Differential test of the native CPU baseline (cpp/msm_bench --io)
against the oracle MSM.  Skipped when the binary hasn't been built."""

import os
import subprocess

import pytest

from zikkurat_algebra_tpu import params as P
from zikkurat_algebra_tpu.oracle.groups import g1_group

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
EXE = os.path.join(ROOT, "cpp", "build", "msm_bench")


@pytest.mark.skipif(not os.path.exists(EXE), reason="cpp baseline not built")
def test_cpp_msm_vs_oracle(rng):
    curve = P.BLS12_381
    og = g1_group(curve)
    n = 33
    pts = [og.rnd(rng) for _ in range(n)]
    pts[5] = None
    ks = [rng.randrange(og.r) for _ in range(n)]
    ks[2] = 0
    want = og.msm(ks, pts)

    lines = [str(n)]
    for k in ks:
        lines.append(f"{k:x}")
    for p in pts:
        if p is None:
            lines.append("0")
            lines.append("0")
            lines.append("1")
        else:
            lines.append(f"{p[0]:x}")
            lines.append(f"{p[1]:x}")
            lines.append("0")
    out = subprocess.run(
        [EXE, "--io"], input="\n".join(lines), capture_output=True,
        text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    res = out.stdout.split()
    inf, xs, ys = int(res[0]), int(res[1], 16), int(res[2], 16)
    if want is None:
        assert inf == 1
    else:
        assert inf == 0
        assert (xs, ys) == want


@pytest.mark.skipif(not os.path.exists(EXE), reason="cpp baseline not built")
def test_cpp_g2_msm_vs_oracle(rng):
    """G2 (Fp2 coords) differential test via --io-g2 (cf. the reference's
    G2 MSM, bn128_G2_proj.h:43-49)."""
    from zikkurat_algebra_tpu.oracle.groups import g2_group

    curve = P.BLS12_381
    og = g2_group(curve)
    n = 17
    pts = [og.rnd(rng) for _ in range(n)]
    pts[3] = None
    ks = [rng.randrange(og.r) for _ in range(n)]
    ks[1] = 0
    want = og.msm(ks, pts)

    lines = [str(n)]
    for k in ks:
        lines.append(f"{k:x}")
    for p in pts:
        if p is None:
            lines.extend(["0", "0", "0", "0", "1"])
        else:
            (x0, x1), (y0, y1) = p
            lines.extend([f"{x0:x}", f"{x1:x}", f"{y0:x}", f"{y1:x}", "0"])
    out = subprocess.run(
        [EXE, "--io-g2"], input="\n".join(lines), capture_output=True,
        text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    res = out.stdout.split()
    inf = int(res[0])
    got = (
        (int(res[1], 16), int(res[2], 16)),
        (int(res[3], 16), int(res[4], 16)),
    )
    if want is None:
        assert inf == 1
    else:
        assert inf == 0
        assert got == want
