#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): BLS12-381 G1 Pippenger MSM points/sec on the TPU
at 2^20 (the BASELINE.json target config).  --n overrides; --smoke forces
2^10 on CPU.  Correctness is cross-checked against the oracle on a small
prefix before timing (at the MAIN problem shape, so the check run warms
the exact compile the timed runs reuse).

vs_baseline: ratio vs the measured native CPU reference implementation
(cpp/ zikkurat-style Jacobian Pippenger) when built — 0.0 until then.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_DATA = os.path.join(REPO, "bench_data")


def _tpu_alive(timeout_s: float = 180.0) -> bool:
    """Probe the (tunneled) TPU backend from a THROWAWAY subprocess with a
    hard deadline.  A wedged tunnel hangs any client at first device
    contact for ~2h (CLAUDE.md hazard); probing in-process would hang the
    whole bench run past the driver's timeout and record NOTHING.  If the
    probe fails, the caller falls back to a CPU smoke metric — a labeled
    fallback number beats an rc=124 blank."""
    code = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "np.asarray(jnp.ones((8,128),jnp.int32).sum())"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except Exception:
        return False


def _baseline_cache(key: str, measure, remeasure: bool = False):
    """points/s (or ops/s) CPU baseline, from the committed cache file
    bench_data/baselines.json unless absent or remeasure is set.  The
    cached values ARE measured on this host (scripts/measure_tpu.sh runs
    with remeasure) — caching just keeps the reference-C rebuild+timing
    (~1-2 min) out of the driver's timed window."""
    path = os.path.join(BENCH_DATA, "baselines.json")
    cache = {}
    if os.path.exists(path):
        try:
            with open(path) as fh:
                cache = json.load(fh)
        except Exception:
            cache = {}
    if not remeasure and key in cache:
        print(f"# baseline[{key}] = {cache[key]['pps']:.1f}/s (cached: "
              f"{cache[key]['how']})", file=sys.stderr)
        return cache[key]["pps"]
    got = measure()
    if got is not None:
        pps, how = got
        cache[key] = {"pps": pps, "how": how}
        try:
            os.makedirs(BENCH_DATA, exist_ok=True)
            with open(path, "w") as fh:
                json.dump(cache, fh, indent=1, sort_keys=True)
        except OSError:
            pass
        return pps
    return None


def _run_with_deadline(args) -> int:
    """Run the real TPU bench in a DETACHED child with a wall-clock
    budget (ZIKKURAT_BENCH_BUDGET seconds, default 900).

    A cold XLA compile of the big MSM graph through the remote axon
    compile service can exceed the driver's own timeout (round 2's
    recorded run died this way, rc=124, nothing recorded).  If the child
    does not print its JSON metric line in time, the parent emits a
    labeled CPU fallback metric and exits 0 — WITHOUT killing the child:
    killing a TPU client mid-compile wedges the tunneled session for
    ~2h (CLAUDE.md hazard), and the orphan finishing its compile warms
    the persistent cache so the NEXT run is fast."""
    import tempfile

    # 700 s: the round-1 driver run finished OK at ~710 s wall, so the
    # driver's own timeout is >~720 s; emitting the fallback at 700 s
    # leaves time for the CPU smoke metric before any plausible driver
    # deadline (the round-2 recorded run was killed rc=124 with NOTHING
    # printed — never risk that again)
    budget = float(os.environ.get("ZIKKURAT_BENCH_BUDGET", "700"))
    outf = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".bench.out", delete=False
    )
    env = dict(os.environ, ZIKKURAT_BENCH_CHILD="1")
    child = subprocess.Popen(
        [sys.executable, "-u", os.path.join(REPO, "bench.py")]
        + sys.argv[1:],
        stdout=outf, stderr=sys.stderr, env=env,
        start_new_session=True,
    )
    deadline = time.time() + budget
    seen = 0
    got_json = False
    while time.time() < deadline:
        rc = child.poll()
        with open(outf.name) as fh:
            data = fh.read()
        lines = data.splitlines()
        for ln in lines[seen:]:
            print(ln)
            if ln.lstrip().startswith("{"):
                got_json = True
        seen = len(lines)
        if rc is not None:
            if got_json and rc == 0:
                return 0
            break           # child died without a metric -> fallback
        if got_json:
            child.wait()
            with open(outf.name) as fh:
                for ln in fh.read().splitlines()[seen:]:
                    print(ln)
            return 0
        time.sleep(2)
    if child.poll() is None:
        print(f"# bench child (pid {child.pid}) exceeded {budget:.0f}s "
              "budget (cold compile?) — left running to warm the "
              "compile cache; emitting CPU fallback metric",
              file=sys.stderr)
    else:
        print(f"# bench child exited rc={child.returncode} without a "
              "metric — emitting CPU fallback metric", file=sys.stderr)
    fb_env = dict(os.environ, ZIKKURAT_BENCH_CHILD="1",
                  ZIKKURAT_METRIC_SUFFIX="_cpu_fallback")
    fb = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--smoke", "--workload", args.workload],
        env=fb_env, capture_output=True, text=True, timeout=1800,
    )
    sys.stdout.write(fb.stdout)
    sys.stderr.write(fb.stderr)
    return 0


def _emit(out: dict):
    """Print THE one JSON metric line (suffix marks degraded fallbacks)."""
    sfx = os.environ.get("ZIKKURAT_METRIC_SUFFIX", "")
    if sfx:
        out = dict(out, metric=out["metric"] + sfx)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20,
                    help="log2 number of points (default 2^20 — the "
                         "BASELINE.json headline config)")
    ap.add_argument("--curve", default="BLS12-381")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--check", type=int, default=6,
                    help="cross-check a 2^check-point prefix vs the oracle "
                         "(0 disables)")
    ap.add_argument("--window-chunk", type=int, default=None,
                    help="MSM windows per scan batch (None=auto)")
    ap.add_argument("--block", type=int, default=512,
                    help="MSM level-1 segment block size (0=assoc-scan); "
                         "512 measured best with the split sort (308.6k "
                         "vs 298.8k pts/s at 2^18)")
    ap.add_argument("--c", type=int, default=None, help="MSM window bits")
    ap.add_argument("--group", default="g1", choices=["g1", "g2"],
                    help="MSM curve group (G2 coords are Fp2)")
    ap.add_argument("--workload", default="msm",
                    choices=["msm", "ntt", "fieldmul", "kzg", "pairing",
                             "scaling"],
                    help="which BASELINE workload to time")
    ap.add_argument("--remeasure-baseline", action="store_true",
                    help="re-measure the CPU baseline instead of using "
                         "the committed bench_data/baselines.json cache")
    args = ap.parse_args()

    if not (args.cpu or args.smoke or os.environ.get("ZIKKURAT_NO_PROBE")
            or os.environ.get("ZIKKURAT_BENCH_CHILD")):
        if not _tpu_alive():
            # tunneled TPU unreachable/wedged: fall back to a small CPU
            # run so the driver still records a parseable (labeled) line
            print("# TPU probe FAILED — falling back to CPU smoke metric",
                  file=sys.stderr)
            os.environ["ZIKKURAT_METRIC_SUFFIX"] = "_cpu_fallback"
            args.cpu = True
            args.smoke = True
        else:
            return _run_with_deadline(args)
    if args.smoke:
        args.n = min(args.n, 10)
    if args.cpu or args.smoke:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from zikkurat_algebra_tpu.utils.cache import setup_cache
    setup_cache(jax)
    import numpy as np
    import jax.numpy as jnp

    from zikkurat_algebra_tpu import params as P
    from zikkurat_algebra_tpu.ops.curve import get_curves
    from zikkurat_algebra_tpu.ops.field import Field, ints_to_limbs15

    if jax.devices()[0].platform != "cpu" and not os.environ.get(
            "ZIKKURAT_NO_PALLAS"):
        Field.use_pallas = True
        Field.use_mxu = True
    if os.environ.get("ZIKKURAT_NO_MSM_KERNEL"):
        Field.use_msm_kernel = False
    if os.environ.get("ZIKKURAT_NTT_KERNEL"):
        Field.use_ntt_kernel = True
    ss = os.environ.get("ZIKKURAT_SPLIT_SORT")
    if ss is not None:
        Field.use_split_sort = ss not in ("0", "")
    ss = os.environ.get("ZIKKURAT_STABLE_SORT")
    if ss is not None:
        Field.use_stable_sort = ss not in ("0", "")
    ss = os.environ.get("ZIKKURAT_PACKED_FLAGS")
    if ss is not None:
        Field.use_packed_flags = ss not in ("0", "")
    ss = os.environ.get("ZIKKURAT_HOISTED_WSUM")
    if ss is not None:
        Field.use_hoisted_wsum = ss not in ("0", "")
    ss = os.environ.get("ZIKKURAT_HOISTED_SORT")
    if ss is not None:
        Field.use_hoisted_sort = ss not in ("0", "")
    ss = os.environ.get("ZIKKURAT_SORT_SHARD")
    if ss is not None:
        Field.msm_sort_shard_log2 = int(ss)
    ss = os.environ.get("ZIKKURAT_MERGE_SORT")
    if ss is not None:
        Field.msm_sort_merge_windows = ss not in ("0", "")
    ss = os.environ.get("ZIKKURAT_GATHER_BUCKETS")
    if ss is not None:
        Field.use_gather_buckets = ss not in ("0", "")
    if os.environ.get("ZIKKURAT_LOGDEPTH_WSUM"):
        Field.use_serial_wsum = False
    if os.environ.get("ZIKKURAT_SERIAL_WSUM"):
        Field.use_serial_wsum = True
    if os.environ.get("ZIKKURAT_MSM_UNROLL"):
        Field.pallas_unroll_msm = int(os.environ["ZIKKURAT_MSM_UNROLL"])
    if os.environ.get("ZIKKURAT_MSM_TILE"):
        Field.pallas_tile_msm = int(os.environ["ZIKKURAT_MSM_TILE"])

    if args.workload == "scaling":
        return bench_scaling(args, jax)
    if args.workload == "ntt":
        return bench_ntt(args, jax)
    if args.workload == "fieldmul":
        return bench_fieldmul(args, jax)
    if args.workload == "kzg":
        return bench_kzg(args, jax)
    if args.workload == "pairing":
        return bench_pairing(args, jax)

    curve = P.CURVES[args.curve]
    ck = get_curves(curve)
    fr = ck.fr
    fp = ck.tower.fp
    grp = args.group
    msm = ck.msm(grp)
    gops = ck.g1 if grp == "g1" else ck.g2
    encode_pts = ck.encode_g1 if grp == "g1" else ck.encode_g2
    decode_pts = ck.decode_g1 if grp == "g1" else ck.decode_g2
    og = ck.oracle_g1 if grp == "g1" else ck.oracle_g2
    n = 1 << args.n

    # synthesize points cheaply: random multiples of G via one batched
    # device scalar-mul (avoids the slow oracle for big N)
    rng = np.random.RandomState(12345)

    def rand_field_ints(count, p):
        nbytes = (p.bit_length() + 7) // 8 + 8
        return [
            int.from_bytes(rng.bytes(nbytes), "little") % p for c in range(count)
        ]

    t0 = time.time()
    ks = rand_field_ints(n, fr.p)
    k_limbs = jnp.asarray(ints_to_limbs15(ks, fr.L))
    nseed = min(n, 1024)
    # base set of distinct points: s_i * G for 1024 seeds, tiled.  The
    # seeds are cached in a committed npz so the driver's timed run skips
    # the device scalar-mul compile entirely (a cold-compile of that
    # windowed-scl graph alone costs minutes).
    seed_path = os.path.join(
        BENCH_DATA, f"seeds_{args.curve}_{grp}.npz".replace("-", "_")
    )
    seeds_aff = None
    if nseed == 1024 and os.path.exists(seed_path):
        z = np.load(seed_path)
        seeds_aff = (jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                     jnp.asarray(z["inf"]))
    if seeds_aff is None:
        seed_scalars = rand_field_ints(nseed, fr.p)
        G = gops.from_affine(encode_pts([og.gen] * len(seed_scalars)))
        s_limbs = fr.encode(seed_scalars, mont=False)
        seeds_proj = gops.scalar_mul_fr_std(s_limbs, G)
        seeds_aff = gops.to_affine(seeds_proj)
        if nseed == 1024:
            try:
                os.makedirs(BENCH_DATA, exist_ok=True)
                np.savez(seed_path, x=np.asarray(seeds_aff[0]),
                         y=np.asarray(seeds_aff[1]),
                         inf=np.asarray(seeds_aff[2]))
            except OSError:
                pass
    reps = n // nseed if n >= nseed else 1
    pts = tuple(
        jnp.tile(c, (1,) * (c.ndim - 1) + (reps,))[..., :n] for c in seeds_aff[:2]
    ) + (jnp.tile(seeds_aff[2], reps)[:n],)
    jax.block_until_ready(pts)
    setup_s = time.time() - t0

    def fetch(r):
        # force completion with a HOST transfer: through the axon tunnel,
        # block_until_ready alone does not reliably block on execution
        return [np.asarray(x) for x in r]

    # compile + correctness check in ONE pass: zeroing the scalars beyond
    # the checked prefix keeps the MAIN problem shape (zero digits land in
    # the dropped 0-bucket), so the oracle cross-check warms the exact
    # compile the timed runs reuse — no second small-shape MSM compile.
    t0 = time.time()
    if args.check:
        m = 1 << min(args.check, args.n)
        mask = (jnp.arange(n) < m).astype(k_limbs.dtype)
        got_pt = msm.msm_std(k_limbs * mask[None], pts, args.c,
                             args.window_chunk, args.block)
        fetch(got_pt)
        compile_and_first_s = time.time() - t0
        want = og.msm(
            ks[:m],
            decode_pts(tuple(c[..., :m] for c in pts[:2]) + (pts[2][:m],)),
        )
        got = decode_pts(gops.to_affine(got_pt))
        assert got == want, "MSM cross-check vs oracle FAILED"
    else:
        res = msm.msm_std(k_limbs, pts, args.c, args.window_chunk,
                          args.block)
        fetch(res)
        compile_and_first_s = time.time() - t0

    # timed runs (vary the scalars per iter so no caching layer can elide
    # the work; rotation keeps the set of digits identical in aggregate)
    iters = 3 if args.n >= 18 else 5
    t0 = time.time()
    outs = []
    for i in range(iters):
        kl = jnp.roll(k_limbs, i + 1, axis=-1)
        res = msm.msm_std(kl, pts, args.c, args.window_chunk, args.block)
        outs.append(fetch(res))
    per_run = (time.time() - t0) / iters
    del outs
    pps = n / per_run

    baseline_pps = _cpp_baseline_pps(args)
    from zikkurat_algebra_tpu.ops import msm as _msm_mod
    out = {
        "metric": f"{args.curve.lower().replace('-', '_')}_{grp}_msm_2e{args.n}_points_per_sec",
        "value": round(pps, 2),
        "unit": "points/s",
        "vs_baseline": round(pps / baseline_pps, 4) if baseline_pps else 0.0,
    }
    if _msm_mod.LAST_PATH:
        # effective MSM path of the traced run, so gated-off flags can't
        # be misread as measurements (ADVICE round-4)
        out["path"] = "+".join(
            f"{k}={v}" for k, v in sorted(_msm_mod.LAST_PATH.items())
        )
    _emit(out)
    print(
        f"# n=2^{args.n} backend={jax.devices()[0].platform} "
        f"setup={setup_s:.1f}s first={compile_and_first_s:.1f}s "
        f"run={per_run * 1e3:.1f}ms",
        file=sys.stderr,
    )


def bench_scaling(args, jax):
    """Multi-device scaling efficiency on the virtual CPU mesh: sharded
    MSM ops/s at mesh size 1 vs 8 (weak-scaling check of the parallel/
    layer; real multi-chip numbers await hardware).  Efficiency =
    (T_1device / T_8device) / 8 for the SAME total problem size."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from zikkurat_algebra_tpu import params as P
    from zikkurat_algebra_tpu.ops.curve import get_curves
    from zikkurat_algebra_tpu.ops.field import ints_to_limbs15
    from zikkurat_algebra_tpu.parallel.msm import sharded_msm

    ndev_all = len(jax.devices())
    assert ndev_all >= 8, "run with --cpu (8 virtual devices)"
    curve = P.CURVES[args.curve]
    ck = get_curves(curve)
    fr = ck.fr
    msm = ck.msm("g1")
    gops = ck.g1
    n = 1 << min(args.n, 13)

    rng = np.random.RandomState(7)
    ks = [int.from_bytes(rng.bytes(40), "little") % fr.p for _ in range(n)]
    k_limbs = jnp.asarray(ints_to_limbs15(ks, fr.L))
    G = gops.from_affine(ck.encode_g1([ck.oracle_g1.gen] * 256))
    seeds = gops.to_affine(gops.scalar_mul_fr_std(
        fr.encode(
            [int.from_bytes(rng.bytes(40), "little") % fr.p or 1
             for _ in range(256)],
            mont=False,
        ),
        G,
    ))
    reps = max(n // 256, 1)
    pts = tuple(
        jnp.tile(c, (1,) * (c.ndim - 1) + (reps,))[..., :n] for c in seeds[:2]
    ) + (jnp.tile(seeds[2], reps)[:n],)

    got1 = got8 = None
    times = {}
    for ndev in (1, 8):
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("data",))
        r = sharded_msm(msm, mesh, k_limbs, pts)     # compile + warm
        jax.block_until_ready(r)
        t0 = time.time()
        iters = 2
        for _ in range(iters):
            r = sharded_msm(msm, mesh, k_limbs, pts)
            jax.block_until_ready(r)
        times[ndev] = (time.time() - t0) / iters
        dec = ck.decode_g1(gops.to_affine(tuple(x[..., None] for x in r)))
        if ndev == 1:
            got1 = dec
        else:
            got8 = dec
    assert got1 == got8, "sharded MSM result differs across mesh sizes"
    eff = times[1] / times[8] / 8
    out = {
        "metric": f"{args.curve.lower().replace('-', '_')}_msm_2e{min(args.n, 13)}_scaling_eff_8dev",
        "value": round(eff, 4),
        "unit": "efficiency",
        "vs_baseline": 0.0,
    }
    _emit(out)
    print(f"# t1={times[1]*1e3:.0f}ms t8={times[8]*1e3:.0f}ms "
          f"speedup={times[1]/times[8]:.2f}x backend=cpu(virtual)",
          file=sys.stderr)


def bench_ntt(args, jax):
    """Fr NTT of size 2^n (BASELINE config 2; reference has no measured
    number — vs_baseline reports speedup over this host's single-core
    python-int oracle is meaningless, so 0.0 until the cpp NTT exists)."""
    import numpy as np
    import jax.numpy as jnp
    from zikkurat_algebra_tpu import params as P
    from zikkurat_algebra_tpu.ops.field import get_field
    from zikkurat_algebra_tpu.ops.ntt import get_domain

    curve = P.CURVES[args.curve]
    f = get_field(curve.fr)
    dom = get_domain(f, args.n)
    key = jax.random.PRNGKey(0)
    x = f.rnd(key, (dom.n,))

    def fetch(r):
        np.asarray(r.reshape(-1)[:4])

    t0 = time.time()
    y = dom.ntt(x)
    fetch(y)
    first = time.time() - t0
    iters = 5
    t0 = time.time()
    for i in range(iters):
        y = dom.ntt(jnp.roll(x, i + 1, axis=-1))
        fetch(y)
    per = (time.time() - t0) / iters
    out = {
        "metric": f"{args.curve.lower().replace('-', '_')}_fr_ntt_2e{args.n}_seconds",
        "value": round(per, 5),
        "unit": "s",
        "vs_baseline": 0.0,
    }
    _emit(out)
    print(f"# first={first:.1f}s per={per*1e3:.1f}ms backend={jax.devices()[0].platform}",
          file=sys.stderr)


def bench_kzg(args, jax):
    """KZG commit+open+verify roundtrip (BASELINE config 4 companion;
    mirrors examples/KZG.hs end-to-end)."""
    import random
    import numpy as np
    import jax.numpy as jnp
    from zikkurat_algebra_tpu import params as P
    from zikkurat_algebra_tpu.ops.curve import get_curves
    from zikkurat_algebra_tpu.protocols import kzg

    curve = P.CURVES[args.curve]
    ck = get_curves(curve)
    fr = ck.fr
    m = min(args.n, 14)
    rng = random.Random(7)
    t0 = time.time()
    setup = kzg.new_setup(curve, m, rng.randrange(2, fr.p))
    jax.tree_util.tree_map(np.asarray, setup.tau_g1)
    setup_s = time.time() - t0
    coeffs = fr.encode([rng.randrange(fr.p) for _ in range(1 << m)])
    x0 = fr.encode(rng.randrange(fr.p))

    # warmup (compile) pass, then steady-state timing
    com = kzg.commit_poly(setup, coeffs)
    [np.asarray(x) for x in com]
    t0 = time.time()
    com = kzg.commit_poly(setup, coeffs)
    [np.asarray(x) for x in com]
    commit_s = time.time() - t0
    y0, proof = kzg.opening_proof(setup, coeffs, x0)
    [np.asarray(x) for x in proof]
    t0 = time.time()
    y0, proof = kzg.opening_proof(setup, coeffs, x0)
    [np.asarray(x) for x in proof]
    open_s = time.time() - t0
    ok = bool(kzg.verify_proof(setup, com, proof, x0, y0))
    t0 = time.time()
    ok = bool(kzg.verify_proof(setup, com, proof, x0, y0))
    verify_s = time.time() - t0
    assert ok, "KZG verify rejected an honest proof"
    out = {
        "metric": f"{args.curve.lower().replace('-', '_')}_kzg_2e{m}_commit_seconds",
        "value": round(commit_s, 4),
        "unit": "s",
        "vs_baseline": 0.0,
    }
    _emit(out)
    print(f"# setup={setup_s:.1f}s commit={commit_s:.2f}s open={open_s:.2f}s "
          f"verify={verify_s:.2f}s backend={jax.devices()[0].platform}",
          file=sys.stderr)


def bench_pairing(args, jax):
    """Batched optimal-Ate pairings/sec (BASELINE config 5: Fp12 tower,
    Miller loop + final exponentiation).  The batch axis is free
    parallelism on TPU — the reference computes one pairing per call, so
    vs_baseline = (TPU batched pairings/s) / (reference C pairings/s)."""
    import random
    import numpy as np
    import jax.numpy as jnp
    from zikkurat_algebra_tpu import params as P
    from zikkurat_algebra_tpu.ops.curve import get_curves
    from zikkurat_algebra_tpu.ops.pairing import get_pairing

    curve = P.CURVES[args.curve]
    ck = get_curves(curve)
    pk = get_pairing(curve)
    b = 1 << min(args.n, 12)         # pairing batch (--n 6 => 64)
    rng = random.Random(99)
    og1, og2 = ck.oracle_g1, ck.oracle_g2
    p1s = [og1.rnd(rng) for _ in range(min(b, 8))] * (max(b // 8, 1))
    q2s = [og2.rnd(rng) for _ in range(min(b, 8))] * (max(b // 8, 1))
    Pb = ck.encode_g1(p1s[:b])
    Qb = ck.encode_g2(q2s[:b])

    if args.check:
        want = pk.oracle.pairing(p1s[0], q2s[0])
        got = pk.tower.decode_fp12(pk.pairing(
            tuple(c[..., :1] for c in Pb), tuple(c[..., :1] for c in Qb)
        ))[0]
        assert got == want, "pairing cross-check vs oracle FAILED"

    def fetch(r):
        np.asarray(r.reshape(-1)[:4])

    out = pk.pairing(Pb, Qb)
    fetch(out)
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = pk.pairing(Pb, Qb)
        fetch(out)
    per = (time.time() - t0) / iters
    pps = b / per

    def measure():
        try:
            from zikkurat_algebra_tpu.utils.reference_ffi import (
                time_reference_pairing,
            )
            bl, _ = time_reference_pairing(args.curve)
            return bl, "reference C pairing (single-thread)"
        except Exception:
            return None

    baseline = _baseline_cache(f"{args.curve}_pairing", measure,
                               getattr(args, "remeasure_baseline", False))
    out = {
        "metric": f"{args.curve.lower().replace('-', '_')}_pairing_batch{b}_per_sec",
        "value": round(pps, 2),
        "unit": "pairings/s",
        "vs_baseline": round(pps / baseline, 4) if baseline else 0.0,
    }
    _emit(out)
    print(f"# batch={b} per_batch={per*1e3:.0f}ms backend={jax.devices()[0].platform}",
          file=sys.stderr)


def bench_fieldmul(args, jax):
    """Field muls/sec/chip (BASELINE metric 3) on Fr of the chosen curve.

    K dependent muls run inside ONE jit (lax.scan), so the ~28 ms launch
    latency is amortized to nothing and the number is the true sustained
    kernel throughput, not the dispatch floor."""
    import functools
    import numpy as np
    import jax.numpy as jnp
    from jax import lax
    from zikkurat_algebra_tpu import params as P
    from zikkurat_algebra_tpu.ops.field import get_field

    curve = P.CURVES[args.curve]
    f = get_field(curve.fr)
    n = 1 << args.n
    K = 64
    a = f.rnd(jax.random.PRNGKey(0), (n,))
    b = f.rnd(jax.random.PRNGKey(1), (n,))

    @jax.jit
    def chain(c, b):
        def body(c, _):
            return f._mul_impl(c, b), None

        c, _ = lax.scan(body, c, None, length=K)
        return c

    def fetch(r):
        np.asarray(r[:, :4])

    c = chain(a, b)
    fetch(c)
    if args.check:
        # value check: chain == a * b^K mod p (python ints)
        av = f.decode(a[:, :2])
        bv = f.decode(b[:, :2])
        cv = f.decode(chain(a, b)[:, :2])
        for i in range(2):
            assert cv[i] == av[i] * pow(bv[i], K, f.p) % f.p, \
                "fieldmul chain cross-check FAILED"
    iters = 5
    t0 = time.time()
    c = a
    for _ in range(iters):
        c = chain(c, b)
    fetch(c)
    per = (time.time() - t0) / (iters * K)
    out = {
        "metric": f"{args.curve.lower().replace('-', '_')}_fr_mul_per_sec",
        "value": round(n / per, 1),
        "unit": "muls/s",
        "vs_baseline": 0.0,
    }
    _emit(out)
    print(f"# batch=2^{args.n} chain K={K} per_mul={per*1e6:.0f}us "
          f"backend={jax.devices()[0].platform}", file=sys.stderr)


def _cpp_baseline_pps(args):
    """CPU baseline points/s (cached in bench_data/baselines.json):
    prefer the REFERENCE's own compiled C (scripts/build_reference.sh),
    fall back to cpp/build/msm_bench.  G2 uses the cpp baseline directly
    (the reference FFI exposes G1 only)."""
    grp = getattr(args, "group", "g1")
    key = f"{args.curve}_{grp}_msm_2e{args.n}"

    def measure():
        exe = os.path.join(REPO, "cpp", "build", "msm_bench")
        if grp != "g1":
            if not os.path.exists(exe):
                return None
            try:
                out = subprocess.run(
                    [exe, str(min(args.n, 16)), "--g2"],
                    capture_output=True, text=True, timeout=1200,
                )
                pps = float(json.loads(
                    out.stdout.strip().splitlines()[-1])["points_per_sec"])
                return pps, "cpp G2 Jacobian (OpenMP)"
            except Exception:
                return None
        if args.n <= 18:
            try:
                from zikkurat_algebra_tpu.utils.reference_ffi import (
                    time_reference_msm,
                )
                pps, _ = time_reference_msm(args.curve, args.n)
                return pps, "reference C (single-thread)"
            except Exception:
                pass
        if args.curve != "BLS12-381" or not os.path.exists(exe):
            # the cpp stand-in implements BLS12-381 G1 only — do not
            # mislabel it as a baseline for other curves
            return None
        try:
            out = subprocess.run(
                [exe, str(args.n)], capture_output=True, text=True,
                timeout=600,
            )
            return (
                float(json.loads(
                    out.stdout.strip().splitlines()[-1])["points_per_sec"]),
                "cpp stand-in (OpenMP)",
            )
        except Exception:
            return None

    return _baseline_cache(key, measure,
                           getattr(args, "remeasure_baseline", False))


if __name__ == "__main__":
    main()
