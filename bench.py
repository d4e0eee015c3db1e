#!/usr/bin/env python
"""tpuao benchmark harness -- the [BJ] metric triple per config.

Runs the 5 BASELINE.json configs on the default backend (the real TPU chip
under the driver), each reporting ms/frame | Mpix/s | max-abs-err vs the
golden NumPy spec, writes the full table to BENCH_DETAIL.json, and prints
ONE JSON line for the headline metric:

    1080p full 4-level hierarchical pipeline (config 2) ms/frame,
    vs_baseline = (1 ms north-star target) / measured  (>1 beats target).

Env knobs: BENCH_FAST=1 skips the 4K golden error check (timing still runs);
BENCH_REPS overrides rep count.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from tpuao.golden import reference as G
from tpuao.models.pipeline import ao_pipeline, single_scale_ao
from tpuao.params import AOParams, CameraParams, to_golden
from tpuao.parallel.sharding import make_mesh
from tpuao.utils import fixtures as F

from tpuao.utils.profiling import device_time_ms
from tpuao.utils import roofline as RL


def roofline(fn_jitted, measured_ms, h, w, *args, **traffic_kw):
    """Roofline floors for one config (VERDICT r1 item 6); flops from the
    compiled executable's own cost analysis, attainable floor from its
    scheduled relayout bytes (VERDICT r2 item 7)."""
    compiled = fn_jitted.lower(*args).compile()
    flops, trans = RL.cost_counts(compiled)
    out = RL.floors_ms(measured_ms, h, w, flops, trans,
                       relayout=RL.relayout_bytes(compiled), **traffic_kw)
    out["hbm"] = RL.hbm_mb(compiled)  # deployment peak-HBM record
    return out

# on-device chain length; default auto-calibrates to ~400 ms chains (the
# relay's RTT jitter divides by the chain length -- see utils.profiling)
REPS = (int(os.environ["BENCH_REPS"])
        if os.environ.get("BENCH_REPS") else None)
FAST = os.environ.get("BENCH_FAST") == "1"
BASELINE_MS = 1.0  # BASELINE.md north star: <1 ms/frame at 1080p on 1 chip


def stray_processes() -> list[str]:
    """Other live python processes that might be sharing the TPU.

    A half-killed background bench silently corrupts both timing and
    device->host transfers (documented hazard, CLAUDE.md); surface any
    suspect process in the results so a polluted run is self-identifying.
    """
    import glob

    me = os.getpid()
    ancestors = set()
    pid = me
    for _ in range(16):  # walk up so the driver's own wrapper isn't flagged
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError):
            break
        ancestors.add(pid)
    found = []
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        pid = int(p.split("/")[2])
        if pid == me or pid in ancestors:
            continue
        try:
            with open(p, "rb") as f:
                argv = [a.decode(errors="replace")
                        for a in f.read().split(b"\0") if a]
        except OSError:
            continue
        # match only real python invocations -- the driver harness embeds
        # these filenames in its prompt text, so substring matching on the
        # whole cmdline false-positives on it
        if not argv or "python" not in os.path.basename(argv[0]):
            continue
        suspect = any(
            any(k in a for k in ("bench", "tpuao", "profile_stages"))
            for a in argv[1:3])
        if not suspect:
            # a leaked interactive/heredoc python holding a jax runtime
            # (observed: a stale `python -` with 5 GB RSS silently skewing
            # measurements) -- flag any big anonymous python
            try:
                with open(f"/proc/{pid}/statm") as f:
                    rss_mb = int(f.read().split()[1]) * 4096 / 1e6
            except (OSError, ValueError):
                rss_mb = 0
            suspect = argv[1:2] in (["-"], ["-c"]) and rss_mb > 500
        if suspect:
            found.append(f"{pid}: {' '.join(argv)[:120]}")
    return found


def progress(msg: str) -> None:
    """One stderr line per config so an outside observer can tell a slow
    remote compile (20-90 s each, occasionally a hang -- CLAUDE.md) from
    real progress; timestamped because the hang diagnosis is 'no new line
    for ~10 min'."""
    import sys
    import time

    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def time_ms(fn, *args, reps=REPS, use_normals=False):
    """Per-frame device time via on-device chaining (see utils.profiling:
    block_until_ready does not sync through the axon relay) + one real
    output for the accuracy check.  Returns (median_ms, min_ms, result)
    over >=3 measurement repeats (VERDICT r1 item 7)."""
    med, mn = device_time_ms(fn, *args, iters=reps, repeats=5,
                             return_min=True, use_normals=use_normals)
    return med, mn, fn(*args)


def scene(h, w, with_normals=False):
    return F.spheres_on_plane(h, w, n_spheres=6, seed=11,
                              with_normals=with_normals)


def main():
    impl = os.environ.get("BENCH_IMPL", "auto")
    cam = CameraParams(depth_mode="linear")
    strays = stray_processes()
    if strays:
        import sys

        print(f"WARNING: possible TPU-sharing processes: {strays}",
              file=sys.stderr)
    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0]), "impl": impl,
               "stray_processes": strays, "configs": {}}

    def golden_err(ao, z, params, normals=None):
        gp, gc = to_golden(params, cam)
        want = G.render_frame_golden(z, gc, gp, normals=normals)
        return float(np.abs(np.asarray(ao, np.float64) - want).max())

    progress("config 1: 720p single-scale")
    # ---- config 1: single-scale 1/2-res AO, 720p, no blur -----------------
    z = scene(720, 1280)
    zd = jax.device_put(jnp.asarray(z, jnp.float32))
    p1 = AOParams(hierarchy_depth=1, enable_blur=False)
    f1 = jax.jit(lambda d: single_scale_ao(d, cam, p1, impl=impl))
    ms, mn, ao = time_ms(f1, zd)
    gp, gc = to_golden(p1, cam)
    want = G.render_ao_level(G.downsample2x(
        np.pad(z, ((0, 48), (0, 0)), mode="edge")), 1, 1280, gc, gp)[:360]
    err = float(np.abs(np.asarray(ao, np.float64) - want).max())
    results["configs"]["1_720p_single_scale"] = dict(
        ms=ms, ms_min=mn, mpix_s=(1280 * 720 / 1e6) / (ms / 1e3),
        max_abs_err=err,
        roofline=roofline(f1, ms, 720, 1280, zd, depth_levels=1,
                          enable_blur=False, single_scale=True))

    progress("config 2: 1080p full (headline)")
    # ---- config 2: full 4-level pipeline, 1080p, depth-only (HEADLINE) ----
    z = scene(1080, 1920)
    zd = jax.device_put(jnp.asarray(z, jnp.float32))
    p2 = AOParams()
    f2 = jax.jit(lambda d: ao_pipeline(d, cam, p2, None, impl=impl)[0])
    ms2, mn2, ao = time_ms(f2, zd)
    err2 = golden_err(ao, z, p2)
    results["configs"]["2_1080p_full"] = dict(
        ms=ms2, ms_min=mn2, mpix_s=(1920 * 1080 / 1e6) / (ms2 / 1e3),
        max_abs_err=err2, roofline=roofline(f2, ms2, 1080, 1920, zd))

    progress("impl regression rows (pallas/fused)")
    # ---- standing impl regression rows (VERDICT r2 item 5): the
    # "XLA beats Pallas" default is re-measured every bench run on the
    # headline config so a JAX/libtpu upgrade flipping the ranking is
    # caught, not assumed.  Cheap: config-2 inputs, short chains.
    impl_ms = {impl: round(ms2, 4)}
    for variant in ("auto", "pallas", "fused"):
        if variant in impl_ms:
            continue
        fv = jax.jit(lambda d, v=variant: ao_pipeline(
            d, cam, p2, None, impl=v)[0])
        impl_ms[variant] = round(device_time_ms(fv, zd, iters=REPS), 4)
    fastest = min(impl_ms, key=impl_ms.get)
    results["impl_compare_1080p_ms"] = impl_ms
    results["fastest_impl"] = fastest
    if fastest != "auto" and impl_ms[fastest] < 0.9 * impl_ms["auto"]:
        import sys

        print(f"NOTE: impl={fastest} beats auto by >10% "
              f"({impl_ms[fastest]} vs {impl_ms['auto']} ms) -- the "
              "default ranking has flipped; re-evaluate impl='auto'",
              file=sys.stderr)

    progress("config 3: 1080p normals + sweep")
    # ---- config 3: 1080p + normals + tunable sweep ------------------------
    z, n = scene(1080, 1920, with_normals=True)
    zd = jax.device_put(jnp.asarray(z, jnp.float32))
    nd = jax.device_put(jnp.asarray(n, jnp.float32))
    p3 = AOParams(use_normals=True)
    f3 = jax.jit(lambda d, nn, pp: ao_pipeline(d, cam, pp, nn, impl=impl)[0])
    ms3, mn3, ao = time_ms(f3, zd, nd, p3, use_normals=True)
    err3 = golden_err(ao, z, p3, normals=n)
    # tunable sweep contract: varied params reuse the same compiled program
    traces = 0

    def counted(d, nn, pp):
        nonlocal traces
        traces += 1
        return ao_pipeline(d, cam, pp, nn, impl=impl)[0]

    fc = jax.jit(counted)
    sweep = [p3.replace(strength=s, rejection_falloff=r, blur_tolerance=b)
             for s, r, b in ((0.5, 1.5, -7.0), (2.0, 5.0, -3.0),
                             (4.0, 9.0, -1.5))]
    # ... and the swept settings are *timed*, not just run (VERDICT r1
    # item 7/8): same compiled program, so only the chain runs again.
    sweep_ms = [device_time_ms(fc, zd, nd, pp, iters=REPS,
                               use_normals=True)
                for pp in sweep]
    results["configs"]["3_1080p_normals_sweep"] = dict(
        ms=ms3, ms_min=mn3, mpix_s=(1920 * 1080 / 1e6) / (ms3 / 1e3),
        max_abs_err=err3,
        roofline=roofline(f3, ms3, 1080, 1920, zd, nd, p3,
                          use_normals=True),
        sweep_settings=len(sweep),
        sweep_retraces=traces - 1,
        sweep_ms=[round(v, 4) for v in sweep_ms])

    progress("config 3b: 4K normals")
    # ---- config 3b: 4K + normals (VERDICT r2 item 9: record the normals
    # path's scaling before anyone deploys it at 4K) ------------------------
    z4n, n4 = scene(2160, 3840, with_normals=True)
    zd4n = jax.device_put(jnp.asarray(z4n, jnp.float32))
    nd4 = jax.device_put(jnp.asarray(n4, jnp.float32))
    ms3b, mn3b, ao3b = time_ms(f3, zd4n, nd4, p3, use_normals=True)
    err3b = None if FAST else golden_err(ao3b, z4n, p3, normals=n4)
    results["configs"]["3b_4k_normals"] = dict(
        ms=ms3b, ms_min=mn3b, mpix_s=(3840 * 2160 / 1e6) / (ms3b / 1e3),
        max_abs_err=err3b,
        roofline=roofline(f3, ms3b, 2160, 3840, zd4n, nd4, p3,
                          use_normals=True))
    del zd4n, nd4, ao3b

    progress("config 4: 4K full")
    # ---- config 4: 4K single camera ---------------------------------------
    z4 = scene(2160, 3840)
    zd4 = jax.device_put(jnp.asarray(z4, jnp.float32))
    ms4, mn4, ao4 = time_ms(f2, zd4)
    err4 = None if FAST else golden_err(ao4, z4, p2)
    results["configs"]["4_4k_full"] = dict(
        ms=ms4, ms_min=mn4, mpix_s=(3840 * 2160 / 1e6) / (ms4 / 1e3),
        max_abs_err=err4, roofline=roofline(f2, ms4, 2160, 3840, zd4))

    progress("config 4b: 8K full")
    # ---- config 4b: 8K single camera, single chip --------------------------
    # (VERDICT r1 item 2: used to OOM from the interleave's 64x layout
    # inflation; the layout-bounded interleave keeps temps ~2 frames.)
    z8 = scene(4320, 7680)
    zd8 = jax.device_put(jnp.asarray(z8, jnp.float32))
    ms8, mn8, ao8 = time_ms(f2, zd8)
    err8 = None if FAST else golden_err(ao8, z8, p2)
    results["configs"]["4b_8k_full"] = dict(
        ms=ms8, ms_min=mn8, mpix_s=(7680 * 4320 / 1e6) / (ms8 / 1e3),
        max_abs_err=err8, roofline=roofline(f2, ms8, 4320, 7680, zd8))
    del zd8, ao8

    progress("config 5: 8-view sharded batch")
    # ---- config 5: 8-view 1080p batch, view-sharded mesh ------------------
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpuao.parallel.sharding import VIEW_AXIS, sharded_views_fn

    n_dev = len(jax.devices())
    views = 8
    zs = np.stack([scene(1080, 1920)] * views).astype(np.float32)
    # largest mesh that divides the view count (silent 1-chip fallback on
    # e.g. a 16-device host would mislabel single-chip perf as sharded)
    n_mesh = max(d for d in range(1, min(n_dev, views) + 1)
                 if views % d == 0)
    mesh = make_mesh(n_mesh)
    spec = NamedSharding(mesh, P(VIEW_AXIS, None, None))
    zsd = jax.device_put(zs, spec)
    sm = sharded_views_fn(cam, p2, mesh, impl=impl)
    f5 = jax.jit(lambda d: sm(d, None))
    ms5, mn5, ao5 = time_ms(f5, zsd)
    # accuracy record like every other row: the views are copies of one
    # scene, so golden-checking view 0 covers the sharded program (fetch
    # one 1080p view, not the whole batch -- the relay moves ~35 MB/s)
    err5 = golden_err(np.asarray(ao5[0]), zs[0], p2)
    results["configs"]["5_8view_1080p_sharded"] = dict(
        ms=ms5, ms_min=mn5, ms_per_view=ms5 / views,
        mpix_s=(views * 1920 * 1080 / 1e6) / (ms5 / 1e3),
        max_abs_err=err5, mesh_devices=int(mesh.devices.size))

    progress("streaming host-launch rates")
    # ---- streaming rates (host-driven launches): what a serving
    # deployment actually pays per frame.  Every row above chains
    # iterations ON-DEVICE, measuring pure compute; a real request
    # stream launches one program per frame (or per batch) and pays the
    # relay's per-launch dispatch on top (~3.3 ms here, the sections
    # experiment's launch tax).  Two host-chained rates -- one frame per
    # launch vs config 5's 8-view program per launch -- pin down that
    # tax and the measured value of micro-batching on this relay.
    from tpuao.utils.profiling import host_chain_time_ms

    ms_one = host_chain_time_ms(f2, zd, repeats=3)
    ms_b8 = host_chain_time_ms(f5, zsd, repeats=3)
    results["streaming_1080p_host_launch"] = {
        "ms_per_frame_single": round(ms_one, 4),
        "ms_per_frame_batch8": round(ms_b8 / views, 4),
        "launch_overhead_ms": round(ms_one - ms2, 4),
        "batch8_speedup": round(ms_one / (ms_b8 / views), 2),
    }

    progress("quality ladder")
    # ---- quality ladder: presets at 1080p (reference QualityLevel analog).
    # Timing only -- preset math is golden-tested in pytest; zd/nd are the
    # config-3 1080p scene.
    from tpuao.models.presets import PRESETS

    ladder = {}
    for name, pp in PRESETS.items():
        fq = jax.jit(lambda d, nn, pp=pp: ao_pipeline(
            d, cam, pp, nn if pp.use_normals else None, impl=impl)[0])
        ladder[name] = round(device_time_ms(fq, zd, nd, iters=REPS,
                                            use_normals=pp.use_normals), 4)
    results["quality_ladder_1080p_ms"] = ladder

    progress("writing BENCH_DETAIL.json")
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(results, f, indent=2)

    headline = {
        "metric": "1080p_full_hierarchical_ao_ms_per_frame",
        "value": round(ms2, 4),
        "unit": "ms/frame",
        "vs_baseline": round(BASELINE_MS / ms2, 4),
    }
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
