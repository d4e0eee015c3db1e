#!/usr/bin/env python
"""tpuao benchmark harness -- the [BJ] metric triple per config.

Runs the 5 BASELINE.json configs on the default backend (the real TPU chip
under the driver), each reporting ms/frame | Mpix/s | max-abs-err vs the
golden NumPy spec, writes the table to BENCH_DETAIL.json, and prints ONE
JSON line for the headline metric:

    1080p full 4-level hierarchical pipeline (config 2) ms/frame,
    vs_baseline = (1 ms north-star target) / measured  (>1 beats target).

Driver-proofing (VERDICT r3 item 1, recalibrated r5 after the driver
killed the r4 run at ~1000 s -- VERDICT r4 item 1):

  * the HEADLINE config runs FIRST and its JSON line is printed the moment
    it is measured (and again as the final line on a clean finish);
  * ALL FIVE [BJ] configs + the temporal row run before any diagnostic
    section (impl-compare, 3b, streaming, ladder, fleet) -- r4 spent its
    window on diagnostics while config 5 went unmeasured;
  * BENCH_BUDGET_S defaults to 850 s (under the driver's observed ~1000 s
    kill) and the watchdog hard deadline is BUDGET+120 s, so the clean
    bail path fires BEFORE the driver's kill;
  * BENCH_DETAIL.json is MERGED (per-key) after EVERY section: a killed
    or partial run updates the rows it measured and can never erase rows
    a previous complete run produced; the record carries ``complete``
    (this run finished with nothing skipped/errored) and
    ``inherited_keys`` (rows carried over from a prior record);
  * each section is independently try/excepted (one flaky compile cannot
    erase the others) and COST-AWARE budget-gated: a section is skipped
    when elapsed + its measured-cost estimate (``est_s``, from the r5 full
    run) would overrun BENCH_BUDGET_S -- not merely when it *starts* past
    the budget, which is how r4's 286 s impl-8K section was still
    mid-flight at the driver's kill (skips recorded in "skipped");
  * a watchdog thread hard-exits rc=0 -- after flushing the detail file and
    re-printing the headline -- if the total hard deadline passes or the
    relay goes silent mid-section (network rx bytes frozen for ~5 min = the
    CLAUDE.md outage signature; a normal slow remote compile keeps
    receiving bytes);
  * compile count per config is minimized: one AOT compile serves the
    accuracy output AND the roofline census, and device_time_ms's chain
    length is traced (utils/profiling.py), so a config pays 2 remote
    compiles instead of r4's ~5 (each 20-90 s through the relay -- this,
    not measurement time, dominated r4's 544 s config-2 section).

Accuracy (VERDICT r3 item 2 -- no more null err cells): frames >4 Mpix are
golden-checked on three deterministic 64-aligned 256x256 interior crops
with a 320 px halo, using render_frame_golden(full_width=frame_wp).  The
320 px halo is the pipeline's measured influence radius (same as
parallel/spatial.stencil_halo_rows at d=4): the crop check is bit-equal to
the full-frame golden (verified at 4K, diff 0.0; M=256 already leaks
6e-3).  BENCH_FULL_ERR=1 switches to the full-frame golden (~90 s at 4K,
~6 min at 8K of host NumPy) for the once-a-round full record.

Env knobs: BENCH_REPS overrides chain length; BENCH_BUDGET_S soft budget
(default 850 s), hard watchdog exit at +120 s; BENCH_FULL_ERR=1 full-frame
golden on >=4K; BENCH_FAST=1 legacy alias (sampled err, same as default);
BENCH_SMOKE=1 tiny shapes for plumbing validation off-TPU (writes
BENCH_SMOKE.json -- a smoke run must never merge garbage timings into the
real record).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpuao.golden import reference as G
from tpuao.models.pipeline import ao_pipeline, single_scale_ao
from tpuao.params import AOParams, CameraParams, padded_shape, to_golden
from tpuao.parallel.sharding import make_mesh
from tpuao.utils import fixtures as F

from tpuao.utils.profiling import device_time_ms
from tpuao.utils import roofline as RL


# on-device chain length; default auto-calibrates to ~400 ms chains (the
# relay's RTT jitter divides by the chain length -- see utils.profiling)
REPS = (int(os.environ["BENCH_REPS"])
        if os.environ.get("BENCH_REPS") else None)
FULL_ERR = os.environ.get("BENCH_FULL_ERR") == "1"
SMOKE = os.environ.get("BENCH_SMOKE") == "1"
# 850 s default: the driver's kill window is ~1000 s (it killed r4 at
# +975 s, rc=124) -- the budget gate and the +120 s hard watchdog must
# both fire BEFORE the kill so the run exits rc=0 with artifacts flushed
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "850"))
HARD_S = BUDGET_S + 120.0
BASELINE_MS = 1.0  # BASELINE.md north star: <1 ms/frame at 1080p on 1 chip

# shapes per config; SMOKE shrinks everything so the full harness plumbing
# can be validated on CPU in ~a minute (timings then mean nothing)
SHAPES = {
    "720p": (180, 320) if SMOKE else (720, 1280),
    "1080p": (270, 512) if SMOKE else (1080, 1920),
    "4k": (540, 1024) if SMOKE else (2160, 3840),
    "8k": (1080, 2048) if SMOKE else (4320, 7680),
}

T0 = time.monotonic()


def roofline(compiled, measured_ms, h, w, **traffic_kw):
    """Roofline floors for one config (VERDICT r1 item 6); flops from the
    compiled executable's own cost analysis, attainable floor + the
    full attribution record from its materialized-instruction census
    (VERDICT r2 item 7 / r3 item 3).  Takes the ALREADY-compiled
    executable (shared with the accuracy run) -- re-lowering here cost
    r4 one duplicate 20-90 s remote compile per config."""
    flops, trans = RL.cost_counts(compiled)
    out = RL.floors_ms(measured_ms, h, w, flops, trans,
                       census=RL.entry_census(compiled), **traffic_kw)
    out["hbm"] = RL.hbm_mb(compiled)  # deployment peak-HBM record
    return out


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
    print(f"[bench {time.strftime('%H:%M:%S')} "
          f"+{time.monotonic() - T0:5.0f}s] {msg}", file=sys.stderr,
          flush=True)


def time_ms(fn, *args, reps=REPS, use_normals=False):
    """Per-frame device time via on-device chaining (see utils.profiling:
    block_until_ready does not sync through the axon relay) + one real
    output for the accuracy check + the AOT executable (reused by the
    roofline census).  Returns (median_ms, min_ms, result, compiled)
    over >=3 measurement repeats (VERDICT r1 item 7).

    The AOT compile carries the SAME frame-size-aware compiler options
    device_time_ms applies to its chain (utils/xla_opts.py), so the
    census describes the program that was actually timed."""
    from tpuao.utils.xla_opts import tpu_compiler_options

    shape = getattr(args[0], "shape", ())
    pixels = (int(shape[-2]) * int(shape[-1])) if len(shape) >= 2 else None
    compiled = fn.lower(*args).compile(
        compiler_options=tpu_compiler_options(pixels, use_normals))
    med, mn = device_time_ms(fn, *args, iters=reps, repeats=5,
                             return_min=True, use_normals=use_normals)
    return med, mn, compiled(*args), compiled


def scene(h, w, with_normals=False):
    return F.spheres_on_plane(h, w, n_spheres=6, seed=11,
                              with_normals=with_normals)


# ---------------------------------------------------------------------------
# Harness: incremental results, budget gating, relay watchdog
# ---------------------------------------------------------------------------

class Harness:
    def __init__(self):
        self.lock = threading.Lock()
        self.results = {"backend": jax.default_backend(),
                        "device": str(jax.devices()[0]),
                        "smoke": SMOKE, "full_err": FULL_ERR,
                        "stray_processes": stray_processes(),
                        "skipped": [], "errors": {}, "configs": {},
                        "complete": False, "sections_run": [],
                        "section_s": {}}
        self.headline_ms = None
        self.headline_emitted_final = False
        self.section_name = None
        self.section_t0 = T0
        if self.results["stray_processes"]:
            print("WARNING: possible TPU-sharing processes: "
                  f"{self.results['stray_processes']}", file=sys.stderr)

    # -- persistence --------------------------------------------------------
    # smoke runs write elsewhere: their timings are meaningless and must
    # never merge into (or clobber) the real record
    DETAIL_PATH = "BENCH_SMOKE.json" if SMOKE else "BENCH_DETAIL.json"

    # keys that describe THIS run, never inherited from a prior record
    # (a stale 'bailed' or error list must not misdescribe a clean rerun)
    _RUN_KEYS = ("bailed", "skipped", "errors", "complete", "sections_run",
                 "section_s", "elapsed_s", "stray_processes",
                 "inherited_keys")

    def flush(self):
        """Merge this run's results into the detail file (VERDICT r4
        item 1c): per-key update, so a killed/partial run can never erase
        rows a complete run produced.  Measurement keys from the prior
        record survive unless this run re-measured them; they are listed
        in ``inherited_keys`` and the ``complete`` flag marks whether
        this run finished every section itself."""
        with self.lock:
            self.results["elapsed_s"] = round(time.monotonic() - T0, 1)
            try:
                with open(self.DETAIL_PATH) as f:
                    merged = json.load(f)
            except (OSError, ValueError):
                merged = {}
            for k in self._RUN_KEYS:
                merged.pop(k, None)
            for k, v in self.results.items():
                if k == "configs" and isinstance(merged.get(k), dict):
                    merged[k] = {**merged[k], **v}
                else:
                    merged[k] = v
            inherited = sorted(set(merged) - set(self.results))
            inherited += sorted(set(merged.get("configs", {}))
                                - set(self.results["configs"]))
            merged["inherited_keys"] = inherited
            tmp = self.DETAIL_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(merged, f, indent=2)
            os.replace(tmp, self.DETAIL_PATH)

    def emit_headline(self, note=None):
        if self.headline_ms is None:
            return False
        line = {"metric": "1080p_full_hierarchical_ao_ms_per_frame",
                "value": round(self.headline_ms, 4),
                "unit": "ms/frame",
                "vs_baseline": round(BASELINE_MS / self.headline_ms, 4)}
        print(json.dumps(line), flush=True)
        if note:
            print(f"[bench] headline emitted ({note})", file=sys.stderr,
                  flush=True)
        return True

    # -- sections -----------------------------------------------------------
    def section(self, name, fn, est_s=0.0):
        """Run one budget-gated, exception-isolated bench section.

        ``est_s`` is the section's measured cost from a full run (r5
        record's ``section_s``); the gate skips a section whose estimate
        would overrun BENCH_BUDGET_S, not just one that starts past it.
        r4's failure mode was exactly this: the 286 s impl-8K section
        *started* inside the budget and was still mid-flight at the
        driver's ~1000 s kill, turning the run into rc=124.
        """
        elapsed = time.monotonic() - T0
        if elapsed > BUDGET_S or elapsed + est_s > BUDGET_S:
            progress(f"SKIP {name}: elapsed {elapsed:.0f}s + est {est_s:.0f}s"
                     f" > BENCH_BUDGET_S={BUDGET_S:.0f}")
            self.results["skipped"].append(name)
            self.flush()
            return
        progress(name)
        self.section_name, self.section_t0 = name, time.monotonic()
        try:
            fn()
        except Exception as e:  # noqa: BLE001 -- one flake must not end the run
            import traceback

            self.results["errors"][name] = repr(e)
            traceback.print_exc()
        self.results["sections_run"].append(name)
        self.results["section_s"][name] = round(
            time.monotonic() - self.section_t0, 1)
        self.section_name = None
        self.flush()

    # -- watchdog -----------------------------------------------------------
    def watchdog(self):
        """Hard-exit (rc=0, artifacts flushed) on deadline or relay silence.

        Relay-outage signature per CLAUDE.md: the process blocks at ~0% CPU
        with no relay traffic at all (a normal slow remote compile keeps
        receiving bytes).  CLAUDE.md's rchar probe works from OUTSIDE the
        process; in-process, reading /proc/self/io would bump rchar itself,
        so the signal here is total network rx bytes instead (the relay is
        the only meaningful traffic in this container).  A section older
        than 8 min with ~5 min of zero rx is unrecoverable in-process --
        flush what we have and exit cleanly so the driver captures it.
        """
        def rx_bytes():
            try:
                total = 0
                with open("/proc/net/dev") as f:
                    for line in f.readlines()[2:]:
                        total += int(line.split(":")[1].split()[0])
                return total
            except (OSError, ValueError, IndexError):
                return -1

        hist = []
        while True:
            time.sleep(20)
            now = time.monotonic()
            hist.append(rx_bytes())
            hist = hist[-16:]
            frozen = (len(hist) >= 16 and len(set(hist[-16:])) == 1
                      and hist[-1] != -1)  # ~5 min of zero relay traffic
            stuck = (self.section_name is not None
                     and now - self.section_t0 > 480 and frozen)
            if now - T0 > HARD_S or stuck:
                why = ("hard deadline" if now - T0 > HARD_S else
                       f"relay silent in section '{self.section_name}'")
                self.results["bailed"] = why
                self.flush()
                self.emit_headline(note=f"watchdog bail: {why}")
                print(f"[bench] WATCHDOG BAIL: {why} after "
                      f"{now - T0:.0f}s -- partial results flushed",
                      file=sys.stderr, flush=True)
                os._exit(0)


# ---------------------------------------------------------------------------
# Accuracy: full-frame golden for <=1080p, bit-equal sampled crops above
# ---------------------------------------------------------------------------

CROP_S, CROP_M = 256, 320  # interior size / halo; bit-exact (module docstring)


def crop_origins(h, w, k=3):
    """k deterministic 64-aligned interior crop origins with CROP_M margin."""
    lo_r = (CROP_M + 63) // 64 * 64
    hi_r = (h - CROP_M - CROP_S) // 64 * 64
    lo_c = (CROP_M + 63) // 64 * 64
    hi_c = (w - CROP_M - CROP_S) // 64 * 64
    assert hi_r >= lo_r and hi_c >= lo_c, (h, w)
    outs = []
    for i in range(k):
        f = (i + 1) / (k + 1)
        r = (lo_r + int(f * (hi_r - lo_r))) // 64 * 64
        c = (lo_c + int((1 - f) * (hi_c - lo_c))) // 64 * 64
        outs.append((r, c))
    return outs


def golden_err_sampled(ao_dev, z, params, cam, normals=None):
    """max-abs-err vs golden on 3 interior crops (bit-equal to full-frame
    golden at halo 320 -- verified; fetches only ~0.8 MB through the relay
    instead of a full >=4K frame at ~35 MB/s)."""
    h, w = z.shape
    _, wp = padded_shape(h, w)
    gp, gc = to_golden(params, cam)
    worst = 0.0
    for r0, c0 in crop_origins(h, w):
        zc = z[r0 - CROP_M:r0 + CROP_S + CROP_M,
               c0 - CROP_M:c0 + CROP_S + CROP_M]
        nc = (None if normals is None else
              normals[r0 - CROP_M:r0 + CROP_S + CROP_M,
                      c0 - CROP_M:c0 + CROP_S + CROP_M])
        want = G.render_frame_golden(zc, gc, gp, normals=nc,
                                     full_width=wp)[CROP_M:CROP_M + CROP_S,
                                                    CROP_M:CROP_M + CROP_S]
        got = np.asarray(ao_dev[r0:r0 + CROP_S, c0:c0 + CROP_S], np.float64)
        worst = max(worst, float(np.abs(got - want).max()))
    return worst


def main():
    impl = os.environ.get("BENCH_IMPL", "auto")
    cam = CameraParams(depth_mode="linear")
    hz = Harness()
    results = hz.results
    results["impl"] = impl
    threading.Thread(target=hz.watchdog, daemon=True).start()
    S = SHAPES

    def golden_err(ao, z, params, normals=None):
        gp, gc = to_golden(params, cam)
        want = G.render_frame_golden(z, gc, gp, normals=normals)
        return float(np.abs(np.asarray(ao, np.float64) - want).max())

    def golden_err_big(ao, z, params, normals=None):
        """>=4K accuracy cell: sampled crops by default, full-frame golden
        under BENCH_FULL_ERR=1 (VERDICT r3 item 2: never null).  Frames too
        small for interior crops (SMOKE shapes) fall back to full-frame --
        cheap there by construction."""
        if FULL_ERR or min(z.shape) < 2 * CROP_M + CROP_S + 128:
            return golden_err(ao, z, params, normals)
        return golden_err_sampled(ao, z, params, cam, normals)

    # shared state across sections (each section owns its try/except)
    st = {}

    # ---- config 2 FIRST: full 4-level pipeline, 1080p (HEADLINE) ----------
    def sec_config2():
        z = scene(*S["1080p"])
        zd = jax.device_put(jnp.asarray(z, jnp.float32))
        p2 = AOParams()
        f2 = jax.jit(lambda d: ao_pipeline(d, cam, p2, None, impl=impl)[0])
        ms2, mn2, ao, c2 = time_ms(f2, zd)
        err2 = golden_err(ao, z, p2)
        results["configs"]["2_1080p_full"] = dict(
            ms=ms2, ms_min=mn2,
            mpix_s=(z.size / 1e6) / (ms2 / 1e3), max_abs_err=err2,
            roofline=roofline(c2, ms2, *S["1080p"]))
        st.update(z2=z, zd=zd, p2=p2, f2=f2, ms2=ms2)
        hz.headline_ms = ms2
        hz.flush()
        hz.emit_headline(note="after config 2, early")

    # ---- config 1: single-scale 1/2-res AO, 720p, no blur -----------------
    def sec_config1():
        z = scene(*S["720p"])
        zd = jax.device_put(jnp.asarray(z, jnp.float32))
        p1 = AOParams(hierarchy_depth=1, enable_blur=False)
        f1 = jax.jit(lambda d: single_scale_ao(d, cam, p1, impl=impl))
        ms, mn, ao, c1 = time_ms(f1, zd)
        gp, gc = to_golden(p1, cam)
        h, w = S["720p"]
        hp, wp = padded_shape(h, w)
        want = G.render_ao_level(G.downsample2x(
            np.pad(z, ((0, hp - h), (0, wp - w)), mode="edge")),
            1, wp, gc, gp)[:h // 2]
        err = float(np.abs(np.asarray(ao, np.float64) - want).max())
        results["configs"]["1_720p_single_scale"] = dict(
            ms=ms, ms_min=mn, mpix_s=(h * w / 1e6) / (ms / 1e3),
            max_abs_err=err,
            roofline=roofline(c1, ms, h, w, depth_levels=1,
                              enable_blur=False, single_scale=True))

    # ---- standing impl regression rows (VERDICT r2 item 5): the
    # "XLA beats Pallas" default is re-measured every bench run on the
    # headline config so a JAX/libtpu upgrade flipping the ranking is
    # caught, not assumed.  Cheap: config-2 inputs, short chains.
    def impl_compare(zd, p, key, base_ms):
        from tpuao.utils.xla_opts import BIG_FRAME_PIXELS, \
            tpu_compiler_options

        impl_ms = {impl: round(base_ms, 4)}
        px = int(zd.shape[-2]) * int(zd.shape[-1])
        for variant in ("auto", "pallas", "fused"):
            if variant in impl_ms:
                continue
            fv = jax.jit(lambda d, v=variant: ao_pipeline(
                d, cam, p, None, impl=v)[0])
            # the 8K size class's 20 MiB scoped-VMEM optimum is an
            # XLA-path tuning; the Pallas row-tile render's stack needs
            # ~37 MB at 8K (observed scoped-vmem OOM), so Pallas variants
            # on big frames run under the 48 MiB small-frame default
            opts = (tpu_compiler_options(None)
                    if variant != "auto" and px > BIG_FRAME_PIXELS
                    else None)
            try:
                impl_ms[variant] = round(device_time_ms(
                    fv, zd, iters=REPS, compiler_options=opts), 4)
            except Exception as e:  # noqa: BLE001 -- one variant OOMing
                # must not erase the others' rows
                impl_ms[variant] = f"error: {type(e).__name__}: " \
                                   f"{str(e)[:160]}"
        results[key] = impl_ms
        numeric = {k: v for k, v in impl_ms.items()
                   if isinstance(v, (int, float))}
        fastest = min(numeric, key=numeric.get)
        results[key + "_fastest"] = fastest
        if (fastest != "auto" and "auto" in numeric
                and numeric[fastest] < 0.9 * numeric["auto"]):
            print(f"NOTE: impl={fastest} beats auto by >10% at {key} "
                  f"({numeric[fastest]} vs {numeric['auto']} ms) -- the "
                  "default ranking has flipped; re-evaluate impl='auto'",
                  file=sys.stderr)

    def sec_impl1080():
        impl_compare(st["zd"], st["p2"], "impl_compare_1080p_ms",
                     st["ms2"])

    # ---- config 3: 1080p + normals + tunable sweep ------------------------
    def sec_config3():
        z, n = scene(*S["1080p"], with_normals=True)
        zd = jax.device_put(jnp.asarray(z, jnp.float32))
        nd = jax.device_put(jnp.asarray(n, jnp.float32))
        p3 = AOParams(use_normals=True)
        f3 = jax.jit(lambda d, nn, pp: ao_pipeline(d, cam, pp, nn,
                                                   impl=impl)[0])
        ms3, mn3, ao, c3 = time_ms(f3, zd, nd, p3, use_normals=True)
        err3 = golden_err(ao, z, p3, normals=n)
        # tunable sweep contract: varied params reuse the compiled program
        traces = 0

        def counted(d, nn, pp):
            nonlocal traces
            traces += 1
            return ao_pipeline(d, cam, pp, nn, impl=impl)[0]

        fc = jax.jit(counted)
        sweep = [p3.replace(strength=s, rejection_falloff=r,
                            blur_tolerance=b)
                 for s, r, b in ((0.5, 1.5, -7.0), (2.0, 5.0, -3.0),
                                 (4.0, 9.0, -1.5))]
        # ... and the swept settings are *timed*, not just run (VERDICT r1
        # item 7/8): same compiled program, so only the chain runs again.
        sweep_ms = [device_time_ms(fc, zd, nd, pp, iters=REPS,
                                   use_normals=True)
                    for pp in sweep]
        results["configs"]["3_1080p_normals_sweep"] = dict(
            ms=ms3, ms_min=mn3,
            mpix_s=(z.size / 1e6) / (ms3 / 1e3), max_abs_err=err3,
            roofline=roofline(c3, ms3, *S["1080p"], use_normals=True),
            sweep_settings=len(sweep), sweep_retraces=traces - 1,
            sweep_ms=[round(v, 4) for v in sweep_ms])
        st.update(zd3=zd, nd3=nd, p3=p3, f3=f3)

    # ---- config 3b: 4K + normals (VERDICT r2 item 9: record the normals
    # path's scaling before anyone deploys it at 4K) ------------------------
    def sec_config3b():
        z4n, n4 = scene(*S["4k"], with_normals=True)
        zd4n = jax.device_put(jnp.asarray(z4n, jnp.float32))
        nd4 = jax.device_put(jnp.asarray(n4, jnp.float32))
        p3, f3 = st["p3"], st["f3"]
        ms, mn, ao, c = time_ms(f3, zd4n, nd4, p3, use_normals=True)
        err = golden_err_big(ao, z4n, p3, normals=n4)
        # channel-first normals ABI row (VERDICT r4 item 4 hypothesis):
        # (3, H, W) slices channels as free major-dim views where the
        # (H, W, 3) ABI pays a minor-dim-3 relayout -- candidate for the
        # 1.0 ms dma census bucket at this config
        nd4cf = jax.device_put(jnp.asarray(
            np.ascontiguousarray(np.moveaxis(n4, -1, 0)), jnp.float32))
        ms_cf, _, ao_cf, _ = time_ms(f3, zd4n, nd4cf, p3, use_normals=True)
        cf_diff = None
        if not SMOKE:
            # outputs must be identical; compare one interior crop (the
            # relay moves ~35 MB/s -- never fetch two full 4K frames)
            a = np.asarray(ao[1024:1280, 1024:1280])
            b = np.asarray(ao_cf[1024:1280, 1024:1280])
            cf_diff = float(np.abs(a - b).max())
        results["configs"]["3b_4k_normals"] = dict(
            ms=ms, ms_min=mn,
            mpix_s=(z4n.size / 1e6) / (ms / 1e3), max_abs_err=err,
            err_mode="full" if FULL_ERR else "sampled_crops",
            ms_channel_first=round(ms_cf, 4),
            channel_first_crop_diff=cf_diff,
            roofline=roofline(c, ms, *S["4k"], use_normals=True))

    # ---- config 4: 4K single camera ---------------------------------------
    def sec_config4():
        z4 = scene(*S["4k"])
        zd4 = jax.device_put(jnp.asarray(z4, jnp.float32))
        f2, p2 = st["f2"], st["p2"]
        ms, mn, ao, c = time_ms(f2, zd4)
        err = golden_err_big(ao, z4, p2)
        results["configs"]["4_4k_full"] = dict(
            ms=ms, ms_min=mn,
            mpix_s=(z4.size / 1e6) / (ms / 1e3), max_abs_err=err,
            err_mode="full" if FULL_ERR else "sampled_crops",
            roofline=roofline(c, ms, *S["4k"]))

    # ---- config 4b: 8K single camera, single chip --------------------------
    # (VERDICT r1 item 2: used to OOM from the interleave's 64x layout
    # inflation; the layout-bounded interleave keeps temps ~2 frames.)
    def sec_config4b():
        z8 = scene(*S["8k"])
        zd8 = jax.device_put(jnp.asarray(z8, jnp.float32))
        f2, p2 = st["f2"], st["p2"]
        ms, mn, ao, c = time_ms(f2, zd8)
        err = golden_err_big(ao, z8, p2)
        results["configs"]["4b_8k_full"] = dict(
            ms=ms, ms_min=mn,
            mpix_s=(z8.size / 1e6) / (ms / 1e3), max_abs_err=err,
            err_mode="full" if FULL_ERR else "sampled_crops",
            roofline=roofline(c, ms, *S["8k"]))
        st.update(zd8=zd8, ms8=ms)

    # ---- standing 8K impl rows (VERDICT r3 item 4): the default's WEAKEST
    # geometry -- docs/PERF.md shows the standalone Pallas render already
    # winning at 8K level 1, so guard the ranking where it is most fragile.
    def sec_impl8k():
        impl_compare(st["zd8"], st["p2"], "impl_compare_8k_ms", st["ms8"])
        del st["zd8"]

    # ---- config 5: 8-view 1080p batch, view-sharded mesh ------------------
    def sec_config5():
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tpuao.parallel.sharding import VIEW_AXIS, sharded_views_fn

        n_dev = len(jax.devices())
        views = 8
        z2, p2 = st["z2"], st["p2"]
        zs = np.stack([z2] * views).astype(np.float32)
        # largest mesh that divides the view count (silent 1-chip fallback
        # on e.g. a 16-device host would mislabel single-chip perf)
        n_mesh = max(d for d in range(1, min(n_dev, views) + 1)
                     if views % d == 0)
        mesh = make_mesh(n_mesh)
        spec = NamedSharding(mesh, P(VIEW_AXIS, None, None))
        zsd = jax.device_put(zs, spec)
        sm = sharded_views_fn(cam, p2, mesh, impl=impl)
        f5 = jax.jit(lambda d: sm(d, None))
        ms5, mn5, ao5, _ = time_ms(f5, zsd)
        # accuracy record like every other row: the views are copies of one
        # scene, so golden-checking view 0 covers the sharded program (fetch
        # one view, not the whole batch -- the relay moves ~35 MB/s)
        err5 = golden_err(np.asarray(ao5[0]), zs[0], p2)
        results["configs"]["5_8view_1080p_sharded"] = dict(
            ms=ms5, ms_min=mn5, ms_per_view=ms5 / views,
            mpix_s=(views * z2.size / 1e6) / (ms5 / 1e3),
            max_abs_err=err5, mesh_devices=int(mesh.devices.size))
        st.update(f5=f5, zsd=zsd, views=views)

    # ---- streaming rates (host-driven launches): what a serving
    # deployment actually pays per frame.  Every row above chains
    # iterations ON-DEVICE, measuring pure compute; a real request
    # stream launches one program per frame (or per batch) and pays the
    # relay's per-launch dispatch on top (~3.3 ms here, the sections
    # experiment's launch tax).  Two host-chained rates -- one frame per
    # launch vs config 5's 8-view program per launch -- pin down that
    # tax and the measured value of micro-batching on this relay.
    def sec_streaming():
        from tpuao.utils.profiling import host_chain_time_ms

        ms_one = host_chain_time_ms(st["f2"], st["zd"], repeats=3)
        ms_b8 = host_chain_time_ms(st["f5"], st["zsd"], repeats=3)
        views = st["views"]
        results["streaming_1080p_host_launch"] = {
            "ms_per_frame_single": round(ms_one, 4),
            "ms_per_frame_batch8": round(ms_b8 / views, 4),
            "launch_overhead_ms": round(ms_one - st["ms2"], 4),
            "batch8_speedup": round(ms_one / (ms_b8 / views), 2),
        }


    # ---- quality ladder: presets at 1080p (reference QualityLevel analog).
    # Timing only -- preset math is golden-tested in pytest; zd/nd are the
    # config-3 1080p scene.
    def sec_ladder():
        from tpuao.models.presets import PRESETS

        ladder = {}
        for name, pp in PRESETS.items():
            fq = jax.jit(lambda d, nn, pp=pp: ao_pipeline(
                d, cam, pp, nn if pp.use_normals else None, impl=impl)[0])
            ladder[name] = round(device_time_ms(
                fq, st["zd3"], st["nd3"], iters=REPS,
                use_normals=pp.use_normals), 4)
        results["quality_ladder_1080p_ms"] = ladder


    # ---- temporal accumulation (beyond-reference; golden/temporal.py):
    # what the resolve adds to a 1080p frame.  Static camera is fused
    # elementwise (~free); moving camera uses the gather-free windowed
    # reprojection (default R=4; the true-gather alternative measured
    # ~47 ms at 1080p -- benchmarks/exp/temporal_cost.py); the scan row
    # shows the whole-sequence-as-one-program rate (zero per-frame
    # launches on a relay that charges ~3.3 ms each).
    def sec_temporal():
        from tpuao.models.pipeline import (
            _sequence_scan_core,
            _temporal_frame_core,
        )
        from tpuao.ops import temporal as TT
        from tpuao.params import TemporalParams

        zd, p2, ms2 = st["zd"], st["p2"], st["ms2"]
        h, w = zd.shape
        tp = TemporalParams()
        prev_ao, _ = TT.initial_state(h, w)
        prev_d = zd  # agreeing history: full-confidence blend path
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 0.05
        mo = jnp.asarray(m)

        def fstat(d):
            return _temporal_frame_core(d, prev_ao, prev_d, None, cam, p2,
                                        tp, None, None, impl, "float32")

        def fmove(d):
            return _temporal_frame_core(d, prev_ao, prev_d, mo, cam, p2,
                                        tp, None, None, impl, "float32")

        # level-1 (half-res) resolve: the moving-camera fast path
        # (VERDICT r4 item 2; golden render_frame_l1_temporal_golden)
        h1, w1 = -(-h // 2), -(-w // 2)
        prev1, _ = TT.initial_state(h1, w1)
        prev1_d = jnp.asarray(jnp.zeros((h1, w1), jnp.float32)) + 0.5

        def fmove_l1(d):
            return _temporal_frame_core(d, prev1, prev1_d, mo, cam, p2,
                                        tp, None, None, impl, "float32", 1)

        ms_s = device_time_ms(fstat, zd, iters=REPS)
        ms_m = device_time_ms(fmove, zd, iters=REPS)
        ms_l1 = device_time_ms(fmove_l1, zd, iters=REPS)
        t_n = 8
        depths = jnp.stack([zd] * t_n)
        motions = jnp.stack([mo] * t_n)
        ms_seq = device_time_ms(
            lambda ds: _sequence_scan_core(ds, motions, None, cam, p2, tp,
                                           impl, "float32"),
            depths, iters=REPS)
        ms_seq_l1 = device_time_ms(
            lambda ds: _sequence_scan_core(ds, motions, None, cam, p2, tp,
                                           impl, "float32",
                                           resolve_level=1),
            depths, iters=REPS)
        results["temporal_1080p"] = {
            "ms_frame_plus_resolve_static": round(ms_s, 4),
            "ms_frame_plus_resolve_windowed": round(ms_m, 4),
            "ms_frame_plus_resolve_l1_windowed": round(ms_l1, 4),
            "resolve_overhead_static_ms": round(ms_s - ms2, 4),
            "resolve_overhead_windowed_ms": round(ms_m - ms2, 4),
            "resolve_overhead_l1_windowed_ms": round(ms_l1 - ms2, 4),
            "max_displacement": tp.max_displacement,
            "scan8_ms_per_frame": round(ms_seq / t_n, 4),
            "scan8_l1_ms_per_frame": round(ms_seq_l1 / t_n, 4),
        }

    # ---- temporal fleet (VERDICT r4 item 6): 8 sequences x 8 frames in
    # ONE scan-of-scans program (parallel/sharding.py) on this host's
    # mesh -- the zero-collective fleet claim gets a measured ms/frame/view
    # next to the single-sequence scan row.  The (V, T, H, W) stack is
    # built ON-DEVICE from the resident 1080p frame (a host device_put of
    # 530 MB would take ~15 s through the 35 MB/s relay).
    def sec_fleet():
        from tpuao.parallel.sharding import (
            _temporal_sharded_core,
            make_mesh as _mk,
        )
        from tpuao.params import TemporalParams

        zd, p2 = st["zd"], st["p2"]
        v, t_n = 8, 8
        tp = TemporalParams()
        mesh = _mk()  # all local devices (1 on the real chip)
        depths = jnp.asarray(jnp.broadcast_to(zd, (v, t_n) + zd.shape))
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 0.05  # dollying cameras: the windowed-resolve fleet
        motions = jnp.asarray(np.broadcast_to(m, (v, t_n, 4, 4)))

        # the UN-jitted shard_map core: the public wrapper's internal jit
        # carries compiler_options, which jax forbids under the timing
        # chain's own top-level jit (nested-jit restriction)
        sm = _temporal_sharded_core(mesh, True, False, impl, "float32")

        def fleet(ds):
            return sm(ds, motions, None, cam, p2, tp)

        ms = device_time_ms(fleet, depths, iters=REPS)

        # the l1 (half-res resolve) fleet is the deployable moving-camera
        # configuration (CLAUDE.md r5 deploy guidance; scan8_l1 row) --
        # record it next to the full-res fleet so the record shows both
        sm1 = _temporal_sharded_core(mesh, True, False, impl, "float32", 1)

        def fleet_l1(ds):
            return sm1(ds, motions, None, cam, p2, tp)

        ms1 = device_time_ms(fleet_l1, depths, iters=REPS)
        results["temporal_fleet_8x8_1080p"] = {
            "ms_total": round(ms, 4),
            "ms_per_frame_view": round(ms / (v * t_n), 4),
            "ms_total_l1": round(ms1, 4),
            "ms_per_frame_view_l1": round(ms1 / (v * t_n), 4),
            "views": v, "frames": t_n,
            "mesh_devices": int(mesh.devices.size),
        }

    # ---- temporal resolve impl rows (VERDICT r4 item 3): the windowed
    # history resample routes to the Pallas VMEM-tile kernel (v3) on TPU
    # by default -- the repo's first in-pipeline Pallas win (r5 probe3:
    # 0.89 vs 1.93 ms standalone full-res).  Standing explicit
    # jnp-vs-pallas rows at both resolve levels guard that ranking + the
    # on-chip parity every bench run (a libtpu upgrade flipping either
    # direction shows up here).
    def sec_temporal_impl():
        from tpuao.ops import temporal as TT
        from tpuao.params import TemporalParams

        zd = st["zd"]
        h, w = zd.shape
        tp = TemporalParams()
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 0.05
        mo = jnp.asarray(m)
        rows = {}
        rng = np.random.default_rng(0)
        for level, tag in ((1, "l1"), (0, "fullres")):
            hs, ws = ((-(-h // 2), -(-w // 2)) if level else (h, w))
            ao = jnp.asarray(rng.uniform(0.2, 1, (hs, ws)
                                         ).astype(np.float32))
            d1 = jnp.asarray(rng.uniform(0.1, 0.9, (hs, ws)
                                         ).astype(np.float32))
            pa = jnp.asarray(rng.uniform(0.2, 1, (hs, ws)
                                         ).astype(np.float32))
            pd = d1 + 0.001
            outs = {}
            for impl_t in ("jnp", "pallas"):
                if level:
                    fn = (lambda a, b, c, e, i=impl_t:
                          TT.temporal_resolve_l1(a, b, c, e, h, w, cam,
                                                 tp, motion=mo, impl=i))
                else:
                    fn = (lambda a, b, c, e, i=impl_t:
                          TT.temporal_resolve(a, b, c, e, cam, tp,
                                              motion=mo, impl=i))
                ms = device_time_ms(lambda a: fn(a, d1, pa, pd), ao,
                                    pixels=h * w)
                # on-chip parity: fetch both outputs (l1 2 MB / fullres
                # 8 MB through the ~35 MB/s relay -- affordable here).
                # The parity program needs the SAME size-aware scoped-VMEM
                # options the timed chain ran under: a plain jit leaves
                # the default 16 MB limit and the kernel's 16.23 MB
                # full-res output OOMs the compile (observed twice r5).
                from tpuao.utils.xla_opts import tpu_compiler_options
                compiled = jax.jit(fn).lower(ao, d1, pa, pd).compile(
                    compiler_options=tpu_compiler_options(h * w))
                outs[impl_t] = np.asarray(compiled(ao, d1, pa, pd))
                rows[f"{tag}_{impl_t}"] = round(ms, 4)
            rows[f"{tag}_parity_max_abs"] = float(
                np.abs(outs["jnp"] - outs["pallas"]).max())
            if rows[f"{tag}_pallas"] > rows[f"{tag}_jnp"]:
                print(f"[bench] WARNING: temporal {tag} pallas "
                      "slower than the XLA row-scan -- the auto "
                      "default has flipped; re-evaluate "
                      "ops/temporal._use_windowed_kernel",
                      file=sys.stderr)
        results["temporal_resolve_impl_ms"] = rows

    # ---- temporal at 8K: the size-gate story on the record.  Full-res
    # resolve is gated to the XLA scan (the kernel's 265 MB output can
    # never stack-allocate -- docs/PERF.md r5); l1 resolve takes the
    # kernel path (66 MB under the per-call 100 MB raise).  The 8K input
    # is tiled on-device from the resident 1080p frame (a 132 MB
    # device_put costs ~4 s through the relay and content does not
    # matter for a timing row).
    def sec_temporal_8k():
        from tpuao.models.pipeline import _temporal_frame_core
        from tpuao.ops import temporal as TT
        from tpuao.params import TemporalParams

        z8 = jnp.tile(st["zd"], (4, 4))
        h, w = z8.shape
        p2 = st["p2"]
        tp = TemporalParams()
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 0.05
        mo = jnp.asarray(m)
        prev, _ = TT.initial_state(h, w)
        h1, w1 = -(-h // 2), -(-w // 2)
        prev1, _ = TT.initial_state(h1, w1)
        prev1_d = jnp.zeros((h1, w1), jnp.float32) + 0.5

        def fmove(d):
            return _temporal_frame_core(d, prev, d, mo, cam, p2, tp,
                                        None, None, impl, "float32")

        def fmove_l1(d):
            return _temporal_frame_core(d, prev1, prev1_d, mo, cam, p2,
                                        tp, None, None, impl, "float32", 1)

        ms_full = device_time_ms(fmove, z8, iters=REPS)
        ms_l1 = device_time_ms(fmove_l1, z8, iters=REPS)
        row = {"ms_frame_plus_resolve_fullres_gated": round(ms_full, 4),
               "ms_frame_plus_resolve_l1": round(ms_l1, 4)}
        if st.get("ms8"):
            row["resolve_overhead_fullres_ms"] = round(ms_full - st["ms8"], 4)
            row["resolve_overhead_l1_ms"] = round(ms_l1 - st["ms8"], 4)
        results["temporal_8k"] = row

    # run order (VERDICT r4 item 1a): every [BJ] config + the temporal row
    # FIRST, diagnostics after -- r4's driver window expired on impl rows
    # while config 5 went unmeasured
    # BENCH_ONLY="config 2,fleet" reruns just the named sections
    # (comma-separated case-insensitive substrings); the merge flush folds
    # their rows into the standing record.  A filtered run never claims
    # completeness and never marks unselected sections skipped.  Most
    # sections read config 2's cached state (st["zd"]/st["p2"]) -- include
    # "config 2" in the filter unless rerunning configs 1/3/4 alone.
    only = [s.strip().lower()
            for s in os.environ.get("BENCH_ONLY", "").split(",") if s.strip()]
    # est_s = measured section cost from the r5 full run (elapsed 1368 s
    # total); the gate skips a section whose estimate would overrun the
    # budget.  The 286 s impl-8K diagnostics run LAST for the same reason.
    for name, fn, est in (
            ("config 2: 1080p full (headline)", sec_config2, 110),
            ("config 1: 720p single-scale", sec_config1, 15),
            ("config 3: 1080p normals + sweep", sec_config3, 75),
            ("config 5: 8-view sharded batch", sec_config5, 90),
            ("config 4: 4K full", sec_config4, 25),
            ("config 4b: 8K full", sec_config4b, 45),
            ("temporal accumulation 1080p", sec_temporal, 155),
            # -- diagnostics below the [BJ] line --
            ("config 3b: 4K normals", sec_config3b, 90),
            ("impl regression rows 1080p (pallas/fused)", sec_impl1080, 45),
            ("temporal resolve impl rows", sec_temporal_impl, 85),
            ("streaming host-launch rates", sec_streaming, 50),
            ("temporal 8K levels", sec_temporal_8k, 100),
            ("temporal fleet 8x8", sec_fleet, 175),
            ("quality ladder", sec_ladder, 110),
            ("impl regression rows 8K", sec_impl8k, 290),
    ):
        if only and not any(s in name.lower() for s in only):
            continue
        hz.section(name, fn, est_s=est)

    results["complete"] = (not results["skipped"]
                           and not results["errors"] and not only)
    hz.flush()
    progress(f"done in {time.monotonic() - T0:.0f}s; "
             f"skipped={results['skipped']} errors={list(results['errors'])}")
    # final headline line (the driver parses the last JSON line on stdout;
    # the early emission after config 2 is the crash-safety copy)
    if not hz.emit_headline(note="final"):
        print("[bench] FATAL: headline config never completed",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
