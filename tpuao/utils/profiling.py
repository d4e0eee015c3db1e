"""Timing / profiling utilities (SURVEY.md SS6 'Tracing / profiling').

The reference exposes per-dispatch timing through Unity's frame debugger;
here every pipeline stage runs under ``jax.named_scope`` (see
models/pipeline.py) so ``jax.profiler.trace`` captures a per-stage timeline
on hosts where the profiler works, and this module provides robust wall-clock
measurement that works even where it doesn't.

Measurement methodology (important on relayed/remote TPU backends like the
axon tunnel used in this environment):

* ``block_until_ready`` may return at *enqueue* time, not completion, so
  naive timing reads ~0.02 ms for any program.
* Host<->device transfers ride the tunnel (~35 MB/s measured), so timing a
  call that fetches the frame measures the network.

``device_time_ms`` therefore chains N invocations of the program on-device
inside one ``lax.fori_loop`` -- each iteration consumes the previous result
via a tiny data dependency and the loop ends in a scalar ``jnp.sum`` readback
(full reduction defeats dead-code/slice elimination) -- and returns
``(t_N - t_1) / (N - 1)``, which cancels the fixed round-trip latency.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


# chained-program executable cache: (fn identity, arg signature, opts)
# -> the jitted chain wrapper.  Without it every device_time_ms call
# builds a fresh ``chained`` closure, so even back-to-back timings of
# the SAME fn at the SAME shapes recompile (remote compiles cost
# 20-90 s through the axon relay -- r4's bench spent most of its driver
# window on duplicate chain compiles, VERDICT r4 item 1).
_CHAIN_CACHE: dict = {}


def _chain_cache_key(fn, args, opts):
    sig = tuple((tuple(getattr(a, "shape", ())),
                 str(getattr(a, "dtype", type(a).__name__)))
                for a in args)
    return (fn, sig,
            None if opts is None else tuple(sorted(opts.items())))


def device_time_ms(fn, *args, iters: int | None = None, repeats: int = 3,
                   return_min: bool = False, pixels: int | None = None,
                   use_normals: bool = False,
                   compiler_options: dict | None = None):
    """Median per-invocation device time of ``fn(*args)`` in milliseconds
    (``return_min=True`` -> ``(median, min)`` over the repeats).

    ``fn`` must map arrays -> array(s) and be jit-traceable.  The first
    argument must be a float array (it receives the cross-iteration
    perturbation; the perturbation is ``carry * 1e-20`` so results are
    numerically unchanged).

    ``iters=None`` auto-calibrates the chain length so each timed chain
    runs ~400 ms of device work.  The relay's round-trip jitter (measured
    up to +-15 ms) lands on both two-point samples and divides by
    ``iters - 1``; with the old fixed 40-iteration chain that left
    +-0.4 ms of noise on a 0.5 ms program -- short chains even produced
    negative estimates.  400 ms chains push the noise below ~0.05 ms.

    The chain length rides as a TRACED argument (the ``fori_loop`` bound
    lowers to one while loop serving every n): chain-1 baselines,
    calibration probes and the measurement chain all share ONE compiled
    executable.  The old static-argnums form compiled a separate
    program per distinct length -- 3+ remote compiles per call.
    """

    def chained(n, *a):
        def body(i, carry):
            out = fn(a[0] + carry * jnp.float32(1e-20), *a[1:])
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l) for l in leaves).astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    from tpuao.utils.xla_opts import tpu_compiler_options

    # frame-size-aware compiler options (the scoped-VMEM optimum flips
    # for 8K-class frames): infer pixels from the first argument's
    # trailing dims, which is the frame for every tpuao program;
    # ``pixels`` overrides (e.g. the fused-sections program wants the
    # SECTION working set, not the whole frame)
    if compiler_options is not None:
        # explicit override (the autotune sweep times the SAME program
        # under each candidate budget); dropped off-TPU, where the
        # xla_tpu_* flags are unknown to the compiler
        opts = compiler_options if jax.default_backend() == "tpu" else None
    else:
        if pixels is None:
            shape = getattr(args[0], "shape", ())
            if len(shape) >= 2:
                pixels = int(shape[-2]) * int(shape[-1])
        opts = tpu_compiler_options(pixels, use_normals)
    key = _chain_cache_key(fn, args, opts)
    compiled = _CHAIN_CACHE.get(key)
    if compiled is None:
        compiled = jax.jit(chained, compiler_options=opts)
        _CHAIN_CACHE[key] = compiled
    float(compiled(1, *args))
    if iters is None:
        # Two-point probes so the relay RTT cancels out of the estimate.
        # Relay hiccups are heavy-tailed (+100 ms spikes observed), so probe
        # twice and keep the SMALLER estimate: an overestimate would shorten
        # the chain and destroy the measurement, an underestimate only makes
        # it run longer.
        probe = 40
        ests = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(compiled(1, *args))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(compiled(probe, *args))
            tp = time.perf_counter() - t0
            ests.append((tp - t1) / (probe - 1) * 1e3)
        est_ms = max(min(ests), 1e-3)
        iters = int(np.clip(400.0 / est_ms, 100, 20000))
    iters = max(int(iters), 2)  # two-point cancellation needs iters >= 2
    float(compiled(iters, *args))
    samples = []
    for _ in range(repeats):
        # Baseline t1 is the MIN of two chain-1 calls: an RTT spike can
        # only ADD time, so min is the cleanest fixed-latency estimate.  A
        # spike on a single t1 would subtract from (tn - t1) and bias the
        # sample (and especially the reported min) LOW -- a 100 ms hiccup
        # undershoots a 0.35 ms program by ~25%.  Spikes on tn only
        # overestimate, which the median absorbs conservatively.
        t1s = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(compiled(1, *args))
            t1s.append(time.perf_counter() - t0)
        t1 = min(t1s)
        t0 = time.perf_counter()
        float(compiled(iters, *args))
        tn = time.perf_counter() - t0
        samples.append((tn - t1) / (iters - 1) * 1e3)
    if return_min:
        return float(np.median(samples)), float(np.min(samples))
    return float(np.median(samples))


def host_chain_time_ms(fn, *args, iters: int | None = None,
                       repeats: int = 3, return_min: bool = False,
                       max_in_flight: int | None = None):
    """Per-invocation time of a MULTI-LAUNCH host-driven program.

    ``device_time_ms`` chains iterations inside one ``lax.fori_loop``,
    which requires ``fn`` to be a single traceable program; the sections
    mode (parallel/sections.py) is by design a sequence of separate XLA
    launches.  Here the chain is driven from the host: iteration n+1
    consumes a scalar perturbation of iteration n's output (so the device
    must execute the launch sequences back to back), and the chain ends in
    a scalar readback whose ``float()`` forces completion through the
    relay.  Same two-point ``(t_N - t_1) / (N - 1)`` RTT cancellation and
    min-of-two-t1 baseline as ``device_time_ms``; per-launch host dispatch
    overhead is part of what this mode genuinely pays, so it is correctly
    included.

    ``max_in_flight`` bounds how far the host may run ahead of the device:
    dispatch allocates each iteration's output buffers immediately, so an
    unthrottled 8K chain queues gigabytes.  Every iteration records its
    chain scalar; once ``max_in_flight`` iterations are queued the host
    blocks on the scalar from that many iterations back -- the device
    keeps ``max_in_flight`` iterations of queued work while the host waits
    out the RTT, so the throttle adds no device idle unless the relay
    spikes longer than the queued work.  Default scales with frame size
    (smaller frames -> deeper queues).
    """
    x0 = jnp.asarray(args[0])
    if max_in_flight is None:
        frame_mb = x0.size * x0.dtype.itemsize / 1e6
        # ~2 GB of in-flight iterations, each holding a few frame-sized
        # buffers (outputs + concat + slices), capped to a sane range
        max_in_flight = int(np.clip(2000 / (6 * max(frame_mb, 1e-3)),
                                    4, 64))

    def chain(n):
        x = x0
        out = None
        pend = []
        for i in range(n):
            out = fn(x, *args[1:])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            x = x0 + s * jnp.float32(1e-20)
            try:  # start the tiny d->h transfer early: by the time the
                # throttle pops this scalar it has long arrived, so the
                # pop costs ~0 instead of a fresh relay round trip (a
                # blocking per-iteration RTT starved the device: measured
                # +19 ms/frame on the 8K monolithic cross-check)
                s.copy_to_host_async()
            except AttributeError:  # pragma: no cover - non-jax backends
                pass
            pend.append(s)
            if len(pend) > max_in_flight:
                float(pend.pop(0))
        return float(pend[-1])

    chain(1)  # warm all section compiles
    if iters is None:
        probe = 10
        ests = []
        for _ in range(2):
            t0 = time.perf_counter()
            chain(1)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            chain(probe)
            tp = time.perf_counter() - t0
            ests.append((tp - t1) / (probe - 1) * 1e3)
        est_ms = max(min(ests), 1e-3)
        iters = int(np.clip(400.0 / est_ms, 20, 5000))
    iters = max(int(iters), 2)
    chain(iters)
    samples = []
    for _ in range(repeats):
        t1 = min(_timed(chain, 1) for _ in range(2))
        tn = _timed(chain, iters)
        samples.append((tn - t1) / (iters - 1) * 1e3)
    if return_min:
        return float(np.median(samples)), float(np.min(samples))
    return float(np.median(samples))


def _timed(chain, n) -> float:
    t0 = time.perf_counter()
    chain(n)
    return time.perf_counter() - t0


def stage_times_ms(depth, camera, params, normals=None, impl: str = "jnp",
                   iters: int | None = None) -> dict[str, float]:
    """Per-stage wall-clock breakdown of the frame program (frame-debugger
    analog).  Returns {stage_name: ms}.

    ``iters=None`` (default) auto-calibrates each stage's chain to ~400 ms
    of device work -- sub-0.1 ms stages are pure noise with short fixed
    chains (the round-1 methodology bug; see device_time_ms).  When
    ``normals``/``params.use_normals`` are set, the render stages time the
    tangent-corrected estimator on the real per-level slope inputs.
    """
    from tpuao.models.pipeline import _pad_to_64
    from tpuao.models.pipeline import ao_pipeline
    from tpuao.ops import prepare as P
    from tpuao.ops import render as R
    from tpuao.ops import upsample as U
    from tpuao.params import padded_shape

    h0, w0 = depth.shape[-2:]
    hp, wp = padded_shape(h0, w0)
    d = params.hierarchy_depth
    use_n = normals is not None and params.use_normals
    out = {}

    def prep(x):
        linz = P.linearize_depth(_pad_to_64(x, hp, wp), camera)
        pyr = P.build_pyramid(linz, d)
        return tuple(pyr)

    out["prepare"] = device_time_ms(prep, depth, iters=iters)
    pyr = [jnp.asarray(x) for x in jax.jit(prep)(depth)]
    if use_n:
        spyr = R.slope_pyramid(jnp.asarray(normals, jnp.float32),
                               camera.tan_half_fov_h, hp, wp, d,
                               h0=h0, w0=w0)
    else:
        spyr = [None] * (d + 1)
    for l in range(1, d + 1):
        out[f"render_l{l}"] = device_time_ms(
            lambda x, s=spyr[l], l=l: R.render_ao_level(
                x, l, wp, camera, params, slopes_ds=s),
            pyr[l], iters=iters, use_normals=use_n)
    # chain steps are timed on the REAL chain inputs (render outputs /
    # previous-step combined AO), not synthetic uniforms: the bilateral
    # weights are data-dependent, so a random lo buffer measures a
    # statistically different program (VERDICT r2 weak-item 7)
    aos = {l: jnp.asarray(jax.jit(
        lambda x, s=spyr[l], l=l: R.render_ao_level(
            x, l, wp, camera, params, slopes_ds=s))(pyr[l]))
        for l in range(1, d + 1)}
    combined = aos[d]
    for l in range(d, 0, -1):
        if l != d:
            out[f"upsample_l{l}"] = device_time_ms(
                lambda a, lo_d, hi_d, lo2, l=l: U.blur_upsample_step(
                    a, lo_d, hi_d, params, wp, lo_ao2=lo2),
                combined, pyr[l], pyr[l - 1], aos[l], iters=iters)
        else:
            out[f"upsample_l{l}"] = device_time_ms(
                lambda a, lo_d, hi_d, l=l: U.blur_upsample_step(
                    a, lo_d, hi_d, params, wp),
                combined, pyr[l], pyr[l - 1], iters=iters)
        combined = jnp.asarray(jax.jit(
            lambda a, lo_d, hi_d, lo2, l=l: U.blur_upsample_step(
                a, lo_d, hi_d, params, wp, lo_ao2=lo2))(
            combined, pyr[l], pyr[l - 1],
            aos[l] if l != d else combined))
    out["full_pipeline"] = device_time_ms(
        lambda x: ao_pipeline(x, camera, params, normals, impl=impl)[0],
        depth, iters=iters, use_normals=use_n)
    return out
