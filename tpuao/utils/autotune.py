"""Scoped-VMEM budget autotuner.

The one compiler-level lever that moves tpuao programs is XLA's
``xla_tpu_scoped_vmem_limit_kib`` fusion budget (docs/PERF.md: every
other flag swept within noise).  ``utils.xla_opts.scoped_vmem_kib``
ships three hand-measured size classes (<=4K / 4K+normals / >16 Mpix),
derived at 720p/1080p/4K/8K; an unswept geometry (1440p, ultrawide,
multi-view batches) just inherits its class boundary.  This module
measures the optimum for an EXACT shape on the real device and registers
it as a per-shape override, with optional JSON persistence so a fleet
tunes once per (device kind, shape) and every process reuses it.

    from tpuao.utils import autotune
    best = autotune.tune_frame((1440, 2560))          # sweeps on-device
    autotune.save_tuned("autotune.json")              # persist
    autotune.load_tuned("autotune.json")              # next process

CLI: ``python -m tpuao tune 1440x2560 [--normals] [--save PATH]``.

Timing uses ``profiling.device_time_ms`` (on-device chained; the axon
relay makes naive timing measure the network), one compile per
candidate -- remote compiles run 20-90 s each, so the default ladder is
6 candidates around the measured class optima, not a dense grid.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from tpuao.utils import xla_opts
from tpuao.utils.profiling import device_time_ms

# MiB ladder bracketing every optimum measured so far (16-20 for the
# >16 Mpix class, 32 for 4K+normals, 48 for the small-frame class; 64
# guards the top).  KiB values, matching the XLA flag's unit.
DEFAULT_CANDIDATES_KIB = (16384, 20480, 24576, 32768, 49152, 65536)


def sweep_vmem(fn, *args, candidates=DEFAULT_CANDIDATES_KIB,
               timer=None, iters=None, shape_key=None) -> dict[int, float]:
    """Time ``fn(*args)`` under each scoped-VMEM budget; {kib: ms}.

    ``timer`` defaults to ``device_time_ms``, which compiles ``fn`` once
    per candidate with the budget as an explicit compiler option.  A
    timer without a ``compiler_options`` parameter (``host_chain_time_ms``
    for multi-launch section programs) cannot receive the flag that way;
    pass ``shape_key=(padded_pixels, use_normals)`` and each candidate is
    applied through the per-shape override table
    (``xla_opts.set_tuned_vmem``) instead -- ``fn`` must then resolve its
    budget per call, as ``render_frame`` / ``render_frame_sections`` do.
    The pre-sweep override is restored afterwards (the sweep must not
    leave the LAST candidate registered; ``tune_frame`` applies the best
    one explicitly).

    Off-TPU the flag is unknown to the compiler and the timer drops it
    -- the sweep then measures one program N times, which is harmless
    but meaningless; callers should gate on backend for real tuning.
    """
    import inspect

    timer = timer or device_time_ms
    accepts_opts = ("compiler_options"
                    in inspect.signature(timer).parameters)
    if not accepts_opts and shape_key is None:
        raise ValueError(
            f"timer {getattr(timer, '__name__', timer)!r} has no "
            "compiler_options parameter; pass shape_key=(padded_pixels, "
            "use_normals) so candidates apply via xla_opts.set_tuned_vmem")
    if shape_key is not None:
        px, un = int(shape_key[0]), bool(shape_key[1])
        prior = xla_opts._TUNED.get((px, un))
    out = {}
    try:
        for kib in candidates:
            kw = {"iters": iters}
            if accepts_opts:
                kw["compiler_options"] = {
                    "xla_tpu_scoped_vmem_limit_kib": str(kib)}
            if shape_key is not None:
                xla_opts.set_tuned_vmem(px, un, kib)
            out[int(kib)] = float(timer(fn, *args, **kw))
    finally:
        if shape_key is not None:
            if prior is None:
                xla_opts._TUNED.pop((px, un), None)
            else:
                xla_opts.set_tuned_vmem(px, un, prior)
    return out


def tune_frame(shape, camera=None, params=None, use_normals: bool = False,
               impl: str = "auto", candidates=DEFAULT_CANDIDATES_KIB,
               timer=None, iters=None, apply: bool = True) -> dict:
    """Sweep the full AO pipeline at ``shape`` = (H, W); returns
    ``{"pixels", "use_normals", "best_kib", "default_kib", "sweep_ms"}``.

    ``apply=True`` registers the winner as the process-wide override for
    this exact shape (``xla_opts.set_tuned_vmem``), so every subsequent
    ``render_frame`` / engine call at that shape compiles with it.
    """
    from tpuao.models.pipeline import ao_pipeline
    from tpuao.params import AOParams, CameraParams

    h, w = int(shape[0]), int(shape[1])
    camera = camera or CameraParams(depth_mode="linear")
    params = params or AOParams()
    if use_normals and not params.use_normals:
        params = params.replace(use_normals=True)

    rng = np.random.default_rng(0)
    depth = jnp.asarray(
        np.clip(rng.uniform(0.05, 1.0, size=(h, w)), 1e-3, 1.0),
        jnp.float32)
    if use_normals:
        n = np.zeros((h, w, 3), np.float32)
        n[..., 2] = 1.0
        normals = jnp.asarray(n)
        fn = jax.jit(lambda d, nn: ao_pipeline(
            d, camera, params, nn, impl=impl)[0])
        args = (depth, normals)
    else:
        fn = jax.jit(lambda d: ao_pipeline(
            d, camera, params, None, impl=impl)[0])
        args = (depth,)

    sweep = sweep_vmem(fn, *args, candidates=candidates, timer=timer,
                       iters=iters)
    best = min(sweep, key=sweep.get)
    result = {"pixels": h * w, "use_normals": bool(use_normals),
              "best_kib": int(best),
              "default_kib": xla_opts.scoped_vmem_kib(h * w, use_normals),
              "sweep_ms": {str(k): round(v, 4) for k, v in sweep.items()}}
    if apply:
        xla_opts.set_tuned_vmem(h * w, use_normals, best)
    return result


# -- persistence -------------------------------------------------------------

def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:  # pragma: no cover - no backend
        return "unknown"


def save_tuned(path: str) -> str:
    """Write the current override table to JSON (tagged with the device
    kind: a budget tuned on v5e is not evidence for v4/v6)."""
    entries = [{"pixels": px, "use_normals": un, "kib": kib}
               for (px, un), kib in sorted(xla_opts._TUNED.items())]
    with open(path, "w") as f:
        json.dump({"device_kind": _device_kind(), "entries": entries},
                  f, indent=2)
    return path


def load_tuned(path: str, strict_device: bool = True) -> int:
    """Load a saved override table; returns the number of entries applied.

    ``strict_device=True`` skips (with a warning-free return of 0) a file
    recorded on a different device kind instead of applying budgets that
    were never measured on this hardware.  A file with no ``device_kind``
    key (hand-written or legacy) loads like ``"unknown"`` -- silently
    dropping its entries would let a subsequent ``tune --save`` rewrite
    the file with only the fresh measurement (review r3).
    """
    with open(path) as f:
        data = json.load(f)
    if strict_device and data.get("device_kind") not in (
            _device_kind(), "unknown", None):
        return 0
    n = 0
    for e in data.get("entries", []):
        xla_opts.set_tuned_vmem(e["pixels"], e["use_normals"], e["kib"])
        n += 1
    return n
