"""Single-chip sequential section execution for huge frames.

The frame is cut into ``k`` halo-overlapped row sections, each run
through the complete pipeline (as separate launches, or as one program
in the ``_fused`` variant), and the crops stitched back -- bounding peak
HBM at roughly one section instead of one frame while producing the
monolithic program's exact output.

PERF STATUS (measured, docs/PERF.md "Sequential sections", r3): this is
a MEMORY tool, not a speed tool.  On one v5e chip the monolithic 8K
program is faster than any section count in either execution form
(8.11 ms vs 10.25+ fused / 40+ separate-launch on the axon relay, which
charges ~3.3 ms per extra program launch).  The r2 hypothesis that
sections would recover the 4K-class efficiency regime was falsified:
full-width row sections run at or below whole-frame per-pixel rates.
Use the monolithic path for speed, this mode when a frame (plus temps)
must not be resident at once; it also validated the spatial mode's
band+halo semantics bit-exactly on real TPU hardware.

Unlike ``parallel/spatial.py`` (whose bands edge-replicate a halo at the
frame top/bottom, making the result equal to the HALO-padded-frame
program), boundary sections here simply INCLUDE the real frame edge, so
the stitched result equals the monolithic single-chip program on the same
frame (asserted in tests/test_sections.py; agreement is <= 1 ULP rather
than bitwise -- XLA's FMA contraction can differ between the section and
monolithic executables).  The construction:

* the frame is edge-padded to ``ha`` = the next multiple of ``64 * k``
  (all pad rows replicate the last real row, so they carry the same values
  as the monolithic program's own 64-alignment pad -- the exact clamp
  target inside the pad region is then irrelevant);
* section starts are 64-aligned, which keeps every pyramid level's
  pick-one grid and the 4x4 deinterleave parity aligned with the global
  frame;
* the halo (``stencil_halo_rows(params)`` by default) covers the full
  render + upsample-chain stencil reach, so every row kept by the crop is
  computed from identical input values as in the monolithic program.

Feature parity: normals / color / out_dtype thread through exactly like
``render_frame`` (slopes are pointwise, the composite is local).
``debug_outputs`` is intentionally not offered -- the debug pyramid is a
whole-frame inspection artifact; use the monolithic path for it.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from tpuao.models.pipeline import render_frame
from tpuao.ops.render import normals_channel_last
from tpuao.params import AOParams, CameraParams
from tpuao.parallel.spatial import edge_pad_rows, stencil_halo_rows


def section_plan(h: int, n_sections: int, halo: int):
    """Row bounds for ``n_sections`` halo-overlapped sections.

    Returns ``(aligned_h, band, [(start, stop, crop_off), ...])`` where the
    frame is first edge-padded to ``aligned_h`` (next multiple of
    ``64 * n_sections``), section ``i`` runs the pipeline on padded rows
    ``[start, stop)``, and its output rows ``[crop_off, crop_off + band)``
    are kept.  Boundary sections have one halo, interior sections two, so
    at most two distinct program shapes compile.
    """
    k = int(n_sections)
    assert k >= 1 and halo % 64 == 0, (k, halo)
    mult = 64 * k
    ha = -(-h // mult) * mult
    band = ha // k
    plan = []
    for i in range(k):
        a = max(0, i * band - halo)
        b = min(ha, (i + 1) * band + halo)
        plan.append((a, b, i * band - a))
    return ha, band, plan


def _row_slice(x, a: int, b: int, axis: int):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(a, b)
    return x[tuple(idx)]


def render_frame_sections_fused(depth, camera=None, params=None,
                                n_sections: int = 2,
                                halo_rows: int | None = None,
                                impl: str = "auto"):
    """The section decomposition as ONE jitted program (single launch).

    Measured on the axon-relayed TPU, every extra program launch costs
    ~6-10 ms of relay overhead (benchmarks/exp/sections_8k.py
    ``methodology_delta_ms``), which buries the separate-launch mode's
    per-section efficiency win at 8K scale.  This variant keeps the exact
    same decomposition -- identical bounds, crops and monolithic-equality
    argument as ``render_frame_sections`` -- but executes it inside one
    XLA program: the two boundary sections run as one ``lax.map`` over a
    2-stack, the k-2 interior sections as a second ``lax.map``, so the
    compiler sizes buffers and fusions for a SECTION (the whole pipeline
    is the band body; cross-stage fusion is intact inside each band --
    this is NOT the stage-level in-program banding that lost 3-for-3,
    docs/PERF.md '8K').

    Depth-only (the timing-critical big-frame path); use
    ``render_frame_sections`` for normals/color parity.
    """
    camera = camera or CameraParams()
    params = params or AOParams()
    if halo_rows is None:
        halo_rows = stencil_halo_rows(params)
    h0 = depth.shape[-2]
    assert depth.ndim == 2, "fused sections take a single (H, W) frame"
    k = int(n_sections)
    ha, band, plan = section_plan(h0, k, halo_rows)
    # the uniform-shape lax.map stacks require unclamped section bounds;
    # a clamped plan (band < halo) would silently keep the wrong crop
    # rows (caught in review r3) -- the separate-launch mode handles it
    assert k == 1 or band >= halo_rows, (
        f"band {band} < halo {halo_rows}: too many sections for this "
        f"frame height -- use fewer, or render_frame_sections")
    local_px = (band + 2 * halo_rows) * depth.shape[-1]
    depth = jnp.asarray(depth, jnp.float32)
    # resolve the scoped-VMEM budget per CALL and key the jit cache on it:
    # baking tpu_compiler_options into the cached entry would pin the
    # budget that was current at first call, invisibly ignoring later
    # per-shape overrides (autotune.load_tuned) for this geometry
    from tpuao.utils.xla_opts import tpu_compiler_options

    opts = tpu_compiler_options(local_px)
    kib = (int(opts["xla_tpu_scoped_vmem_limit_kib"])
           if opts is not None else None)
    return _sections_fused_jit(k, ha, band, halo_rows, impl, kib)(
        depth, camera, params)[..., :h0, :]


def sections_fused_fn(k: int, ha: int, band: int, halo: int, impl: str):
    """The traceable fused-sections program (depth, camera, params) -> ao.

    Separate from the jit wrapper so harnesses (device_time_ms, bench) can
    compose it under their own top-level jit -- compiler_options are only
    legal there.
    """
    from jax import lax

    from tpuao.models.pipeline import ao_pipeline

    assert k == 1 or band >= halo, (
        f"band {band} < halo {halo}: clamped plans need the "
        "separate-launch mode (see render_frame_sections_fused)")
    _, _, plan = section_plan(ha, k, halo)

    def fn(depth, camera, params):
        depth = edge_pad_rows(depth, ha, axis=-2)

        def body(sec):
            return ao_pipeline(sec, camera, params, None, impl=impl)[0]

        if k == 1:
            return body(depth)
        # boundary sections share one body shape: (band + halo, W)
        (a0, b0, _), (an, bn, _) = plan[0], plan[-1]
        bounds = lax.map(body, jnp.stack([depth[a0:b0], depth[an:bn]]))
        top, bot = bounds[0, :band], bounds[1, halo: halo + band]
        mids = []
        if k > 2:
            mid_in = jnp.stack([depth[a:b] for (a, b, _) in plan[1:-1]])
            mid = lax.map(body, mid_in)  # (k-2, band + 2*halo, W)
            mids = [mid[:, halo: halo + band].reshape(-1, mid.shape[-1])]
        return jnp.concatenate([top] + mids + [bot], axis=-2)

    return fn


@functools.lru_cache(maxsize=None)
def _sections_fused_jit(k: int, ha: int, band: int, halo: int, impl: str,
                        kib: int | None):
    import jax

    opts = (None if kib is None
            else {"xla_tpu_scoped_vmem_limit_kib": str(kib)})
    return jax.jit(sections_fused_fn(k, ha, band, halo, impl),
                   compiler_options=opts)


def render_frame_sections(depth, camera=None, params=None,
                          n_sections: int = 2, halo_rows: int | None = None,
                          impl: str = "auto", normals=None, color=None,
                          out_dtype: str = "float32"):
    """Render one (..., H, W) frame as ``n_sections`` sequential launches.

    Same contract as ``render_frame`` (minus ``debug_outputs``); the
    result equals the monolithic program's output on the same inputs (see
    module docstring).  Each section is a separate jitted launch whose
    compiled program is cached by shape, so a stream of frames pays the
    (at most two) section compiles once.
    """
    camera = camera or CameraParams()
    params = params or AOParams()
    if halo_rows is None:
        halo_rows = stencil_halo_rows(params)
    h0 = depth.shape[-2]
    ha, band, plan = section_plan(h0, n_sections, halo_rows)

    depth = edge_pad_rows(jnp.asarray(depth, jnp.float32), ha, axis=-2)
    if normals is not None:
        normals = edge_pad_rows(
            normals_channel_last(jnp.asarray(normals, jnp.float32)),
            ha, axis=-3)
    if color is not None:
        color = jnp.asarray(color)
        color_rows = -3 if color.ndim == depth.ndim + 1 else -2
        color = edge_pad_rows(color, ha, axis=color_rows)
    out_rows = -3 if (color is not None and color_rows == -3) else -2

    outs = []
    for (a, b, off) in plan:
        sec = render_frame(
            _row_slice(depth, a, b, -2), camera, params,
            normals=None if normals is None else _row_slice(normals, a, b,
                                                            -3),
            color=None if color is None else _row_slice(color, a, b,
                                                        color_rows),
            impl=impl, out_dtype=out_dtype)
        outs.append(_row_slice(sec, off, off + band, out_rows))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=out_rows)
    return _row_slice(out, 0, h0, out_rows)
