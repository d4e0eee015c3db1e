"""Temporal AO resolve -- TPU implementation of golden/temporal.py.

Beyond-reference (the reference is a single-frame effect, SURVEY.md SS1):
exponential history accumulation with camera reprojection and depth-based
disocclusion rejection.  The spec (conventions, resolve formula, null-
history initialization) lives in ``tpuao/golden/temporal.py``; this module
must match it to <= 1e-3 (measured ~1e-6 in f32).

TPU-first notes
---------------

* The moving-camera path needs a *data-dependent* bilinear sample of the
  history fields (prev pixel coordinates vary per texel).  XLA's dynamic
  gather is catastrophic on TPU (measured ~50 ms for the 4-tap bilinear
  at 1080p -- ~400x the whole frame pipeline), so the DEFAULT path bounds
  the per-frame displacement (``tparams.max_displacement=R``) and
  evaluates the bilinear sample EXACTLY as a tent-weighted sum of
  (2R+2)^2 statically-shifted windows::

      out[i,j] = sum_{oy,ox} prev[i+oy, j+ox]
                 * max(0, 1-|ip-(i+oy)|) * max(0, 1-|jp-(j+ox)|)

  The tent products are nonzero only at the 4 enclosing taps, so this
  equals the gather wherever ``|displacement| <= R`` (validity masks the
  rest); every window is a static shifted slice of the edge-padded
  history -- the same VMEM-friendly stencil pattern as the AO render,
  fully fused by XLA, no gather HLO at all.  ``max_displacement=None``
  opts into the true ``jnp.take`` gather for unbounded motion (both
  history fields stacked into one (2, H*W) operand: 4 gathers, not 8).
* The static-camera path (``motion=None``) is gather-free: identity
  reprojection reads history in place, and the resolve is pure fused
  elementwise work (it adds ~0 cost on top of the frame pipeline).
* ``motion`` rides as a traced (4, 4) array: per-frame camera motion never
  recompiles.  ``motion=None`` vs a matrix is a static structural choice
  (it selects the gather-free program).
* All confidence/blend math is elementwise and fuses into the surrounding
  program; the 3x3 neighborhood clamp is 8 shifted-slice min/max ops (the
  same shifted-window pattern as the render stencil).
* ``temporal_resolve_l1`` is the measured moving-camera fast path
  (r5, docs/PERF.md 'Temporal resolve round 2'): the resolve applied to
  the LEVEL-1 combined AO before the final bilateral upsample lifts it --
  half-res history, ceil(R/2) window, +0.19 ms in-frame at 1080p vs the
  full-res form's +1.94.  Wired as ``resolve_level=1`` on every temporal
  driver (frame, scan, engine, fleet, serving sessions, CLI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "NULL_DEPTH",
    "initial_state",
    "temporal_resolve",
    "temporal_resolve_l1",
]

# Matches golden/temporal.py: any real normalized depth (<= 1) is rejected
# against this sentinel for every in-range depth_tolerance.
NULL_DEPTH = 1.0e6


def initial_state(h: int, w: int, dtype=jnp.float32):
    """Null history ``(ao=1, depth=NULL_DEPTH)``: frame 0 resolves to its
    own single-frame AO (zero confidence everywhere), no special-casing."""
    return (jnp.ones((h, w), dtype),
            jnp.full((h, w), NULL_DEPTH, dtype))


def _neighborhood_bounds(ao):
    """(min, max) over the edge-clamped 3x3 neighborhood (golden
    ``neighborhood_bounds``): pad + 9 shifted windows, fused by XLA."""
    h, w = ao.shape[-2:]
    p = jnp.pad(ao, [(0, 0)] * (ao.ndim - 2) + [(1, 1), (1, 1)],
                mode="edge")
    lo = ao
    hi = ao
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            win = p[..., 1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
            lo = jnp.minimum(lo, win)
            hi = jnp.maximum(hi, win)
    return lo, hi


def _reproject_coords(depth, camera, motion):
    """Traced mirror of golden ``reproject_coords`` (f32)."""
    h, w = depth.shape[-2:]
    tanh = camera.tan_half_fov_h
    tan_v = tanh * (h / w)
    far = camera.far
    u = (2.0 * (jnp.arange(w, dtype=jnp.float32) + 0.5) / w) - 1.0
    v = 1.0 - 2.0 * (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    z = depth * far
    x = (u[None, :] * tanh) * z
    y = (v[:, None] * tan_v) * z
    m = motion.astype(jnp.float32)
    xp = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3]
    yp = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
    zp = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3]
    in_front = zp > 0.0
    zs = jnp.where(in_front, zp, 1.0)
    jp = ((xp / (zs * tanh)) + 1.0) * (0.5 * w) - 0.5
    ip = (1.0 - (yp / (zs * tan_v))) * (0.5 * h) - 0.5
    return ip, jp, zp / far, in_front


def _mv_planes(mv):
    """(di, dj) planes from a motion-vector buffer: channel-last
    ``(H, W, 2)`` (the frameio/engine layout) or channel-first
    ``(2, H, W)`` (the DMA-friendlier layout, mirroring the normals
    fast path -- ops/prepare.slope_planes)."""
    mv = jnp.asarray(mv, jnp.float32)
    if mv.ndim != 3:
        raise ValueError(f"motion vectors must be rank 3, got {mv.shape}")
    if mv.shape[0] == 2 and mv.shape[-1] != 2:
        return mv[0], mv[1]
    if mv.shape[-1] == 2:
        return mv[..., 0], mv[..., 1]
    raise ValueError(
        f"motion vectors must be (H, W, 2) or (2, H, W), got {mv.shape}")


def _bilinear_gather2(ao, d, ip, jp):
    """Bilinear sample of BOTH history fields at continuous (ip, jp).

    Stacks (ao, depth) into one (2, H*W) operand so each tap is a single
    gather; returns ``(hist_ao, hist_depth)``.  Coordinate clipping matches
    golden ``bilinear_sample`` (validity is the caller's mask).
    """
    h, w = ao.shape[-2:]
    ip = jnp.clip(ip, 0.0, h - 1.0)
    jp = jnp.clip(jp, 0.0, w - 1.0)
    i0 = jnp.minimum(jnp.floor(ip), h - 2.0) if h > 1 else jnp.zeros_like(ip)
    j0 = jnp.minimum(jnp.floor(jp), w - 2.0) if w > 1 else jnp.zeros_like(jp)
    fi = ip - i0
    fj = jp - j0
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, h - 1)
    j1 = jnp.minimum(j0 + 1, w - 1)
    flat = jnp.stack([ao.reshape(-1), d.reshape(-1)])  # (2, H*W)

    def tap(ii, jj):
        return jnp.take(flat, ii * w + jj, axis=1)  # (2, H, W)

    f00 = tap(i0, j0)
    f01 = tap(i0, j1)
    f10 = tap(i1, j0)
    f11 = tap(i1, j1)
    top = f00 * (1.0 - fj) + f01 * fj
    bot = f10 * (1.0 - fj) + f11 * fj
    out = top * (1.0 - fi) + bot * fi
    return out[0], out[1]


def _bilinear_windowed2(ao, d, ip, jp, r: int, unroll: int = 1):
    """Gather-free bilinear sample of both history fields for bounded
    displacements (see module docstring): tent-weighted sum over the
    (2R+2)^2 shifted windows of the edge-padded fields.  Exact wherever
    ``|ip - i| <= r`` and ``|jp - j| <= r`` (incl. the frame-edge clamp:
    padded taps ARE the edge texels); garbage outside -- the caller's
    validity mask zeroes those texels.

    Structured as ONE ``lax.scan`` over the 2R+2 ROW offsets; each step
    dynamic-slices one row band of the padded (2, H+2p, W+2p) history
    stack and unrolls the 2R+2 COLUMN taps as static slices of that band.
    Measured alternatives (benchmarks/exp/temporal_windowed.py, 1080p):

      * fully unrolled (2R+2)^2 slices: fastest standalone at R=2 but
        breaks the toolchain -- ~10-min remote compiles, a 2.7 GB
        serialized executable at R=4 standalone (hard compile error),
        +6.9 ms in-frame when it did compile;
      * scan over ALL (2R+2)^2 offsets (one slice per step): compiles in
        seconds but streams the carry through HBM every step
        (~50 us/step == the 42 MB/step traffic model, R=4 ~5 ms);
      * THIS row-scan form: 10x fewer carry round-trips than the flat
        scan at the same compile friendliness.
    """
    h, w = ao.shape[-2:]
    di = ip - jnp.arange(h, dtype=jnp.float32)[:, None]
    dj = jp - jnp.arange(w, dtype=jnp.float32)[None, :]
    p = r + 1  # offsets span [-r, r+1]
    stack = jnp.stack([ao, d])
    sp = jnp.pad(stack, [(0, 0), (p, p), (p, p)], mode="edge")
    k = 2 * r + 2

    def body(acc, oy):
        band = jax.lax.dynamic_slice(sp, (0, p + oy, 0), (2, h, w + 2 * p))
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(di - oy.astype(jnp.float32)))
        inner = jnp.zeros_like(acc)
        for ox in range(-r, r + 2):
            t = ty * jnp.maximum(0.0, 1.0 - jnp.abs(dj - ox))
            inner = inner + t[None] * band[:, :, p + ox: p + ox + w]
        return acc + inner, None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(stack),
                          jnp.arange(-r, r + 2, dtype=jnp.int32),
                          unroll=unroll)
    return acc[0], acc[1]


def _use_windowed_kernel(impl: str, h: int, w: int) -> bool:
    """Route the windowed history resample to the Pallas VMEM-tile kernel?

    ``"auto"`` selects the kernel ON TPU -- the r5 on-chip measurement
    (docs/PERF.md 'Temporal resolve round 2', benchmarks/exp/
    temporal_probe3.py): standalone 0.89 vs 1.93 ms full-res / 0.112 vs
    0.193 l1 at 1080p, in-frame full-res 1.27 vs 2.22, parity ~8e-7 --
    the single-HBM-read tile beats the row-scan's per-step carry
    re-streaming.  This is the repo's FIRST kernel to beat XLA
    in-pipeline (six prior Pallas strategies lost; the difference here
    is the (2R+2)^2 re-read pattern XLA cannot fuse away).  Off-TPU,
    ``"auto"`` keeps the XLA form (interpret-mode Pallas is orders
    slower); ``"jnp"`` forces the XLA form everywhere; ``"pallas"``
    forces the kernel (interpret off-TPU).

    Size gate (``h``, ``w`` = the resolve-plane shape): XLA stack-
    allocates the kernel's whole 2-field output in scoped VMEM and the
    compile FAILS when it exceeds the scoped limit (r5 measurement; the
    kernel carries a 100 MB per-call raise, pallas_kernels.py).  Planes
    whose padded output exceeds ~90 MB -- full-res resolve above ~11.7
    Mpix, e.g. 8K -- fall back to the XLA scan under ``"auto"`` (8K's
    265 MB output can never fit the 128 MB physical VMEM).  8K streams
    should use ``resolve_level=1`` (66 MB half-res output, kernel path).
    Explicit ``"pallas"`` is never gated (tests drive small shapes)."""
    if impl == "pallas":
        return True
    if impl != "auto" or jax.default_backend() != "tpu":
        return False
    out_bytes = 2 * (-(-h // 16) * 16) * w * 4
    return out_bytes <= 90 * 1024 * 1024


def temporal_resolve(curr_ao, curr_depth, prev_ao, prev_depth, camera,
                     tparams, motion=None, impl: str = "auto"):
    """One temporal resolve step (spec: golden/temporal.py).

    All fields (H, W) f32; depths are normalized linear eye depth.  Returns
    the resolved AO; the caller's next history state is
    ``(resolved, curr_depth)``.  ``motion`` is a traced (4, 4) current->
    previous eye transform, a traced per-pixel MOTION-VECTOR buffer
    ((H, W, 2) or channel-first (2, H, W); pixel units, current->previous,
    row offset first -- the object-motion path, golden/temporal.py module
    conventions; disocclusion then tests history depth against the CURRENT
    depth), or None for the gather-free static-camera path.  The rank of
    ``motion`` is a static structural choice; its values are traced.
    The windowed history resample routes through the Pallas VMEM-tile
    kernel on TPU by default (``_use_windowed_kernel``: measured 2.2x the
    XLA row-offset scan at 1080p full-res); ``impl="jnp"`` forces the XLA
    scan form, ``"pallas"`` forces the kernel.
    """
    curr_ao = curr_ao.astype(jnp.float32)
    curr_depth = curr_depth.astype(jnp.float32)
    prev_ao = prev_ao.astype(jnp.float32)
    prev_depth = prev_depth.astype(jnp.float32)
    h, w = curr_ao.shape[-2:]

    if motion is None:
        hist, d_hist = prev_ao, prev_depth
        expected = curr_depth
        valid = 1.0
    else:
        mot = jnp.asarray(motion)
        if mot.ndim == 3:  # per-pixel motion vectors (module docstring)
            di, dj = _mv_planes(mot)
            ip = di + jnp.arange(h, dtype=jnp.float32)[:, None]
            jp = dj + jnp.arange(w, dtype=jnp.float32)[None, :]
            expected = curr_depth  # TAA depth agreement: no reprojected z
            valid = ((ip >= -0.5) & (ip <= h - 0.5)
                     & (jp >= -0.5) & (jp <= w - 0.5))
        else:
            ip, jp, z_prev, in_front = _reproject_coords(curr_depth,
                                                         camera, mot)
            expected = z_prev
            valid = (in_front
                     & (ip >= -0.5) & (ip <= h - 0.5)
                     & (jp >= -0.5) & (jp <= w - 0.5))
        r = tparams.max_displacement
        if r is None:
            hist, d_hist = _bilinear_gather2(prev_ao, prev_depth, ip, jp)
        elif _use_windowed_kernel(impl, *prev_ao.shape[-2:]):
            from tpuao.ops.pallas_kernels import windowed_resolve

            hist, d_hist = windowed_resolve(prev_ao, prev_depth, ip, jp,
                                            int(r))
        else:
            hist, d_hist = _bilinear_windowed2(prev_ao, prev_depth, ip, jp,
                                               int(r))
        if r is not None:
            rf = float(r)
            di = ip - jnp.arange(h, dtype=jnp.float32)[:, None]
            dj = jp - jnp.arange(w, dtype=jnp.float32)[None, :]
            valid = valid & (jnp.abs(di) <= rf) & (jnp.abs(dj) <= rf)
        valid = valid.astype(jnp.float32)

    rel_err = jnp.abs(d_hist - expected) / jnp.maximum(expected, 1e-6)
    conf = jnp.clip(1.0 - rel_err / tparams.depth_tolerance, 0.0, 1.0)
    alpha = tparams.history_weight * valid * conf
    if tparams.neighborhood_clamp:
        lo, hi = _neighborhood_bounds(curr_ao)
        hist = jnp.clip(hist, lo, hi)
    return alpha * hist + (1.0 - alpha) * curr_ao


def _reproject_coords_l1(depth_l1, h0: int, w0: int, camera, motion):
    """Traced mirror of golden ``reproject_coords_l1``: reprojection for
    the pick-one HALF-RES field of an (h0, w0) frame.  Half texel (i, j)
    holds full-res texel (2i, 2j), so its eye ray passes through full-res
    index coordinate (2i, 2j) of the TRUE frame.  Returns full-res-unit
    previous coords ``(ip_f, jp_f, z_prev_norm, in_front)``; the half-grid
    sample coordinate is ``ip_f / 2``."""
    h1, w1 = depth_l1.shape[-2:]
    tanh = camera.tan_half_fov_h
    tan_v = tanh * (h0 / w0)
    far = camera.far
    u = (2.0 * (2.0 * jnp.arange(w1, dtype=jnp.float32) + 0.5) / w0) - 1.0
    v = 1.0 - 2.0 * (2.0 * jnp.arange(h1, dtype=jnp.float32) + 0.5) / h0
    z = depth_l1 * far
    x = (u[None, :] * tanh) * z
    y = (v[:, None] * tan_v) * z
    m = motion.astype(jnp.float32)
    xp = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3]
    yp = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
    zp = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3]
    in_front = zp > 0.0
    zs = jnp.where(in_front, zp, 1.0)
    jp = ((xp / (zs * tanh)) + 1.0) * (0.5 * w0) - 0.5
    ip = (1.0 - (yp / (zs * tan_v))) * (0.5 * h0) - 0.5
    return ip, jp, zp / far, in_front


def temporal_resolve_l1(curr_ao1, curr_d1, prev_ao1, prev_d1, h0: int,
                        w0: int, camera, tparams, motion=None,
                        impl: str = "auto"):
    """Half-res temporal resolve (spec: golden ``temporal_resolve_l1_
    golden``): the resolve formula applied to the LEVEL-1 combined AO and
    depth-pyramid level 1 of an (h0, w0) frame, both cropped to the true
    half dims ``(ceil(h0/2), ceil(w0/2))``.

    ``max_displacement`` keeps its full-res-pixel meaning; the half-grid
    displacement is bounded by R/2, so the gather-free windowed sample
    needs only a ``ceil(R/2)`` tap radius on 1/4 of the texels --
    ~(2*ceil(R/2)+2)^2/4 vs (2R+2)^2 of the full-res resolve's window work
    (R=4: 36 taps on quarter texels vs 100 on full, ~11x less window
    work).  The full-res frame is produced by lifting the resolved field
    through the final bilateral upsample the pipeline already pays for
    (models/pipeline.py ``resolve_level=1``).
    """
    curr_ao1 = curr_ao1.astype(jnp.float32)
    curr_d1 = curr_d1.astype(jnp.float32)
    prev_ao1 = prev_ao1.astype(jnp.float32)
    prev_d1 = prev_d1.astype(jnp.float32)
    h1, w1 = curr_ao1.shape[-2:]

    if motion is None:
        hist, d_hist = prev_ao1, prev_d1
        expected = curr_d1
        valid = 1.0
    else:
        mot = jnp.asarray(motion)
        if mot.ndim == 3:  # FULL-RES motion vectors: the retained texel
            # (i, j) holds full texel (2i, 2j), so its motion is the
            # pick-one sample of the full-res buffer (per-axis slices --
            # the 2-D strided slice lowers pathologically on TPU)
            di_f, dj_f = _mv_planes(mot)
            di1 = di_f[::2][:, ::2]
            dj1 = dj_f[::2][:, ::2]
            ip_f = di1 + 2.0 * jnp.arange(h1, dtype=jnp.float32)[:, None]
            jp_f = dj1 + 2.0 * jnp.arange(w1, dtype=jnp.float32)[None, :]
            expected = curr_d1  # TAA depth agreement: no reprojected z
            valid = ((ip_f >= -0.5) & (ip_f <= h0 - 0.5)
                     & (jp_f >= -0.5) & (jp_f <= w0 - 0.5))
        else:
            ip_f, jp_f, z_prev, in_front = _reproject_coords_l1(
                curr_d1, h0, w0, camera, mot)
            expected = z_prev
            valid = (in_front
                     & (ip_f >= -0.5) & (ip_f <= h0 - 0.5)
                     & (jp_f >= -0.5) & (jp_f <= w0 - 0.5))
        r = tparams.max_displacement
        ip_h, jp_h = ip_f * 0.5, jp_f * 0.5
        if r is None:
            hist, d_hist = _bilinear_gather2(prev_ao1, prev_d1, ip_h, jp_h)
        elif _use_windowed_kernel(impl, *prev_ao1.shape[-2:]):
            from tpuao.ops.pallas_kernels import windowed_resolve

            hist, d_hist = windowed_resolve(prev_ao1, prev_d1, ip_h, jp_h,
                                            -(-int(r) // 2))
        else:
            hist, d_hist = _bilinear_windowed2(prev_ao1, prev_d1, ip_h,
                                               jp_h, -(-int(r) // 2))
        if r is not None:
            rf = float(r)
            di = ip_f - 2.0 * jnp.arange(h1, dtype=jnp.float32)[:, None]
            dj = jp_f - 2.0 * jnp.arange(w1, dtype=jnp.float32)[None, :]
            valid = valid & (jnp.abs(di) <= rf) & (jnp.abs(dj) <= rf)
        valid = valid.astype(jnp.float32)

    rel_err = jnp.abs(d_hist - expected) / jnp.maximum(expected, 1e-6)
    conf = jnp.clip(1.0 - rel_err / tparams.depth_tolerance, 0.0, 1.0)
    alpha = tparams.history_weight * valid * conf
    if tparams.neighborhood_clamp:
        lo, hi = _neighborhood_bounds(curr_ao1)
        hist = jnp.clip(hist, lo, hi)
    return alpha * hist + (1.0 - alpha) * curr_ao1
