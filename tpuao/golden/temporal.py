"""Golden NumPy spec for temporal AO accumulation (reprojection resolve).

The reference (keijiro/MiniEngineAO) is a single-frame effect -- it has no
temporal component (SURVEY.md SS1: per-frame command-buffer replay, no
history state).  This module is a BEYOND-REFERENCE capability for the
sequence/streaming/serving surfaces: an exponential history accumulator with
camera reprojection and depth-based disocclusion rejection, the standard
production follow-on to any noisy screen-space estimator.  Like every other
stage (SURVEY.md SS5.1), the slow, obviously-correct NumPy implementation
here IS the spec; the JAX implementation in ``tpuao/ops/temporal.py`` must
match it to <= 1e-3 max-abs-err (measured ~1e-6).

Conventions fixed by this spec
------------------------------

* Depth fields are *normalized linear eye depth* ``z_eye / far`` in (0, 1]
  -- the pipeline's post-linearize representation (golden/reference.py),
  NOT hardware depth.  Camera intrinsics (``tan_half_fov_h``, ``far``) are
  assumed constant across the sequence; only the camera *pose* moves.
* Eye space is the utils/camera.py convention: the camera sits at the
  origin looking down **+z**, ``x = +right`` (increasing column),
  ``y = +up`` (DEcreasing row -- row 0 is the top of the frame).  The
  vertical half-fov tangent is ``tan_half_fov_v = tan_half_fov_h * H / W``
  (square pixels).
* ``motion`` is the row-major 4x4 rigid transform taking CURRENT-frame eye
  coordinates to PREVIOUS-frame eye coordinates::

      p_prev = motion @ [x_curr, y_curr, z_curr, 1]

  i.e. ``motion = view_prev @ inv(view_curr)`` for world->eye view
  matrices (helper: ``tpuao.utils.camera.relative_motion``).  ``None``
  means a static camera (identity reprojection, gather-free).
* Pixel (i, j) has continuous image coordinates (i + 0.5, j + 0.5);
  reprojected history is sampled bilinearly at the continuous coordinate.
  Samples reprojecting outside the frame, behind the camera, or onto a
  surface whose stored depth disagrees with the reprojected depth
  (disocclusion) lose history confidence and fall back to the current
  frame's AO.

Resolve (the spec)
------------------

::

    z'        = (motion @ eye(i, j, depth)).z            (reprojected eye z)
    (i', j')  = project(motion @ eye(i, j, depth))       (prev pixel coords)
    hist      = bilinear(prev_ao,    i', j')
    d_hist    = bilinear(prev_depth, i', j')
    rel_err   = |d_hist - z'/far| / max(z'/far, 1e-6)
    conf      = clip(1 - rel_err / depth_tolerance, 0, 1)   (soft rejection)
    valid     = [z' > 0] * [-0.5 <= i' <= H-0.5] * [-0.5 <= j' <= W-0.5]
                * [|i'-i| <= R] * [|j'-j| <= R]     (if max_displacement=R)
    alpha     = history_weight * valid * conf
    hist      = clip(hist, min3x3(curr_ao), max3x3(curr_ao))   (if clamping)
    out       = alpha * hist + (1 - alpha) * curr_ao

The neighborhood clamp (``neighborhood_clamp=True``, the default) bounds
history to the 3x3 min/max envelope of the current frame's AO -- the
standard anti-ghosting measure for occlusion changes that depth agreement
cannot catch (an occluder moving *near* a static receiver changes the
receiver's AO without changing its depth).

``max_displacement=R`` (default 4) additionally invalidates history that
reprojects more than R pixels away from its output pixel.  Semantically a
motion clamp (fast pans drop history one frame early); structurally it is
what makes the TPU implementation gather-free: with displacements bounded
by R, the bilinear gather is EXACTLY a sum of (2R+2)^2 statically-shifted
windows weighted by per-pixel tent functions (ops/temporal.py), the same
shifted-slice pattern as the render stencil -- measured ~400x faster than
XLA's dynamic gather on TPU at 1080p.  ``max_displacement=None`` keeps
the unbounded gather (offline/arbitrary motion).

A fresh sequence starts from the null history ``(ao=1, depth=NULL_DEPTH)``:
the depth mismatch drives ``conf`` to 0 everywhere, so frame 0 resolves to
exactly its own single-frame AO with no special-casing (the scan-friendly
initialization used by ``tpuao.ops.temporal.initial_state``).
"""

from __future__ import annotations

import numpy as np

from tpuao.params import GoldenCameraParams, GoldenTemporalParams

__all__ = [
    "NULL_DEPTH",
    "eye_rays",
    "reproject_coords",
    "bilinear_sample",
    "neighborhood_bounds",
    "temporal_resolve_golden",
    "render_sequence_golden",
]

# Null-history depth sentinel: any real normalized depth is <= 1, so the
# relative depth error vs NULL_DEPTH saturates confidence to 0 for every
# in-range depth_tolerance -- frame 0 of a sequence keeps no history.
NULL_DEPTH = 1.0e6


def eye_rays(h: int, w: int, tan_half_fov_h: float):
    """Per-pixel eye-space ray slopes ``(xr, yr)``: ``x_eye = xr * z_eye``,
    ``y_eye = yr * z_eye`` at the pixel center (see module conventions)."""
    tan_v = tan_half_fov_h * h / w
    u = (2.0 * (np.arange(w, dtype=np.float64) + 0.5) / w) - 1.0
    v = 1.0 - 2.0 * (np.arange(h, dtype=np.float64) + 0.5) / h
    xr = np.broadcast_to(u[None, :] * tan_half_fov_h, (h, w))
    yr = np.broadcast_to(v[:, None] * tan_v, (h, w))
    return xr, yr


def reproject_coords(depth: np.ndarray, camera: GoldenCameraParams,
                     motion: np.ndarray):
    """Continuous previous-frame pixel coords + reprojected depth.

    Returns ``(ip, jp, z_prev_norm, in_front)`` where (ip, jp) are the
    continuous row/col coordinates in the previous frame, ``z_prev_norm``
    is the reprojected normalized depth z'/far, and ``in_front`` flags
    ``z' > 0`` (points that stay in front of the previous camera).
    """
    depth = np.asarray(depth, dtype=np.float64)
    m = np.asarray(motion, dtype=np.float64)
    if m.shape != (4, 4):
        raise ValueError(f"motion must be 4x4, got {m.shape}")
    h, w = depth.shape
    tanh = float(camera.tan_half_fov_h)
    tan_v = tanh * h / w
    xr, yr = eye_rays(h, w, tanh)
    z = depth * float(camera.far)
    x, y = xr * z, yr * z
    xp = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3]
    yp = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
    zp = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3]
    in_front = zp > 0.0
    zs = np.where(in_front, zp, 1.0)  # keep the divide well-defined
    up = xp / (zs * tanh)
    vp = yp / (zs * tan_v)
    jp = (up + 1.0) * 0.5 * w - 0.5
    ip = (1.0 - vp) * 0.5 * h - 0.5
    return ip, jp, zp / float(camera.far), in_front


def bilinear_sample(field: np.ndarray, ip: np.ndarray, jp: np.ndarray):
    """Bilinear sample of (H, W) ``field`` at continuous coords (ip, jp).

    Coordinates are clipped to the valid square first -- out-of-bounds
    VALIDITY is the caller's concern (temporal_resolve_golden masks those
    texels to zero confidence); clipping merely keeps the taps in range.
    """
    field = np.asarray(field, dtype=np.float64)
    h, w = field.shape
    ip = np.clip(ip, 0.0, h - 1.0)
    jp = np.clip(jp, 0.0, w - 1.0)
    i0 = np.minimum(np.floor(ip).astype(np.int64), h - 2) if h > 1 else \
        np.zeros_like(ip, dtype=np.int64)
    j0 = np.minimum(np.floor(jp).astype(np.int64), w - 2) if w > 1 else \
        np.zeros_like(jp, dtype=np.int64)
    fi = ip - i0
    fj = jp - j0
    i1 = np.minimum(i0 + 1, h - 1)
    j1 = np.minimum(j0 + 1, w - 1)
    f00 = field[i0, j0]
    f01 = field[i0, j1]
    f10 = field[i1, j0]
    f11 = field[i1, j1]
    top = f00 * (1.0 - fj) + f01 * fj
    bot = f10 * (1.0 - fj) + f11 * fj
    return top * (1.0 - fi) + bot * fi


def neighborhood_bounds(ao: np.ndarray):
    """(min, max) over the edge-clamped 3x3 neighborhood of each texel."""
    ao = np.asarray(ao, dtype=np.float64)
    p = np.pad(ao, 1, mode="edge")
    h, w = ao.shape
    lo = np.full_like(ao, np.inf)
    hi = np.full_like(ao, -np.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            win = p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
            lo = np.minimum(lo, win)
            hi = np.maximum(hi, win)
    return lo, hi


def temporal_resolve_golden(
    curr_ao: np.ndarray,
    curr_depth: np.ndarray,
    prev_ao: np.ndarray,
    prev_depth: np.ndarray,
    camera: GoldenCameraParams,
    tparams: GoldenTemporalParams,
    motion: np.ndarray | None = None,
) -> np.ndarray:
    """One temporal resolve step (see module docstring for the spec).

    All four fields are (H, W); depths are normalized linear eye depth.
    Returns the resolved AO; the caller's next-frame history state is
    ``(resolved_ao, curr_depth)``.
    """
    curr_ao = np.asarray(curr_ao, dtype=np.float64)
    curr_depth = np.asarray(curr_depth, dtype=np.float64)
    prev_ao = np.asarray(prev_ao, dtype=np.float64)
    prev_depth = np.asarray(prev_depth, dtype=np.float64)
    h, w = curr_ao.shape

    if motion is None:
        hist = prev_ao
        d_hist = prev_depth
        expected = curr_depth
        valid = np.ones((h, w), dtype=np.float64)
    else:
        ip, jp, z_prev, in_front = reproject_coords(curr_depth, camera,
                                                    motion)
        hist = bilinear_sample(prev_ao, ip, jp)
        d_hist = bilinear_sample(prev_depth, ip, jp)
        expected = z_prev
        # validity over the frame RECTANGLE [-0.5, H-0.5] (edge texels
        # extend half a texel past their center; bilinear clamps there) --
        # a center-lattice [0, H-1] test would invalidate the frame's own
        # edge rows under identity motion from f.p. coordinate roundoff
        valid = (
            in_front
            & (ip >= -0.5) & (ip <= h - 0.5)
            & (jp >= -0.5) & (jp <= w - 0.5)
        )
        if tparams.max_displacement is not None:
            r = float(tparams.max_displacement)
            ii = np.arange(h, dtype=np.float64)[:, None]
            jj = np.arange(w, dtype=np.float64)[None, :]
            valid = valid & (np.abs(ip - ii) <= r) & (np.abs(jp - jj) <= r)
        valid = valid.astype(np.float64)

    rel_err = np.abs(d_hist - expected) / np.maximum(expected, 1e-6)
    conf = np.clip(1.0 - rel_err / float(tparams.depth_tolerance), 0.0, 1.0)
    alpha = float(tparams.history_weight) * valid * conf
    if tparams.neighborhood_clamp:
        lo, hi = neighborhood_bounds(curr_ao)
        hist = np.clip(hist, lo, hi)
    return alpha * hist + (1.0 - alpha) * curr_ao


def render_sequence_golden(
    depths,
    camera: GoldenCameraParams,
    params,
    tparams: GoldenTemporalParams,
    motions=None,
    normals=None,
):
    """Sequence oracle: per-frame golden pipeline + temporal resolve.

    ``depths`` is (T, H, W); ``motions`` is None (static camera) or
    (T, 4, 4) with ``motions[t]`` mapping frame t's eye space to frame
    t-1's (``motions[0]`` is ignored -- frame 0 has null history).
    Returns the (T, H, W) stack of resolved AO frames.
    """
    from tpuao.golden.reference import render_frame_golden

    depths = np.asarray(depths, dtype=np.float64)
    t_n, h, w = depths.shape
    prev_ao = np.ones((h, w), dtype=np.float64)
    prev_d = np.full((h, w), NULL_DEPTH, dtype=np.float64)
    out = np.zeros_like(depths)
    for t in range(t_n):
        nrm = None if normals is None else normals[t]
        ao = render_frame_golden(depths[t], camera, params, nrm)
        from tpuao.golden.reference import linearize_depth

        linz = linearize_depth(depths[t], camera)
        mot = None if motions is None or t == 0 else motions[t]
        res = temporal_resolve_golden(ao, linz, prev_ao, prev_d, camera,
                                      tparams, mot)
        out[t] = res
        prev_ao, prev_d = res, linz
    return out
