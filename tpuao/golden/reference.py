"""Golden NumPy reference for the full AO pipeline -- the executable spec.

``/root/reference`` was EMPTY at build time (SURVEY.md SS0), so per SURVEY.md
SS5.1 this slow, obviously-correct NumPy implementation of SS3.1-3.4 *is* the
reference the TPU pipeline must match to <= 1e-3 max-abs-err (BASELINE.md).
It intentionally avoids JAX: plain float64/float32 NumPy, explicit loops over
the sample-pair table, no fusion tricks.

Pipeline stages (names mirror the reference's dispatch DAG, SURVEY.md SS4.2):

  prepare   : linearize hardware depth -> LinearZ; pick-one downsample pyramid
              DS2x..DS16x; (the 4x4 deinterleave exists as an explicit op pair
              in tpuao.ops.prepare -- the AO math below is defined directly on
              the strided layout, which is bit-identical to computing on the
              16 deinterleaved slices with per-slice clamp-to-edge sampling;
              see pad_parity4.)
  render    : per-level hemisphere-occlusion estimate from the 12-entry
              mirrored sample-pair disc (SURVEY.md SS3.2).
  upsample  : depth-aware noise filter + bilateral 2x upsample chain
              1/16 -> 1/8 -> 1/4 -> 1/2 -> full (SURVEY.md SS3.3).
  composite : multiply AO into a color frame / debug view (SURVEY.md SS3.4).

Conventions fixed by this spec (documented because the reference mount was
empty and these choices are otherwise MED-confidence, SURVEY.md SS9):

  * arrays are (H, W) row-major, row 0 = top; depth is *normalized linear eye
    depth* z_eye/far in (0, 1] after linearization.
  * downsampling picks the (0,0) corner of each 2x2 (pick-one; preserves true
    depth values for the bilateral passes, SURVEY.md SS3.1).
  * out-of-bounds AO samples clamp to the edge *in slice space* (mod-4 parity
    preserving), matching per-slice texture clamping of the deinterleaved
    reference layout.
  * the pair test returns *visibility* in [0,1] (1 = unoccluded); final
    AO = clip(sum w_i * pairVis_i, 0, 1) ** strength, applied per level at
    render time (Strength plays upstream Accentuation's intensity role,
    SURVEY.md SS3.4).
  * normals (optional) are unit vectors in buffer view space: x = +column,
    y = +row, z = from surface toward camera (so a camera-facing wall is
    (0,0,1) and depth slope per texel is (nx/nz, ny/nz) * texel_world_size).
    The normals path evaluates the pair test against the tangent-plane
    expected depth instead of the center depth (SURVEY.md SS3.2 last bullet,
    [BJ] config 3).
"""

from __future__ import annotations

import numpy as np

from tpuao.params import (
    GoldenAOParams,
    GoldenCameraParams,
    build_pair_table,
    sphere_radius_coef,
    upsample_constants,
    padded_shape,
)

__all__ = [
    "linearize_depth",
    "downsample2x",
    "build_pyramid",
    "pad_parity4",
    "render_ao_level",
    "noise_filter",
    "bilateral_upsample2x",
    "blur_upsample_step",
    "render_frame_golden",
    "composite",
]


# ---------------------------------------------------------------------------
# Prepare (SURVEY.md SS3.1)
# ---------------------------------------------------------------------------

def linearize_depth(depth: np.ndarray, camera: GoldenCameraParams) -> np.ndarray:
    """Hardware depth -> normalized linear eye depth z_eye/far in (0,1].

    LinearZ(d) = 1 / (zmagic * d + 1), zmagic = (far - near) / near, for
    reversed-Z (d=1 at near plane).  For forward-Z the buffer is flipped
    first.  ``depth_mode=="linear"`` passes through unchanged.
    """
    depth = np.asarray(depth, dtype=np.float64)
    if camera.depth_mode == "linear":
        return depth
    zmagic = (camera.far - camera.near) / camera.near
    d = depth if camera.reversed_z else 1.0 - depth
    return 1.0 / (zmagic * d + 1.0)


def downsample2x(z: np.ndarray) -> np.ndarray:
    """Pick-one 2x downsample: the (0,0) corner of each 2x2 quad."""
    return z[0::2, 0::2]


def build_pyramid(linear_z: np.ndarray, depth_levels: int) -> list[np.ndarray]:
    """[LinearZ, DS2x, DS4x, ...]: index l = 1/2^l resolution."""
    pyr = [linear_z]
    for _ in range(depth_levels):
        pyr.append(downsample2x(pyr[-1]))
    return pyr


def pad_parity4(x: np.ndarray, pad: int) -> np.ndarray:
    """Pad by `pad` (multiple of 4) on all sides, preserving mod-4 parity.

    Equivalent to: deinterleave 4x4 -> clamp-to-edge pad each slice by pad/4
    -> re-interleave.  The apron tiles the first/last 4 rows/columns, so a
    strided (stride-4) sample that walks off the edge reads the edge texel of
    *its own slice*, exactly like per-slice GPU texture clamping.
    """
    assert pad % 4 == 0
    reps = pad // 4
    top = np.tile(x[:4, :], (reps, 1))
    bot = np.tile(x[-4:, :], (reps, 1))
    x = np.concatenate([top, x, bot], axis=0)
    left = np.tile(x[:, :4], (1, reps))
    right = np.tile(x[:, -4:], (1, reps))
    return np.concatenate([left, x, right], axis=1)


# ---------------------------------------------------------------------------
# Render (SURVEY.md SS3.2)
# ---------------------------------------------------------------------------

def _tangent_offset(normals: np.ndarray, ox: int, oy: int, texel_scale: float,
                    half_chord: float) -> np.ndarray:
    """Soft-clamped relative tangent-plane depth offset delta_z / z_c at
    texel offset (ox, oy).

    The raw planar prediction x = (nx*ox + ny*oy)/nz * texel_scale is passed
    through x * m^2 / (m^2 + x^2) with m = half the pair chord: moderate
    slopes get the full correction (x << m -> ~x), while grazing slopes fade
    the correction to zero so the estimator degrades to the depth-only pair
    rejection (a hard clamp instead shifts the expectation by up to a whole
    radius and makes co-planar samples read as occluders -- a black horizon
    band, found via the demo render)."""
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    nz = np.maximum(nz, 0.05)
    x = (nx * ox + ny * oy) / nz * texel_scale
    m2 = half_chord * half_chord
    return x * m2 / (m2 + x * x)


def render_ao_level(
    ds: np.ndarray,
    level: int,
    full_width: int,
    camera: GoldenCameraParams,
    params: GoldenAOParams,
    normals_ds: np.ndarray | None = None,
) -> np.ndarray:
    """AO estimate at one hierarchy level.

    ``ds`` is the 1/2^l linear-depth buffer; output has the same shape.
    Each disc offset (in slice texels) maps to a stride-4 offset in ``ds``
    (SURVEY.md SS3.1-3.2: deinterleaved slices sample +-1..4 slice texels
    == +-4..16 downsampled texels).

    Pair test (this spec's definition of the SS3.2 "to re-derive" unknown):

      r_i(z_c)      = radius_coef * T[i] * z_c          (world half-chord)
      disocc(z_s)   = 1 + (z_s - z_ref) / r_i(z_c)      in "visibility" units:
                      0 at the sphere's front face, 1 at the center plane,
                      >1 behind.  z_ref = z_c, or the tangent-plane expected
                      depth when normals are enabled.
      p_k           = clip(rejection_falloff * d_k, 0, 1)
      pairVis       = 0.5 * (clip(max(d_1, p_2), 0, 1)
                             + clip(max(d_2, p_1), 0, 1))

    A sample far in front of the center (d << 0, e.g. a foreground object
    over distant background) is *rejected* -- counted visible -- whenever its
    mirror partner lies at or behind the center surface (the pseudo-
    disocclusion coupling), which is the scalable-AO haze-rejection trick;
    rejection_falloff controls how quickly partial rejection engages.

      AO = clip(sum_i w_i * pairVis_i, 0, 1) ** strength
    """
    ds = np.asarray(ds, dtype=np.float64)
    offsets, weights = build_pair_table(params.exhaustive)
    radius_coef = sphere_radius_coef(
        level, full_width, camera.tan_half_fov_h, params.screenspace_diameter
    )
    texel_scale = 2.0 * camera.tan_half_fov_h / (full_width // (1 << level))

    halo = 16
    zp = pad_parity4(ds, halo)
    # Only the center normal is ever read (window offset (0, 0) == the
    # unpadded field), so no normals halo is built.
    n_c = (np.asarray(normals_ds, np.float64)
           if normals_ds is not None and params.use_normals else None)

    h, w = ds.shape
    z_c = ds
    falloff = params.rejection_falloff
    vis = np.zeros_like(z_c)

    def window(arr, dy, dx):
        return arr[halo + dy : halo + dy + h, halo + dx : halo + dx + w]

    for (sx, sy), w_pair in zip(offsets, weights):
        dx, dy = 4 * int(sx), 4 * int(sy)
        t = np.sqrt(max(1.0 - (sx * sx + sy * sy) / 25.0, 1e-12))
        inv_r = 1.0 / (radius_coef * t)  # per unit z_c
        zs1 = window(zp, dy, dx)
        zs2 = window(zp, -dy, -dx)
        if n_c is not None:
            rel1 = _tangent_offset(n_c, dx, dy, texel_scale,
                                   0.5 * radius_coef * t)
            rel2 = -rel1
            zref1 = z_c * (1.0 + rel1)
            zref2 = z_c * (1.0 + rel2)
        else:
            zref1 = zref2 = z_c
        d1 = 1.0 + (zs1 - zref1) * inv_r / z_c
        d2 = 1.0 + (zs2 - zref2) * inv_r / z_c
        p1 = np.clip(falloff * d1, 0.0, 1.0)
        p2 = np.clip(falloff * d2, 0.0, 1.0)
        pair_vis = 0.5 * (
            np.clip(np.maximum(d1, p2), 0.0, 1.0)
            + np.clip(np.maximum(d2, p1), 0.0, 1.0)
        )
        vis = vis + w_pair * pair_vis

    return np.clip(vis, 0.0, 1.0) ** params.strength


# ---------------------------------------------------------------------------
# Blur + upsample (SURVEY.md SS3.3)
# ---------------------------------------------------------------------------

def noise_filter(lo_ao: np.ndarray, lo_d: np.ndarray,
                 noise_filter_strength: float) -> np.ndarray:
    """Depth-aware 3x3 smoothing of low-res AO.

    Spatial kernel [1,2,1] x [1,2,1]; each neighbor's weight is additionally
    scaled by 1 / (1 + NFS * (d_n - d_c)^2).  Large NoiseFilterTolerance
    (-> 0) gives NFS ~ 1 (smooth across depth steps); small tolerance (-> -8)
    gives huge NFS (neighbors suppressed unless depths match).  Idempotent on
    constant AO (weights normalize to 1).
    """
    lo_ao = np.asarray(lo_ao, dtype=np.float64)
    lo_d = np.asarray(lo_d, dtype=np.float64)
    ap = np.pad(lo_ao, 1, mode="edge")
    dp = np.pad(lo_d, 1, mode="edge")
    h, w = lo_ao.shape
    acc = np.zeros_like(lo_ao)
    wacc = np.zeros_like(lo_ao)
    g = {(-1, -1): 1, (-1, 0): 2, (-1, 1): 1,
         (0, -1): 2, (0, 0): 4, (0, 1): 2,
         (1, -1): 1, (1, 0): 2, (1, 1): 1}
    for (dy, dx), gw in g.items():
        a_n = ap[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
        d_n = dp[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
        dd = d_n - lo_d
        wt = gw / (1.0 + noise_filter_strength * dd * dd)
        acc += wt * a_n
        wacc += wt
    return acc / wacc


def bilateral_upsample2x(lo_ao: np.ndarray, lo_d: np.ndarray, hi_d: np.ndarray,
                         k_blur: float, k_up: float) -> np.ndarray:
    """Depth-aware 2x upsample, corner-aligned with pick-one downsampling.

    Low-res texel l sits exactly at hi-res texel 2l, so hi texel r has
    lo coordinate r/2: even rows/cols interpolate with fraction 0, odd with
    fraction 1/2.  Each of the 4 enclosing lo taps gets weight

        w = bilinear(r, c) / ((lo_d - hi_d)^2 / k_blur + k_up)

    normalized over the 4 taps (SURVEY.md SS3.3: bilinear x depth-similarity
    with a k_upsample_tolerance floor so flat regions never divide by ~0).
    """
    lo_ao = np.asarray(lo_ao, dtype=np.float64)
    lo_d = np.asarray(lo_d, dtype=np.float64)
    hi_d = np.asarray(hi_d, dtype=np.float64)
    hh, hw = hi_d.shape
    lh, lw = lo_d.shape
    assert lh * 2 == hh and lw * 2 == hw, (lo_d.shape, hi_d.shape)

    ap = np.pad(lo_ao, ((0, 1), (0, 1)), mode="edge")
    dp = np.pad(lo_d, ((0, 1), (0, 1)), mode="edge")

    r = np.arange(hh)
    c = np.arange(hw)
    r0 = r // 2
    c0 = c // 2
    fr = (r % 2) * 0.5
    fc = (c % 2) * 0.5

    acc = np.zeros((hh, hw))
    wacc = np.zeros((hh, hw))
    for dr in (0, 1):
        for dc in (0, 1):
            a = ap[np.ix_(r0 + dr, c0 + dc)]
            d = dp[np.ix_(r0 + dr, c0 + dc)]
            bw = (
                np.where(dr == 0, 1.0 - fr, fr)[:, None]
                * np.where(dc == 0, 1.0 - fc, fc)[None, :]
            )
            dd = d - hi_d
            wt = bw / (dd * dd / k_blur + k_up)
            acc += wt * a
            wacc += wt
    return acc / np.maximum(wacc, 1e-30)


def blur_upsample_step(
    lo_ao: np.ndarray,
    lo_d: np.ndarray,
    hi_d: np.ndarray,
    params: GoldenAOParams,
    full_width: int,
    lo_ao2: np.ndarray | None = None,
    hi_ao_blend: np.ndarray | None = None,
) -> np.ndarray:
    """One chain step: [pre-min] -> noise filter -> bilateral 2x [-> blend].

    The 4 reference kernel variants (SURVEY.md SS3.0 'Blur+upsample', upstream
    BlurUpsample{,PreMin}{,BlendOut}CS) are expressed by the two optional
    arguments: ``lo_ao2`` enables the low-res pre-min combine and
    ``hi_ao_blend`` enables the high-res min blend of the output.

    Composition rule (spec): the low-res field is first edge-extended by one
    texel bottom/right, the noise filter runs on the extended domain, and the
    upsample taps are plain slices of the extended filtered field -- i.e.
    edge clamping happens on the *input*, matching a GPU sampler reading a
    filtered texture with clamp addressing (and the fused TPU kernel).
    """
    if lo_ao2 is not None:
        lo_ao = np.minimum(lo_ao, lo_ao2)
    _, k_blur, k_up, nfs = upsample_constants(
        params, full_width, lo_d.shape[1]
    )
    lh, lw = lo_d.shape
    ap = np.pad(lo_ao, ((0, 1), (0, 1)), mode="edge")
    dp = np.pad(lo_d, ((0, 1), (0, 1)), mode="edge")
    filtered = noise_filter(ap, dp, nfs)  # (lh+1, lw+1) extended field

    hh, hw = hi_d.shape
    r = np.arange(hh)
    c = np.arange(hw)
    r0, c0 = r // 2, c // 2
    fr = (r % 2) * 0.5
    fc = (c % 2) * 0.5
    acc = np.zeros((hh, hw))
    wacc = np.zeros((hh, hw))
    for dr in (0, 1):
        for dc in (0, 1):
            a = filtered[np.ix_(r0 + dr, c0 + dc)]
            d = dp[np.ix_(r0 + dr, c0 + dc)]
            bw = (
                np.where(dr == 0, 1.0 - fr, fr)[:, None]
                * np.where(dc == 0, 1.0 - fc, fc)[None, :]
            )
            dd = d - hi_d
            wt = bw / (dd * dd / k_blur + k_up)
            acc += wt * a
            wacc += wt
    up = acc / np.maximum(wacc, 1e-30)
    if hi_ao_blend is not None:
        up = np.minimum(up, hi_ao_blend)
    return up


# ---------------------------------------------------------------------------
# Full frame (SURVEY.md SS4.2 dispatch DAG) + composite (SS3.4)
# ---------------------------------------------------------------------------

def render_frame_golden(
    depth: np.ndarray,
    camera: GoldenCameraParams,
    params: GoldenAOParams,
    normals: np.ndarray | None = None,
    return_debug: bool = False,
    full_width: int | None = None,
):
    """Full golden pipeline: depth [+ normals] -> full-res AO in [0,1].

    Input of any (H, W) is edge-padded to a multiple of 64 and the output is
    cropped back (SURVEY.md SS8 hard-part 4 padding rule).

    ``full_width`` overrides the buffer width used for the camera-derived
    constants (sphere radius, texel scale, upsample step tolerances), which
    the reference derives from the FRAME width, not the evaluated window
    (SURVEY.md SS3.2 ThicknessMultiplier ~ 1/BufferWidth).  Pass the original
    frame width when evaluating the golden on a 64-aligned interior crop of a
    larger frame: with a sufficient halo margin the crop's interior is then
    equal to the full-frame result (the affordable >=4K accuracy check --
    measured, margin 448 px matches to float64 noise; see bench.py).

    Chain (hierarchy_depth=4, SURVEY.md SS3.3):
      AO@1/16                                  -> up -> Combined@1/8
      min(Combined@1/8, AO@1/8)                -> up -> Combined@1/4
      min(Combined@1/4, AO@1/4)                -> up -> Combined@1/2
      min(Combined@1/2, AO@1/2)                -> up -> AO@full
    With enable_blur=False, returns the nearest-upsampled finest-level AO.
    """
    depth = np.asarray(depth, dtype=np.float64)
    h0, w0 = depth.shape
    hp, wp = padded_shape(h0, w0)
    depth = np.pad(depth, ((0, hp - h0), (0, wp - w0)), mode="edge")
    if normals is not None:
        normals = np.asarray(normals, dtype=np.float64)
        normals = np.pad(
            normals, ((0, hp - h0), (0, wp - w0), (0, 0)), mode="edge"
        )

    d = params.hierarchy_depth
    fw = wp if full_width is None else int(full_width)
    linz = linearize_depth(depth, camera)
    pyr = build_pyramid(linz, d)
    npyr = build_pyramid(normals, d) if (
        normals is not None and params.use_normals) else [None] * (d + 1)

    aos = {
        l: render_ao_level(pyr[l], l, fw, camera, params, npyr[l])
        for l in range(1, d + 1)
    }
    debug = {"linear_z": linz, "pyramid": pyr, "ao_levels": dict(aos)}

    if not params.enable_blur:
        ao = np.repeat(np.repeat(aos[1], 2, axis=0), 2, axis=1) if d >= 1 else linz
        ao = ao[:h0, :w0]
        return (ao, debug) if return_debug else ao

    # Chain uses the PreMin variant throughout.  NOTE: wiring the chain with
    # BlendOut instead (plain step, then min with AO_{l-1} at the hi level)
    # is algebraically IDENTICAL -- the min just migrates across the step
    # boundary -- which is why the upstream ships both kernel variants: they
    # are alternative fusions of the same chain (tested in
    # tests/test_pipeline.py::test_blendout_wiring_identical).
    combined = aos[d]
    for l in range(d, 0, -1):
        hi_d = pyr[l - 1]
        # upsample constants depend only on step_size = full_W / lo_W = 2^l,
        # which is the same for a 64-aligned crop as for its frame -- so the
        # crop's own padded width is always correct here (fw is NOT needed)
        combined = blur_upsample_step(
            combined, pyr[l], hi_d, params, wp,
            lo_ao2=aos[l] if l != d else None,
        )
        debug[f"combined_{l-1}"] = combined
    ao = combined[:h0, :w0]
    return (ao, debug) if return_debug else ao


def composite(color: np.ndarray, ao: np.ndarray, debug: bool = False):
    """Multiply AO into a color frame (SURVEY.md SS3.4).  ``debug=True``
    returns the AO broadcast to the color shape instead (the debug blit)."""
    ao_b = ao[..., None] if color.ndim == 3 else ao
    if debug:
        return np.broadcast_to(ao_b, color.shape).copy()
    return color * ao_b
