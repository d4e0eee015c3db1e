"""AoRender stage, TPU-native (SURVEY.md SS3.2).

Reference behavior (expected ``Assets/MiniEngineAO/Shader/Render.compute`` --
mount empty, SURVEY.md SS0): per deinterleaved slice, an 8x8 thread group
caches a 16x16 linear-depth tile in group-shared memory and accumulates 12
mirrored sample-pair occlusion tests per pixel.

TPU-first redesign: the group-shared 16x16 cache maps to the whole level (or
a VMEM block in the Pallas kernel, ops/pallas_kernels.py); each disc tap is a
*static shifted slice* of the depth block -- 68 vectorized VPU reads, zero
gathers, zero dynamic shapes.  The math is the golden spec bit-for-bit (same
formula, f32 instead of f64); see golden/reference.py render_ao_level for the
pair-test definition.

This module is the pure-jnp implementation (XLA-fused); it is the correctness
fallback for the Pallas kernel and the default on non-TPU backends.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpuao.params import build_pair_table, sphere_radius_coef
from tpuao.ops.prepare import pad_parity4

HALO = 16  # max disc offset: 4 slice texels * stride 4


@jax.custom_jvp
def _pow_gradsafe(x, s):
    """``x ** s`` with gradients defined at ``x == 0``.

    Forward is bit-identical to ``jnp.power`` (the golden spec).  The raw
    JVP is ``s*x^(s-1)*dx + x^s*log(x)*ds``, which is inf/nan at x=0 for
    s<1 / any s; a fully-occluded pixel (vis=0) would poison every gradient
    in the frame.  The JVP below evaluates at ``max(x, 1e-12)`` instead --
    the standard clamped-subgradient convention, needed for the
    differentiable-AO path (models/autodiff.py)."""
    return jnp.power(x, s)


@_pow_gradsafe.defjvp
def _pow_gradsafe_jvp(primals, tangents):
    x, s = primals
    dx, ds = tangents
    xs = jnp.maximum(x, 1e-12)
    y = jnp.power(x, s)
    dy = s * jnp.power(xs, s - 1.0) * dx + y * jnp.log(xs) * ds
    return y, dy


def _pair_constants(params):
    """Static per-pair (offsets in ds texels, thickness, weight) table."""
    offsets, weights = build_pair_table(params.exhaustive)
    out = []
    for (sx, sy), w in zip(offsets, weights):
        t = float(np.sqrt(max(1.0 - (sx * sx + sy * sy) / 25.0, 1e-12)))
        out.append((4 * int(sx), 4 * int(sy), t, float(w)))
    return out


def normals_channel_last(normals):
    """Return ``normals`` in channel-last (..., H, W, 3) layout.

    Accepts channel-last or channel-first (..., 3, H, W).  When BOTH the
    last and third-from-last dims are 3 the layout cannot be inferred
    (e.g. a (3, W, 3) buffer), so this raises instead of silently reading
    image rows as components — the same ambiguity class as the camera
    B == 1 case.  The full pipeline never hits it (padded frames are
    64-aligned, so no level is 3 pixels tall); it only guards direct
    per-level calls.
    """
    cl = normals.shape[-1] == 3
    cf = normals.ndim >= 3 and normals.shape[-3] == 3
    if cl and cf:
        raise ValueError(
            f"ambiguous normals layout {normals.shape}: both candidate "
            "channel dims are 3 — pass channel-last (..., H, W, 3) with "
            "H != 3")
    if cf:
        return jnp.moveaxis(normals, -3, -1)
    if cl:
        return normals
    raise ValueError(f"normals shape {normals.shape} has no size-3 "
                     "channel dim")


def slope_planes(normals, tan_half_fov_h, full_width: int):
    """(g_x, g_y) tangent-slope planes at level-0 texel scale.

    ``normals`` is channel-last (..., H, W, 3) or channel-first
    (..., 3, H, W).  g = (n_x, n_y) / max(n_z, 0.05) * texel_scale(level 0);
    at hierarchy level l the slope per level-l texel is exactly g * 2^l
    (texel_scale doubles per level -- a power of two, so the scaling is
    exact), which render_ao_level folds into its static pair offsets.

    Computing these ONCE at full resolution and pick-one-downsampling the
    two rank-2 planes replaces the (3, H, W) normals pyramid: rank-3
    strided slicing lowers ~10x slower than rank-2 on TPU (measured,
    benchmarks/exp/normals_prologue.py: 0.25 ms vs 0.02 ms at 1080p).

    A channel-FIRST input is sliced directly on its major dim (a free
    view) instead of round-tripping through channel-last -- minor-dim-3
    slicing of an (H, W, 3) buffer is a relayout copy on TPU, so
    channel-first is the preferred device ABI for large normals frames
    (r5, VERDICT r4 item 4; the host-side transpose is cheap next to the
    transfer).
    """
    cl = normals.shape[-1] == 3
    cf = normals.ndim >= 3 and normals.shape[-3] == 3
    if cf and not cl:
        n_x = normals[..., 0, :, :]
        n_y = normals[..., 1, :, :]
        n_z = normals[..., 2, :, :]
    else:
        normals = normals_channel_last(normals)
        n_x = normals[..., 0]
        n_y = normals[..., 1]
        n_z = normals[..., 2]
    ts0 = 2.0 * tan_half_fov_h / full_width
    grad = ts0 / jnp.maximum(n_z.astype(jnp.float32), 0.05)
    return n_x.astype(jnp.float32) * grad, n_y.astype(jnp.float32) * grad


def slope_pyramid(normals, tan_half_fov_h, hp: int, wp: int, depth: int,
                  h0: int | None = None, w0: int | None = None):
    """Edge-padded slope planes + their pick-one pyramid.

    Returns ``[(g_x, g_y)] * (depth + 1)`` with level l at 1/2^l resolution
    of the (hp, wp) padded frame; feed level l to ``render_ao_level`` as
    ``slopes_ds``.  Used by the pipeline prologue and the stage profiler.
    """
    g_x, g_y = slope_planes(normals, tan_half_fov_h, wp)
    h0 = h0 if h0 is not None else g_x.shape[-2]
    w0 = w0 if w0 is not None else g_x.shape[-1]
    if (hp, wp) != (h0, w0):
        cfg = [(0, 0)] * (g_x.ndim - 2) + [(0, hp - h0), (0, wp - w0)]
        g_x = jnp.pad(g_x, cfg, mode="edge")
        g_y = jnp.pad(g_y, cfg, mode="edge")
    pyr = [(g_x, g_y)]
    for _ in range(depth):
        gx, gy = pyr[-1]
        pyr.append((gx[..., 0::2, :][..., :, 0::2],
                    gy[..., 0::2, :][..., :, 0::2]))
    return pyr


def render_ao_level(ds, level: int, full_width: int, camera, params,
                    normals_ds=None, slopes_ds=None):
    """AO estimate at hierarchy level `level` on the 1/2^level depth buffer.

    Pure-jnp mirror of golden render_ao_level; all loops are static Python
    over the 34-pair table, so the traced program is a flat chain of shifted
    slices + FMAs that XLA fuses into one pass.

    The tangent-corrected path takes either ``normals_ds`` (the level's
    normals buffer, golden-parity entry) or ``slopes_ds`` -- the level's
    ``slope_planes`` at level-0 scale (the pipeline's fast prologue).
    """
    ds = ds.astype(jnp.float32)
    pairs = _pair_constants(params)
    radius_coef = sphere_radius_coef(
        level, full_width, camera.tan_half_fov_h, params.screenspace_diameter
    )

    h, w = ds.shape[-2:]
    zp = pad_parity4(ds, HALO)
    use_n = params.use_normals and (normals_ds is not None
                                    or slopes_ds is not None)
    if use_n:
        if slopes_ds is not None:
            # level-0-scale slopes: fold the exact 2^level into the static
            # pair offsets below
            g_x, g_y = (s.astype(jnp.float32) for s in slopes_ds)
            off_scale = float(1 << level)
        else:
            # Accept channel-first (..., 3, h, w) planes (the pipeline's TPU
            # layout -- a minor dim of 3 tiles catastrophically) or the
            # golden's channel-last (..., h, w, 3).  Only the *center*
            # normal is read by the tangent test, so no parity padding.
            nrm = jnp.moveaxis(normals_channel_last(normals_ds),
                               -1, -3).astype(jnp.float32)
            texel_scale = 2.0 * camera.tan_half_fov_h / (
                full_width // (1 << level))
            n_z = jnp.maximum(nrm[..., 2, :, :], 0.05)
            grad = texel_scale / n_z
            g_x = nrm[..., 0, :, :] * grad
            g_y = nrm[..., 1, :, :] * grad
            off_scale = 1.0

    gxy = (g_x, g_y, off_scale) if use_n else None
    return _render_core(zp, h, w, pairs, radius_coef, params, gxy)


def _render_core(zp, h: int, w: int, pairs, radius_coef, params, gxy=None):
    """The 68-tap pair loop on a pre-padded buffer ``zp`` (h+2H, w+2H).

    ``gxy = (g_x, g_y, off_scale)`` enables the tangent correction.
    Shared by the whole-level path and the row-banded path (which calls it
    per band with identical window values -- bit-equal by construction).
    """

    def window(arr, dy, dx):
        return arr[..., HALO + dy: HALO + dy + h, HALO + dx: HALO + dx + w]

    z_c = window(zp, 0, 0)
    inv_zc = 1.0 / z_c
    falloff = params.rejection_falloff
    use_n = gxy is not None
    if use_n:
        g_x, g_y, off_scale = gxy

    # NOTE: the naive 1 + (zs*inv_zc - 1)*inv_r form fuses best under XLA
    # (an algebraic FMA refactor with per-entry a_i = inv_zc*inv_r temps
    # measured ~2.5x slower -- XLA materializes the temps); the Pallas kernel
    # uses the FMA form instead, where Mosaic keeps a_i in registers.
    vis = jnp.zeros_like(z_c)
    for (dx, dy, t, w_pair) in pairs:
        inv_r = 1.0 / (radius_coef * t)
        zs1 = window(zp, dy, dx)
        zs2 = window(zp, -dy, -dx)
        if use_n:
            # soft-clamped tangent correction (see golden _tangent_offset)
            x = g_x * (dx * off_scale) + g_y * (dy * off_scale)
            m2 = (0.5 * radius_coef * t) ** 2
            rel = x * m2 / (m2 + x * x)
            d1 = 1.0 + (zs1 * inv_zc - (1.0 + rel)) * inv_r
            d2 = 1.0 + (zs2 * inv_zc - (1.0 - rel)) * inv_r
        else:
            d1 = 1.0 + (zs1 * inv_zc - 1.0) * inv_r
            d2 = 1.0 + (zs2 * inv_zc - 1.0) * inv_r
        p1 = jnp.clip(falloff * d1, 0.0, 1.0)
        p2 = jnp.clip(falloff * d2, 0.0, 1.0)
        pair_vis = jnp.maximum(jnp.clip(d1, 0.0, 1.0), p2) + jnp.maximum(
            jnp.clip(d2, 0.0, 1.0), p1
        )
        vis = vis + (0.5 * w_pair) * pair_vis

    return _pow_gradsafe(jnp.clip(vis, 0.0, 1.0), params.strength)


def render_ao_level_banded(ds, level: int, full_width: int, camera, params,
                           slopes_ds=None, band_rows: int = 256):
    """``render_ao_level`` evaluated in row bands via ``lax.map``.

    Same math on the same values as the whole-level path: the frame is
    parity-padded once, each band is a (band_rows + 2*HALO)-row slice of
    that padded buffer, and the same ``_render_core`` runs per band.
    (Results agree to <=1 ULP, not bitwise: XLA's FMA contraction differs
    between the lax.map body and the flat program.)  Purpose: above a few
    Mpix per level, XLA's whole-level fusion goes HBM-bound (each of the 68
    shifted windows re-reads the buffer; 41x scaling from 1080p to 8K,
    benchmarks/exp/big_frame_kernels.py) while a band's working set stays
    VMEM-resident.
    """
    if ds.ndim > 2:
        fn = lambda d, s=None: render_ao_level_banded(
            d, level, full_width, camera, params,
            slopes_ds=s, band_rows=band_rows)
        if slopes_ds is None:
            return jax.vmap(lambda d: fn(d))(ds)
        return jax.vmap(lambda d, gx, gy: fn(d, (gx, gy)))(
            ds, slopes_ds[0], slopes_ds[1])

    ds = ds.astype(jnp.float32)
    pairs = _pair_constants(params)
    radius_coef = sphere_radius_coef(
        level, full_width, camera.tan_half_fov_h, params.screenspace_diameter
    )
    h, w = ds.shape
    use_n = params.use_normals and slopes_ds is not None

    zp = pad_parity4(ds, HALO)
    nb = -(-h // band_rows)
    hpad = nb * band_rows - h
    if hpad:
        # rows that only feed cropped outputs; replicate so depths stay valid
        zp = jnp.concatenate([zp, jnp.tile(zp[-1:, :], (hpad, 1))], axis=0)
    bands = jnp.stack([zp[i * band_rows: i * band_rows + band_rows + 2 * HALO]
                       for i in range(nb)])

    if use_n:
        off_scale = float(1 << level)
        gs = []
        for g in slopes_ds:
            g = g.astype(jnp.float32)
            if hpad:
                g = jnp.concatenate(
                    [g, jnp.tile(g[-1:, :], (hpad, 1))], axis=0)
            gs.append(g.reshape(nb, band_rows, w))

        def core(args):
            b, gx, gy = args
            return _render_core(b, band_rows, w, pairs, radius_coef, params,
                                (gx, gy, off_scale))

        out = lax.map(core, (bands, gs[0], gs[1]))
    else:
        out = lax.map(
            lambda b: _render_core(b, band_rows, w, pairs, radius_coef,
                                   params), bands)
    return out.reshape(nb * band_rows, w)[:h]
