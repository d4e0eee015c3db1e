"""AoBlurUpsample stage, TPU-native (SURVEY.md SS3.3).

Reference behavior (expected ``Assets/MiniEngineAO/Shader/Upsample.compute``,
4 kernel variants ~ upstream ``BlurUpsample{,PreMin}{,BlendOut}CS`` -- mount
empty, SURVEY.md SS0): per chain step, an optional min-combine of two low-res
AO sources, a depth-aware noise filter of low-res AO, and a bilateral 2x
upsample against the high-res depth.

TPU-first: the 3x3 noise filter and the 4-tap upsample are static shifted
slices / 2x jnp.repeat over the whole level -- XLA fuses each step into a
couple of memory-bound passes.  Constants (step_size, k_blur_tolerance,
k_upsample_tolerance, noise_filter_strength) follow the host math recorded in
SURVEY.md SS3.3 (tpuao.params.upsample_constants); the exact weight formulas
are this framework's spec, defined identically in golden/reference.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpuao.params import upsample_constants


def _interleave_axis(a, b, axis: int):
    """[a0, b0, a1, b1, ...] along ``axis`` via interior padding + add.

    Layout-safe: a stack/transpose/reshape interleave creates a tensor with a
    size-2 minor dimension, which XLA's TPU layouts pad to the (8, 128) tile
    -- a 64x memory inflation that silently cost ~2 ms/frame at 4K and OOMed
    at 8K (seen in the HBM allocation dump).  Interior-padded adds never
    materialize small-minor intermediates.
    """
    nd = a.ndim
    cfg_a = [(0, 0, 0)] * nd
    cfg_b = [(0, 0, 0)] * nd
    cfg_a[axis] = (0, 1, 1)
    cfg_b[axis] = (1, 0, 1)
    zero = jnp.zeros((), a.dtype)
    return lax.pad(a, zero, cfg_a) + lax.pad(b, zero, cfg_b)


def _row_interleave(a, b):
    """[a0; b0; a1; b1; ...] along axis -2 via concat+reshape: row-major
    reshape of (..., H, 2W) -> (..., 2H, W) splits each row [a_i | b_i]
    into consecutive rows a_i, b_i -- an exact row interleave with no
    small-minor intermediate."""
    lead = a.shape[:-2]
    rows = jnp.concatenate([a, b], axis=-1)
    return rows.reshape(lead + (2 * a.shape[-2], a.shape[-1]))


def interleave2x2(p00, p01, p10, p11):
    """Merge 4 parity planes (2p+q order) into the (2H, 2W) field.

    Layout-bounded (every intermediate keeps a minor dim >= lh >= 128-ish,
    never 2):

      1. rows (sublane parity p): ``_row_interleave`` per column parity;
      2. columns (lane parity q): the same trick in transposed space --
         transpose both row-merged fields, row-interleave, transpose back.
         XLA's tiled transpose is ~memcpy speed.

    Two rejected forms, both measured: stack/transpose/reshape gives the
    rank-4 temp a size-2 minor dim that XLA pads to the 128-lane tile
    (64x HBM inflation: 1.2 GB of temps at 1080p, OOM at 8K); interior-
    padded ``lax.pad`` adds are layout-safe but lower to ~0.24 us/px
    whenever the result is materialized (~0.36 ms at 1080p vs 0.005 ms
    for this form -- benchmarks/exp/colint2.py).
    """
    even = _row_interleave(p00, p10)  # (..., 2lh, lw), columns 2j
    odd = _row_interleave(p01, p11)   # (..., 2lh, lw), columns 2j+1
    out_t = _row_interleave(jnp.swapaxes(even, -1, -2),
                            jnp.swapaxes(odd, -1, -2))
    return jnp.swapaxes(out_t, -1, -2)


def interleave2x2_padded(p00, p01, p10, p11):
    """Layout-bounded 2x2 interleave via interior-padded adds (no
    small-minor intermediates can exist).  See interleave2x2 caveat."""
    even_rows = _interleave_axis(p00, p01, axis=-1)
    odd_rows = _interleave_axis(p10, p11, axis=-1)
    return _interleave_axis(even_rows, odd_rows, axis=-2)


def _shift2d(x, dy, dx):
    """Edge-clamped shift on the last two dims via pad+slice."""
    h, w = x.shape[-2:]
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], mode="edge")
    return p[..., 1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]


def noise_filter(lo_ao, lo_d, noise_filter_strength):
    """Depth-aware 3x3 smoothing; weights [1,2,1]^2 x 1/(1+NFS*dd^2)."""
    lo_ao = lo_ao.astype(jnp.float32)
    lo_d = lo_d.astype(jnp.float32)
    taps = [(-1, -1, 1.0), (-1, 0, 2.0), (-1, 1, 1.0),
            (0, -1, 2.0), (0, 0, 4.0), (0, 1, 2.0),
            (1, -1, 1.0), (1, 0, 2.0), (1, 1, 1.0)]
    acc = jnp.zeros_like(lo_ao)
    wacc = jnp.zeros_like(lo_ao)
    for dy, dx, g in taps:
        a_n = _shift2d(lo_ao, dy, dx)
        d_n = _shift2d(lo_d, dy, dx)
        dd = d_n - lo_d
        wt = g / (1.0 + noise_filter_strength * dd * dd)
        acc = acc + wt * a_n
        wacc = wacc + wt
    return acc / wacc


def _lo_tap(x, dr, dc):
    """lo_padded[i + dr, j + dc] (edge pad bottom/right), same shape as x."""
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 1), (0, 1)], mode="edge")
    lh, lw = x.shape[-2:]
    return p[..., dr: dr + lh, dc: dc + lw]


def bilateral_upsample2x(lo_ao, lo_d, hi_d, k_blur, k_up):
    """Corner-aligned depth-aware 2x upsample (spec: golden bilateral_upsample2x).

    w(tap) = bilinear * 1 / ((lo_d - hi_d)^2 / k_blur + k_up), normalized.

    TPU-first formulation: instead of nearest-upsampling each tap to hi-res
    (jnp.repeat relayouts dominated the frame cost), compute the four hi-res
    *parity planes* at lo resolution -- each parity (p, q) has fixed bilinear
    fractions (p/2, q/2), so only its non-zero taps are evaluated (1/2/2/4
    taps instead of 4x4) -- then interleave once.  Bit-identical to the
    golden: zero-bilinear taps contribute nothing there.
    """
    lo_ao = lo_ao.astype(jnp.float32)
    lo_d = lo_d.astype(jnp.float32)
    hi_d = hi_d.astype(jnp.float32)
    lh, lw = lo_d.shape[-2:]

    taps = {(dr, dc): (_lo_tap(lo_ao, dr, dc), _lo_tap(lo_d, dr, dc))
            for dr in (0, 1) for dc in (0, 1)}

    planes = []
    for p in (0, 1):
        hd_rows = hi_d[..., p::2, :]
        for q in (0, 1):
            hd = hd_rows[..., :, q::2]  # (lh, lw) hi depth at parity (p,q)
            acc = jnp.zeros_like(hd)
            wacc = jnp.zeros_like(hd)
            for dr in (0, 1):
                wr = 1.0 - p * 0.5 if dr == 0 else p * 0.5
                if wr == 0.0:
                    continue
                for dc in (0, 1):
                    wc = 1.0 - q * 0.5 if dc == 0 else q * 0.5
                    if wc == 0.0:
                        continue
                    a, d = taps[(dr, dc)]
                    dd = d - hd
                    wt = (wr * wc) / (dd * dd / k_blur + k_up)
                    acc = acc + wt * a
                    wacc = wacc + wt
            planes.append(acc / jnp.maximum(wacc, 1e-30))

    return interleave2x2(*planes)


def _bilateral_upsample2x_ext(f_ext, d_ext, hi_d, k_blur, k_up,
                              crop_hw=None, hi_planes=None):
    """Parity-plane bilateral 2x from edge-extended (lh+1, lw+1) fields.

    Same math as ``bilateral_upsample2x`` but taps are plain slices of the
    pre-extended inputs (the spec's composition rule; see golden
    blur_upsample_step docstring).

    ``crop_hw=(h, w)``: crop the result to (h, w).  When both are even
    the crop happens IN PLANE SPACE (each plane sliced to (h/2, w/2))
    before the interleave — bit-identical to interleaving then cropping
    (out[2i+p, 2j+q] = plane[i, j]), but the final full-res copy
    disappears and XLA's fusions skip computing the pad region entirely
    (~0.3 ms of relayout at 8K).  Odd dims fall back to post-crop.

    ``hi_planes``: optional precomputed parity planes of ``hi_d`` in
    (p, q) order — ``hi_d[p::2, q::2]`` each — hoisting the per-step
    strided slicing into prepare (the plane-resident depth-pyramid
    experiment, VERDICT r2 next-item 2).  Values are identical by
    construction; only the slicing site moves.
    """
    lh, lw = hi_d.shape[-2], hi_d.shape[-1]
    lh, lw = lh // 2, lw // 2
    plane_crop = (crop_hw is not None
                  and crop_hw[0] % 2 == 0 and crop_hw[1] % 2 == 0)

    taps = {(dr, dc): (f_ext[..., dr: dr + lh, dc: dc + lw],
                       d_ext[..., dr: dr + lh, dc: dc + lw])
            for dr in (0, 1) for dc in (0, 1)}
    planes = []
    for p in (0, 1):
        hd_rows = None if hi_planes is not None else hi_d[..., p::2, :]
        for q in (0, 1):
            hd = (hi_planes[2 * p + q] if hi_planes is not None
                  else hd_rows[..., :, q::2])
            acc = jnp.zeros_like(hd)
            wacc = jnp.zeros_like(hd)
            for dr in (0, 1):
                wr = 1.0 - p * 0.5 if dr == 0 else p * 0.5
                if wr == 0.0:
                    continue
                for dc in (0, 1):
                    wc = 1.0 - q * 0.5 if dc == 0 else q * 0.5
                    if wc == 0.0:
                        continue
                    a, d = taps[(dr, dc)]
                    dd = d - hd
                    wt = (wr * wc) / (dd * dd / k_blur + k_up)
                    acc = acc + wt * a
                    wacc = wacc + wt
            plane = acc / jnp.maximum(wacc, 1e-30)
            if plane_crop:
                plane = plane[..., : crop_hw[0] // 2, : crop_hw[1] // 2]
            planes.append(plane)

    out = interleave2x2(*planes)
    if crop_hw is not None and not plane_crop:
        out = out[..., : crop_hw[0], : crop_hw[1]]
    return out


BAND_ROWS = 512


def blur_upsample_step(lo_ao, lo_d, hi_d, params, full_width: int,
                       lo_ao2=None, hi_ao_blend=None, crop_hw=None,
                       hi_planes=None):
    """One chain step: [pre-min] -> noise filter -> bilateral 2x [-> blend].

    The 4 reference upsample kernel variants are selected by the optional
    args (SURVEY.md SS3.0/SS3.3); the main chain uses pre-min on every step
    after the coarsest.  Edge handling follows the spec's edge-extended
    composition (golden blur_upsample_step docstring).  ``crop_hw``
    crops the result (in plane space when even -- see
    ``_bilateral_upsample2x_ext``); the pipeline passes it on the final
    step so the padded rows/cols are never interleaved at all.
    ``hi_planes`` feeds precomputed hi-depth parity planes (see
    ``_bilateral_upsample2x_ext``).
    """
    if lo_ao2 is not None:
        lo_ao = jnp.minimum(lo_ao, lo_ao2)
    _, k_blur, k_up, nfs = upsample_constants(params, full_width,
                                              lo_d.shape[-1])
    pad = [(0, 0)] * (lo_ao.ndim - 2) + [(0, 1), (0, 1)]
    ap = jnp.pad(lo_ao.astype(jnp.float32), pad, mode="edge")
    dp = jnp.pad(lo_d.astype(jnp.float32), pad, mode="edge")
    filtered = noise_filter(ap, dp, nfs)
    up = _bilateral_upsample2x_ext(filtered, dp, hi_d.astype(jnp.float32),
                                   k_blur, k_up, crop_hw=crop_hw,
                                   hi_planes=hi_planes)
    if hi_ao_blend is not None:
        if crop_hw is not None:
            hi_ao_blend = hi_ao_blend[..., : crop_hw[0], : crop_hw[1]]
        up = jnp.minimum(up, hi_ao_blend)
    return up


def _chain_step_banded(ap, dp, hi_d, k_blur, k_up, nfs, hi_ao_blend,
                       band_rows: int = BAND_ROWS):
    """filter+upsample in unrolled row bands of the extended lo fields.

    Identical math to the whole-field form: the noise filter gets a 1-row
    halo per band and crops it, so band boundaries see real neighbors (the
    edge clamp only ever applies at the true frame edge).  Bit-exact vs
    the whole-field form (asserted in tests and the band_unroll probe).

    Status: TESTED VARIANT, NOT WIRED.  Standalone at 8K l1 it wins
    (1.66 -> 1.21 ms, benchmarks/exp/band_unroll.py) but wired into the
    pipeline the full 8K frame got SLOWER (11.18 -> 11.84 ms) -- the same
    standalone-win/in-pipeline-loss inversion as the banded render
    (docs/PERF.md '8K'): banding breaks XLA's cross-stage fusion, which
    is worth more than the band-locality win.  Third data point for the
    rule: do not band stages inside the fused frame program.
    """
    lh, lw = ap.shape[-2] - 1, ap.shape[-1] - 1
    outs = []
    for r0 in range(0, lh, band_rows):
        bh = min(band_rows, lh - r0)
        t0 = max(r0 - 1, 0)
        t1 = min(r0 + bh + 2, lh + 1)
        f = noise_filter(ap[t0:t1], dp[t0:t1], nfs)
        f = f[r0 - t0: r0 - t0 + bh + 1]
        d_ext = dp[r0: r0 + bh + 1]
        hi = hi_d[2 * r0: 2 * (r0 + bh)]
        up = _bilateral_upsample2x_ext(f, d_ext, hi, k_blur, k_up)
        if hi_ao_blend is not None:
            up = jnp.minimum(up, hi_ao_blend[2 * r0: 2 * (r0 + bh)])
        outs.append(up)
    return jnp.concatenate(outs, axis=-2) if len(outs) > 1 else outs[0]
