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

from tpuao.params import upsample_constants


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


def _up2_tap(x, dr, dc):
    """hi[r, c] = lo_padded[r//2 + dr, c//2 + dc] for dr, dc in {0, 1}."""
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 1), (0, 1)], mode="edge")
    lh, lw = x.shape[-2:]
    t = p[..., dr: dr + lh, dc: dc + lw]
    return jnp.repeat(jnp.repeat(t, 2, axis=-2), 2, axis=-1)


def bilateral_upsample2x(lo_ao, lo_d, hi_d, k_blur, k_up):
    """Corner-aligned depth-aware 2x upsample (spec: golden bilateral_upsample2x).

    w(tap) = bilinear * 1 / ((lo_d - hi_d)^2 / k_blur + k_up), normalized.
    """
    lo_ao = lo_ao.astype(jnp.float32)
    lo_d = lo_d.astype(jnp.float32)
    hi_d = hi_d.astype(jnp.float32)
    hh, hw = hi_d.shape[-2:]

    fr = (jnp.arange(hh, dtype=jnp.float32) % 2) * 0.5  # 0, .5, 0, .5 ...
    fc = (jnp.arange(hw, dtype=jnp.float32) % 2) * 0.5
    acc = jnp.zeros_like(hi_d)
    wacc = jnp.zeros_like(hi_d)
    for dr in (0, 1):
        wr = (1.0 - fr) if dr == 0 else fr
        for dc in (0, 1):
            wc = (1.0 - fc) if dc == 0 else fc
            a = _up2_tap(lo_ao, dr, dc)
            d = _up2_tap(lo_d, dr, dc)
            bw = wr[:, None] * wc[None, :]
            dd = d - hi_d
            wt = bw / (dd * dd / k_blur + k_up)
            acc = acc + wt * a
            wacc = wacc + wt
    return acc / jnp.maximum(wacc, 1e-30)


def blur_upsample_step(lo_ao, lo_d, hi_d, params, full_width: int,
                       lo_ao2=None, hi_ao_blend=None):
    """One chain step: [pre-min] -> noise filter -> bilateral 2x [-> blend].

    The 4 reference upsample kernel variants are selected by the optional
    args (SURVEY.md SS3.0/SS3.3); the main chain uses pre-min on every step
    after the coarsest.
    """
    if lo_ao2 is not None:
        lo_ao = jnp.minimum(lo_ao, lo_ao2)
    _, k_blur, k_up, nfs = upsample_constants(params, full_width,
                                              lo_d.shape[-1])
    filtered = noise_filter(lo_ao, lo_d, nfs)
    up = bilateral_upsample2x(filtered, lo_d, hi_d, k_blur, k_up)
    if hi_ao_blend is not None:
        up = jnp.minimum(up, hi_ao_blend)
    return up
