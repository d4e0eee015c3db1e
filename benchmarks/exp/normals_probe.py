#!/usr/bin/env python
"""Probe: where does the normals path's extra time go? (config 3 roofline
is the weakest of the full configs.)

Times render level 1 at 1080p in four forms on the current backend:
  depth      - depth-only estimator (baseline)
  normals    - the shipped tangent-corrected estimator
  nodiv      - tangent correction with the divide replaced by a multiply
               (WRONG math - cost probe only: isolates the f32 div cost)
  premul     - algebraically refactored: depth-only d +- rel*inv_r
               (same math, one fewer multiply chain inside the clip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

from tpuao.ops.render import HALO, _pair_constants
from tpuao.ops.prepare import pad_parity4, linearize_depth, build_pyramid
from tpuao.params import AOParams, CameraParams, sphere_radius_coef
from tpuao.utils import fixtures as F
from tpuao.utils.profiling import device_time_ms


def variant(ds, wp, camera, params, g_x, g_y, mode):
    pairs = _pair_constants(params)
    radius_coef = sphere_radius_coef(1, wp, camera.tan_half_fov_h,
                                     params.screenspace_diameter)
    h, w = ds.shape
    zp = pad_parity4(ds, HALO)

    def window(dy, dx):
        return zp[HALO + dy: HALO + dy + h, HALO + dx: HALO + dx + w]

    inv_zc = 1.0 / ds
    falloff = params.rejection_falloff
    vis = jnp.zeros_like(ds)
    for (dx, dy, t, w_pair) in pairs:
        inv_r = 1.0 / (radius_coef * t)
        zs1 = window(dy, dx)
        zs2 = window(-dy, -dx)
        if mode == "depth":
            d1 = 1.0 + (zs1 * inv_zc - 1.0) * inv_r
            d2 = 1.0 + (zs2 * inv_zc - 1.0) * inv_r
        else:
            x = g_x * dx + g_y * dy
            m2 = (0.5 * radius_coef * t) ** 2
            if mode == "nodiv":
                rel = x * m2 * (m2 + x * x)  # WRONG: cost probe
            else:
                rel = x * m2 / (m2 + x * x)
            if mode == "premul":
                s = rel * inv_r
                d1 = 1.0 + (zs1 * inv_zc - 1.0) * inv_r - s
                d2 = 1.0 + (zs2 * inv_zc - 1.0) * inv_r + s
            else:
                d1 = 1.0 + (zs1 * inv_zc - (1.0 + rel)) * inv_r
                d2 = 1.0 + (zs2 * inv_zc - (1.0 - rel)) * inv_r
        p1 = jnp.clip(falloff * d1, 0.0, 1.0)
        p2 = jnp.clip(falloff * d2, 0.0, 1.0)
        vis = vis + (0.5 * w_pair) * (
            jnp.maximum(jnp.clip(d1, 0.0, 1.0), p2)
            + jnp.maximum(jnp.clip(d2, 0.0, 1.0), p1))
    return jnp.power(jnp.clip(vis, 0.0, 1.0), params.strength)


def main():
    cam = CameraParams(depth_mode="linear")
    params = AOParams(use_normals=True)
    z, n = F.spheres_on_plane(1080, 1920, n_spheres=6, seed=11,
                              with_normals=True)
    zp = np.pad(z, ((0, 8), (0, 0)), mode="edge").astype(np.float32)
    npad = np.pad(n, ((0, 8), (0, 0), (0, 0)), mode="edge")
    linz = linearize_depth(jnp.asarray(zp), cam)
    ds1 = build_pyramid(linz, 1)[1]
    texel_scale = 2.0 * cam.tan_half_fov_h / (1920 // 2)
    n1 = npad[0::2][:, 0::2]
    n_z = np.maximum(n1[..., 2], 0.05)
    g_x = jnp.asarray(n1[..., 0] / n_z * texel_scale, jnp.float32)
    g_y = jnp.asarray(n1[..., 1] / n_z * texel_scale, jnp.float32)
    ds1 = jnp.asarray(ds1)

    base = None
    for mode in ("depth", "normals", "premul", "nodiv"):
        ms = device_time_ms(
            lambda d, gx=g_x, gy=g_y, m=mode: variant(
                d, 1920, cam, params, gx, gy, m), ds1)
        extra = "" if base is None else f"  (+{ms - base:.4f} vs depth)"
        if mode == "depth":
            base = ms
        print(f"render_l1 1080p {mode:8s} {ms:8.4f} ms{extra}")


if __name__ == "__main__":
    main()
