"""Decompose the 0.74 ms slope_pyramid cost at 4K (exp/normals_4k.py).

Suspects: the channel extraction from the (H, W, 3) channel-last input
(minor-dim-3 strided access -- the known TPU lowering hazard class), the
full-res divide, the edge pad, or the pyramid slices.  Also times
alternative formulations:

  chan_slice   - n[..., 0] alone (one channel)
  chan_all     - all three channels + sum (forces all three extracts)
  mv_then      - moveaxis to (3, H, W) first, then free leading slices
  reshape_st   - reshape (H, W*3) + per-axis strided [:, i::3]
  slopes_only  - slope_planes (no pyramid)
  slopes_mv    - slope_planes on a pre-moveaxis'd (3, H, W) input with
                 direct leading-axis channel reads (candidate fix)
  pyramid_only - the 4-level pick-one pyramid given ready (H, W) planes
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpuao.ops import render as R
from tpuao.params import CameraParams, padded_shape
from tpuao.utils import fixtures as F
from tpuao.utils.profiling import device_time_ms


def main():
    h, w = 2160, 3840
    hp, wp = padded_shape(h, w)
    cam = CameraParams(depth_mode="linear")
    _, n = F.spheres_on_plane(h, w, n_spheres=6, seed=11, with_normals=True)
    nd = jax.device_put(jnp.asarray(n, jnp.float32))
    ncf = jax.device_put(jnp.moveaxis(jnp.asarray(n, jnp.float32), -1, 0))
    ts0 = 2.0 * float(cam.tan_half_fov_h) / wp
    print(f"backend={jax.default_backend()} {h}x{w}", flush=True)

    def t(name, fn, *args):
        ms = device_time_ms(fn, *args)
        print(f"{name:13s} {ms:8.4f} ms", flush=True)

    t("chan_slice", lambda x: jnp.sum(x[..., 0]), nd)
    t("chan_all", lambda x: jnp.sum(x[..., 0]) + jnp.sum(x[..., 1])
      + jnp.sum(x[..., 2]), nd)
    t("mv_then", lambda x: sum(jnp.sum(p) for p in
                               jnp.moveaxis(x, -1, 0)), nd)
    t("reshape_st", lambda x: sum(
        jnp.sum(x.reshape(h, w * 3)[:, i::3]) for i in range(3)), nd)
    t("slopes_only", lambda x: R.slope_planes(x, cam.tan_half_fov_h, wp),
      nd)

    def slopes_cf(x):  # direct leading-axis reads, no moveaxis round-trip
        grad = ts0 / jnp.maximum(x[2], 0.05)
        return x[0] * grad, x[1] * grad

    t("slopes_cf", slopes_cf, ncf)

    gx, gy = jax.jit(slopes_cf)(ncf)
    gx = jnp.asarray(gx)
    gy = jnp.asarray(gy)

    def pyramid_only(gx, gy):
        cfg = [(0, hp - h), (0, wp - w)]
        gx = jnp.pad(gx, cfg, mode="edge")
        gy = jnp.pad(gy, cfg, mode="edge")
        pyr = [(gx, gy)]
        for _ in range(4):
            a, b = pyr[-1]
            pyr.append((a[0::2, :][:, 0::2], b[0::2, :][:, 0::2]))
        return tuple(x for pair in pyr for x in pair)

    t("pyramid_only", pyramid_only, gx, gy)
    t("full_current", lambda x: R.slope_pyramid(
        x, cam.tan_half_fov_h, hp, wp, 4, h0=h, w0=w), nd)

    def full_cf(x):
        g_x, g_y = slopes_cf(x)
        return pyramid_only(g_x, g_y)

    t("full_cf", full_cf, ncf)


if __name__ == "__main__":
    main()
