"""Where does the 4K normals delta live?  (bench 3b: 3.10 ms vs 1.43
depth-only; 1080p delta was 0.275 ms -- a 4x-pixel scale should give
~1.1 ms, we see ~1.7.)

Times, at 2160x3840 on the default backend:
  read_cl    - jnp.sum of the (H, W, 3) channel-last input (pure read)
  read_cf    - jnp.sum of a (3, H, W) channel-first copy
  slope_prep - slope_planes + pick-one pyramid from channel-last input
  render_l1n - level-1 render with slopes vs without
  pipe       - full pipeline with/without normals (the bench numbers)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpuao.models.pipeline import ao_pipeline
from tpuao.ops import render as R
from tpuao.params import AOParams, CameraParams, padded_shape
from tpuao.utils import fixtures as F
from tpuao.utils.profiling import device_time_ms


def main():
    h, w = 2160, 3840
    hp, wp = padded_shape(h, w)
    cam = CameraParams(depth_mode="linear")
    z, n = F.spheres_on_plane(h, w, n_spheres=6, seed=11, with_normals=True)
    zd = jax.device_put(jnp.asarray(z, jnp.float32))
    nd = jax.device_put(jnp.asarray(n, jnp.float32))
    ncf = jax.device_put(jnp.moveaxis(jnp.asarray(n, jnp.float32), -1, 0))
    print(f"backend={jax.default_backend()} {h}x{w}", flush=True)

    def t(name, fn, *args):
        ms = device_time_ms(fn, *args)
        print(f"{name:12s} {ms:8.4f} ms", flush=True)
        return ms

    t("read_cl", lambda x: jnp.sum(x), nd)
    t("read_cf", lambda x: jnp.sum(x), ncf)
    t("slope_prep", lambda x: R.slope_pyramid(
        x, cam.tan_half_fov_h, hp, wp, 4, h0=h, w0=w), nd)
    t("slope_prep_cf", lambda x: R.slope_pyramid(
        x, cam.tan_half_fov_h, hp, wp, 4, h0=h, w0=w), ncf)

    par = AOParams(use_normals=True)
    ds1 = jax.jit(lambda d: jnp.pad(d, ((0, hp - h), (0, wp - w)),
                                    mode="edge")[0::2, :][:, 0::2])(zd)
    sp = jax.jit(lambda x: tuple(R.slope_pyramid(
        x, cam.tan_half_fov_h, hp, wp, 4, h0=h, w0=w)[1]))(nd)
    sp = tuple(jnp.asarray(a) for a in sp)
    t("render_l1n", lambda d, gx, gy: R.render_ao_level(
        d, 1, wp, cam, par, slopes_ds=(gx, gy)), ds1, *sp)
    t("render_l1", lambda d: R.render_ao_level(
        d, 1, wp, cam, AOParams(), None), ds1)

    t("pipe_n", lambda d, nn: ao_pipeline(d, cam, par, nn,
                                          impl="auto")[0], zd, nd)
    t("pipe", lambda d: ao_pipeline(d, cam, AOParams(), None,
                                    impl="auto")[0], zd)


if __name__ == "__main__":
    main()
