#!/usr/bin/env python
"""Probe: XLA fusion vs Pallas row-tiled kernels at 8K stage sizes.

The 8K per-stage profile shows render_l1 scaling 41x from 1080p (16x
pixels) and upsample_l1 29x -- the XLA fusions go traffic-bound when the
level buffer outgrows what the fusion can stage (each of the 68 shifted
windows re-reads HBM).  The Pallas kernels tile rows through VMEM
explicitly; they measured on-par-or-slower at 1080p (CLAUDE.md) but that
verdict may invert at 8K.  Also probes the prepare stage pieces.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from tpuao.ops import render as R
from tpuao.ops import upsample as U
from tpuao.ops import pallas_kernels as PK
from tpuao.ops.prepare import linearize_depth, build_pyramid
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F
from tpuao.utils.profiling import device_time_ms

H, W = 4320, 7680  # 8K


def main():
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    z = F.spheres_on_plane(H, W, n_spheres=6, seed=11)
    zd = jax.device_put(jnp.asarray(z, jnp.float32))

    linz = jax.jit(lambda x: linearize_depth(x, cam))(zd)
    pyr = [jnp.asarray(p) for p in
           jax.jit(lambda x: tuple(build_pyramid(x, 4)))(linz)]
    rng = np.random.default_rng(0)
    lo1 = jnp.asarray(rng.uniform(0.3, 1.0, pyr[1].shape), jnp.float32)

    print("# render level 1 (2160x3840)")
    ms = device_time_ms(
        lambda d: R.render_ao_level(d, 1, W, cam, par), pyr[1])
    print(f"xla            {ms:8.4f} ms")
    for rt in (64, 128, 256):
        ms = device_time_ms(
            lambda d, rt=rt: PK.render_ao_level(d, 1, W, cam, par,
                                                row_tile=rt), pyr[1])
        print(f"pallas rt={rt:<4d} {ms:8.4f} ms")

    print("# blur+upsample level 1 (2160x3840 -> 4320x7680)")
    ms = device_time_ms(
        lambda a, ld, hd: U.blur_upsample_step(a, ld, hd, par, W,
                                               lo_ao2=a * 0.9),
        lo1, pyr[1], pyr[0])
    print(f"xla            {ms:8.4f} ms")
    ms = device_time_ms(
        lambda a, ld, hd: PK.blur_upsample_step(a, ld, hd, par, W,
                                                lo_ao2=a * 0.9),
        lo1, pyr[1], pyr[0])
    print(f"pallas         {ms:8.4f} ms")

    print("# prepare pieces (4320x7680)")
    ms = device_time_ms(lambda x: linearize_depth(x, cam), zd)
    print(f"linearize      {ms:8.4f} ms")
    ms = device_time_ms(lambda x: tuple(build_pyramid(x, 4)), linz)
    print(f"pyramid        {ms:8.4f} ms")
    ms = device_time_ms(lambda x: tuple(build_pyramid(linearize_depth(
        x, cam), 4)), zd)
    print(f"lin+pyramid    {ms:8.4f} ms")


if __name__ == "__main__":
    main()
