#!/usr/bin/env python
"""Probe: UNROLLED static-slice row bands for the big-buffer stages.

docs/PERF.md '8K': above a few Mpix the whole-level XLA fusion goes
HBM-bound (each of the 68 shifted windows re-reads the buffer once the
level outgrows the fusion's VMEM staging).  The lax.map banded render
fixes the standalone stage (3.50 -> 2.89 ms) but LOSES in-pipeline
(11.17 -> 11.51 ms): jnp.stack materializes a banded copy and lax.map is
a fusion barrier.

This probes the third form: a PYTHON-UNROLLED loop of static slices of
the parity-padded buffer, one fusion per band, jnp.concatenate at the
end -- no stacked copy, no lax.map opacity, each band's working set
VMEM-stageable.  Same for the full-res chain step (upsample_l1), banding
the extended lo fields with a 1-row halo.

Run: python benchmarks/exp/band_unroll.py [HxW]
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
from tpuao.ops.render import HALO, _pair_constants, _render_core
from tpuao.ops.prepare import linearize_depth, build_pyramid, pad_parity4
from tpuao.params import (AOParams, CameraParams, padded_shape,
                          sphere_radius_coef, upsample_constants)
from tpuao.utils import fixtures as F
from tpuao.utils.profiling import device_time_ms


def render_banded_unrolled(ds, level, full_width, camera, params,
                           band_rows=256):
    ds = ds.astype(jnp.float32)
    pairs = _pair_constants(params)
    rc = sphere_radius_coef(level, full_width, camera.tan_half_fov_h,
                            params.screenspace_diameter)
    h, w = ds.shape
    zp = pad_parity4(ds, HALO)
    outs = []
    for r0 in range(0, h, band_rows):
        bh = min(band_rows, h - r0)
        band = zp[r0: r0 + bh + 2 * HALO, :]
        outs.append(_render_core(band, bh, w, pairs, rc, params))
    return jnp.concatenate(outs, axis=-2) if len(outs) > 1 else outs[0]


def chain_step_banded(lo_ao, lo_d, hi_d, params, full_width,
                      lo_ao2=None, band_rows=256):
    """blur_upsample_step with the lo-res fields processed in row bands.

    Bit-path: identical math; noise filter gets a 1-row halo per band and
    crops it, so band boundaries see real neighbors (edge clamp only at
    the true frame edge, same as the whole-field form).
    """
    if lo_ao2 is not None:
        lo_ao = jnp.minimum(lo_ao, lo_ao2)
    _, k_blur, k_up, nfs = upsample_constants(params, full_width,
                                              lo_d.shape[-1])
    pad = [(0, 1), (0, 1)]
    ap = jnp.pad(lo_ao.astype(jnp.float32), pad, mode="edge")
    dp = jnp.pad(lo_d.astype(jnp.float32), pad, mode="edge")
    lh, lw = lo_d.shape
    hi_d = hi_d.astype(jnp.float32)
    outs = []
    for r0 in range(0, lh, band_rows):
        bh = min(band_rows, lh - r0)
        # noise-filter halo: 1 row each side, cropped after
        t0 = max(r0 - 1, 0)
        t1 = min(r0 + bh + 2, lh + 1)
        f = U.noise_filter(ap[t0:t1], dp[t0:t1], nfs)
        f = f[r0 - t0: r0 - t0 + bh + 1]
        d_ext = dp[r0: r0 + bh + 1]
        hi = hi_d[2 * r0: 2 * (r0 + bh)]
        outs.append(U._bilateral_upsample2x_ext(f, d_ext, hi, k_blur, k_up))
    return jnp.concatenate(outs, axis=-2) if len(outs) > 1 else outs[0]


def main(argv):
    stages = [a for a in argv if a in ("render", "chain")] or ["render",
                                                              "chain"]
    size = next((a for a in argv if "x" in a and a[0].isdigit()),
                "4320x7680")
    h, w = (int(v) for v in size.split("x"))
    hp, wp = padded_shape(h, w)
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    z = F.spheres_on_plane(hp, wp, n_spheres=6, seed=11)
    zd = jax.device_put(jnp.asarray(z, jnp.float32))

    linz = jax.jit(lambda x: linearize_depth(x, cam))(zd)
    pyr = [jnp.asarray(p) for p in
           jax.jit(lambda x: tuple(build_pyramid(x, 4)))(linz)]
    rng = np.random.default_rng(0)
    lo1 = jnp.asarray(rng.uniform(0.3, 1.0, pyr[1].shape), jnp.float32)
    lo2 = jnp.asarray(rng.uniform(0.3, 1.0, pyr[1].shape), jnp.float32)

    if "render" in stages:
        print(f"# render level 1 ({pyr[1].shape[0]}x{pyr[1].shape[1]})",
              flush=True)
        ms = device_time_ms(
            lambda d: R.render_ao_level(d, 1, wp, cam, par), pyr[1])
        print(f"xla whole        {ms:8.4f} ms", flush=True)
        ref = np.asarray(jax.jit(
            lambda d: R.render_ao_level(d, 1, wp, cam, par))(pyr[1]))
        for br in (256, 512):
            fn = jax.jit(lambda d, br=br: render_banded_unrolled(
                d, 1, wp, cam, par, band_rows=br))
            got = np.asarray(fn(pyr[1]))
            err = np.abs(got - ref).max()
            ms = device_time_ms(
                lambda d, br=br: render_banded_unrolled(
                    d, 1, wp, cam, par, band_rows=br), pyr[1])
            print(f"unroll br={br:<4d}   {ms:8.4f} ms   err {err:.2e}",
                  flush=True)

    if "chain" in stages:
        print(f"# chain step l1 ({pyr[1].shape} -> {pyr[0].shape})",
              flush=True)
        ms = device_time_ms(
            lambda a, a2, ld, hd: U.blur_upsample_step(a, ld, hd, par, wp,
                                                       lo_ao2=a2),
            lo1, lo2, pyr[1], pyr[0])
        print(f"xla whole        {ms:8.4f} ms", flush=True)
        ref = np.asarray(jax.jit(
            lambda a, a2, ld, hd: U.blur_upsample_step(a, ld, hd, par, wp,
                                                       lo_ao2=a2))(
            lo1, lo2, pyr[1], pyr[0]))
        for br in (256, 512):
            fn = jax.jit(lambda a, a2, ld, hd, br=br: chain_step_banded(
                a, ld, hd, par, wp, lo_ao2=a2, band_rows=br))
            got = np.asarray(fn(lo1, lo2, pyr[1], pyr[0]))
            err = np.abs(got - ref).max()
            ms = device_time_ms(
                lambda a, a2, ld, hd, br=br: chain_step_banded(
                    a, ld, hd, par, wp, lo_ao2=a2, band_rows=br),
                lo1, lo2, pyr[1], pyr[0])
            print(f"unroll br={br:<4d}   {ms:8.4f} ms   err {err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
