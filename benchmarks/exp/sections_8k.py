"""Measure 8K sequential-section execution vs the monolithic program.

VERDICT r2 next-item 1: render 8K as k halo-overlapped row sections
executed as separate program launches (parallel/sections.py), so each
section sits in the smaller-frame efficiency regime while keeping the
monolithic cross-stage fusion inside each launch.

Methodology guard: the sections mode is multi-launch, so it cannot be
timed by the on-device fori chain (device_time_ms).  We first time the
MONOLITHIC program both ways -- device_time_ms vs host_chain_time_ms --
and report the delta; agreement validates the host-driven chain before
any sections number is trusted.

Usage: python benchmarks/exp/sections_8k.py [k ...]   (default 2 3 4)
Env: SEC_RES=HxW overrides the frame (default 4320x7680).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tpuao.models.pipeline import ao_pipeline  # noqa: E402
from tpuao.parallel.sections import render_frame_sections  # noqa: E402
from tpuao.params import AOParams, CameraParams  # noqa: E402
from tpuao.utils import fixtures as F  # noqa: E402
from tpuao.utils.profiling import (  # noqa: E402
    device_time_ms,
    host_chain_time_ms,
)


def main():
    ks = [int(a) for a in sys.argv[1:]] or [2, 3, 4]
    res = os.environ.get("SEC_RES", "4320x7680")
    h, w = (int(v) for v in res.split("x"))
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    print(f"backend={jax.default_backend()} frame={h}x{w}", flush=True)

    z = F.spheres_on_plane(h, w, n_spheres=6, seed=11).astype(np.float32)
    zd = jax.device_put(jnp.asarray(z))

    mono = jax.jit(lambda d: ao_pipeline(d, cam, par, None, impl="auto")[0])
    ref = mono(zd)
    ref.block_until_ready()

    ms_dev, mn_dev = device_time_ms(mono, zd, return_min=True)
    print(json.dumps({"cfg": "monolithic_device_chain", "ms": round(ms_dev, 4),
                      "ms_min": round(mn_dev, 4)}), flush=True)
    ms_host, mn_host = host_chain_time_ms(mono, zd, return_min=True)
    print(json.dumps({"cfg": "monolithic_host_chain", "ms": round(ms_host, 4),
                      "ms_min": round(mn_host, 4),
                      "methodology_delta_ms": round(ms_host - ms_dev, 4)}),
          flush=True)

    from tpuao.parallel.sections import section_plan, sections_fused_fn
    from tpuao.parallel.spatial import stencil_halo_rows

    halo = stencil_halo_rows(par)
    for k in ks:
        # in-program sections: ONE launch, device-chain timed (the relay
        # charges ~6-10 ms per extra launch, so the separate-launch mode
        # below is hardware-realistic only off-relay).  Timed under both
        # scoped-VMEM size classes: the right budget for a section-shaped
        # program is an open question (sections sit between the 4K and 8K
        # calibration points).
        ha, band, _ = section_plan(h, k, halo)
        fn = sections_fused_fn(k, ha, band, halo, "auto")
        ff = lambda d: fn(d, cam, par)
        out = jax.jit(ff)(zd)[:h]
        err = float(jnp.abs(out - ref).max())
        del out
        for label, px in (("sec", (band + 2 * halo) * w),
                          ("frame", h * w)):
            ms, mn = device_time_ms(ff, zd, return_min=True, pixels=px)
            print(json.dumps({"cfg": f"sections_fused_k{k}_vmem_{label}",
                              "ms": round(ms, 4), "ms_min": round(mn, 4),
                              "max_abs_diff_vs_monolithic": err,
                              "mpix_s": round((h * w / 1e6) / (ms / 1e3),
                                              1)}),
                  flush=True)

    if os.environ.get("SEC_HOSTCHAIN") == "1":
        for k in ks:
            fn = lambda d, k=k: render_frame_sections(
                d, cam, par, n_sections=k, impl="auto")
            out = fn(zd)
            err = float(jnp.abs(out - ref).max())
            ms, mn = host_chain_time_ms(fn, zd, return_min=True)
            print(json.dumps({"cfg": f"sections_k{k}", "ms": round(ms, 4),
                              "ms_min": round(mn, 4),
                              "max_abs_diff_vs_monolithic": err,
                              "mpix_s": round((h * w / 1e6) / (ms / 1e3),
                                              1)}),
                  flush=True)
            del out


if __name__ == "__main__":
    main()
