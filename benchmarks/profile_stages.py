#!/usr/bin/env python
"""Per-stage wall-clock profile of the frame program (SURVEY.md SS6
'Tracing / profiling': frame-debugger analog).

Usage: python benchmarks/profile_stages.py [HxW] [--normals] [--impl jnp]
Prints a table of ms per pipeline stage measured on the default backend
with the chained-device-time methodology (utils/profiling.py).

NOTE: the two-point RTT cancellation has a ~+-0.05 ms noise floor on the
relayed TPU backend, so sub-0.05 ms stages can read as small negative
numbers; treat those as "below measurement floor".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F
from tpuao.utils.profiling import stage_times_ms


def main(argv):
    size = next((a for a in argv if "x" in a and a[0].isdigit()), "1080x1920")
    h, w = (int(v) for v in size.split("x"))
    use_normals = "--normals" in argv
    impl = argv[argv.index("--impl") + 1] if "--impl" in argv else "jnp"

    cam = CameraParams(depth_mode="linear")
    params = AOParams(use_normals=use_normals)
    if use_normals:
        z, n = F.spheres_on_plane(h, w, n_spheres=6, seed=11,
                                  with_normals=True)
        nd = jax.device_put(jnp.asarray(n, jnp.float32))
    else:
        z = F.spheres_on_plane(h, w, n_spheres=6, seed=11)
        nd = None
    zd = jax.device_put(jnp.asarray(z, jnp.float32))

    print(f"# {h}x{w} impl={impl} normals={use_normals} "
          f"backend={jax.default_backend()}")
    times = stage_times_ms(zd, cam, params, normals=nd, impl=impl)
    total = times.pop("full_pipeline")
    for k, v in times.items():
        print(f"{k:16s} {v:8.4f} ms")
    print(f"{'-' * 28}")
    print(f"{'full_pipeline':16s} {total:8.4f} ms   "
          f"({h * w / 1e6 / (total / 1e3):,.0f} Mpix/s)")


if __name__ == "__main__":
    main(sys.argv[1:])
