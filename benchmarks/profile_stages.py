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

    # per-stage attainable floors (VERDICT r3 item 3): algebraic traffic
    # at the MEASURED achievable bandwidth -- the honest per-stage
    # speed-of-light.  Stages are measured STANDALONE here; their sum
    # exceeding the pipeline time means cross-stage fusion wins (and the
    # reverse would mean the pipeline adds relayouts the stages lack).
    from tpuao.params import padded_shape
    from tpuao.utils import roofline as RL

    hp, wp = padded_shape(h, w)
    floors = RL.stage_traffic_bytes(hp, wp, params.hierarchy_depth,
                                    use_normals=use_normals,
                                    enable_blur=params.enable_blur)
    bw = RL.HBM_GBPS_ACHIEVED * 1e6
    print(f"{'stage':16s} {'ms':>8s} {'floor':>8s} {'pct':>5s}")
    for k, v in times.items():
        fl = floors.get(k, 0) / bw
        pct = f"{100 * fl / v:4.0f}%" if v > 1e-4 and fl else "   --"
        print(f"{k:16s} {v:8.4f} {fl:8.4f} {pct}")
    print(f"{'-' * 40}")
    fl_tot = sum(floors.values()) / bw
    print(f"{'stage sum':16s} {sum(times.values()):8.4f} {fl_tot:8.4f}")
    print(f"{'full_pipeline':16s} {total:8.4f} {fl_tot:8.4f} "
          f"{100 * fl_tot / total:4.0f}%   "
          f"({h * w / 1e6 / (total / 1e3):,.0f} Mpix/s)")


if __name__ == "__main__":
    main(sys.argv[1:])
