#!/usr/bin/env python
"""End-to-end demo: ray-cast a scene, render AO, save PNGs.

    python examples/demo.py [HxW] [out_dir]

Produces depth.png, ao.png, ao_normals.png and a per-level debug strip in
out_dir (default /tmp/tpuao_demo).  Runs on whatever backend JAX picks
(TPU on the real chip; CPU elsewhere).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS even under the axon boot hook, which force-selects the
# TPU platform via jax.config (see CLAUDE.md)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from tpuao import AOParams, CameraParams, render_frame
from tpuao.utils import fixtures as F
from tpuao.utils.io import save_ao_image


def main(argv):
    size = argv[1] if len(argv) > 1 else "720x1280"
    out_dir = argv[2] if len(argv) > 2 else "/tmp/tpuao_demo"
    h, w = (int(v) for v in size.split("x"))
    os.makedirs(out_dir, exist_ok=True)

    cam = CameraParams(depth_mode="linear")
    depth, normals = F.spheres_on_plane(h, w, cam, n_spheres=6, seed=11,
                                        with_normals=True)
    save_ao_image(depth, f"{out_dir}/depth.png")

    ao, dbg = render_frame(depth, cam, AOParams(), debug_outputs=True)
    save_ao_image(np.asarray(ao), f"{out_dir}/ao.png")

    ao_n = render_frame(depth, cam, AOParams(use_normals=True),
                        normals=normals)
    save_ao_image(np.asarray(ao_n), f"{out_dir}/ao_normals.png")

    for l, a in dbg["ao_levels"].items():
        save_ao_image(np.asarray(a), f"{out_dir}/ao_level{l}.png")

    print(f"wrote {out_dir}: depth.png ao.png ao_normals.png "
          f"ao_level{{1..{len(dbg['ao_levels'])}}}.png")


if __name__ == "__main__":
    main(sys.argv)
