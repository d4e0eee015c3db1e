#!/usr/bin/env python
"""Streaming demo: PFM frames on disk -> prefetched batches -> AO frames.

    python examples/streaming.py [HxW] [n_frames] [out_dir]

Simulates a renderer dropping depth frames as PFM files, then drives the
engine over them with the native threaded loader one batch ahead of the
device (utils.frameio.FramePrefetcher).  Output: uint8 AO (the reference's
R8 render-texture format) for the last frame as PNG.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from tpuao.models.pipeline import AmbientOcclusionEngine
from tpuao.params import CameraParams
from tpuao.utils import fixtures as F
from tpuao.utils.frameio import FramePrefetcher, save_pfm
from tpuao.utils.io import save_ao_image


def main(argv):
    size = argv[1] if len(argv) > 1 else "360x640"
    n_frames = int(argv[2]) if len(argv) > 2 else 8
    if n_frames < 1:
        raise SystemExit("n_frames must be >= 1")
    out_dir = argv[3] if len(argv) > 3 else "/tmp/tpuao_stream"
    h, w = (int(v) for v in size.split("x"))
    batch = 2
    os.makedirs(out_dir, exist_ok=True)

    cam = CameraParams(depth_mode="linear")
    # "renderer output": one PFM per frame (camera orbits -> varied seeds)
    paths = []
    for i in range(n_frames):
        z = F.spheres_on_plane(h, w, cam, n_spheres=5, seed=100 + i)
        paths.append(save_pfm(f"{out_dir}/frame_{i:04d}.pfm", z))
    batches = [paths[i: i + batch] for i in range(0, len(paths), batch)]

    eng = AmbientOcclusionEngine(cam, out_dtype="uint8")
    t0 = time.perf_counter()
    done = 0
    for depth_batch in FramePrefetcher(batches, depth=2):
        ao = np.asarray(eng.render(depth_batch))  # (B, H, W) uint8
        done += ao.shape[0]
    dt = time.perf_counter() - t0
    save_ao_image(ao[-1] / 255.0, f"{out_dir}/ao_last.png")
    print(f"{done} frames at {h}x{w}: {dt:.2f}s wall "
          f"({done / dt:.1f} fps incl. decode+transfer), "
          f"wrote {out_dir}/ao_last.png")


if __name__ == "__main__":
    main(sys.argv)
