"""Is config 5's +2.6%/view overhead the lax.scan structure itself?

Compares, for an 8-view 1080p batch on one chip:
  scan8   - lax.scan of the unbatched program, unroll=8 (shipped form)
  loop8   - python loop + jnp.stack (no scan at all)
  single  - one frame, x8 (the lower bound)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F
from tpuao.utils.profiling import device_time_ms


def main():
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    z = F.spheres_on_plane(1080, 1920, n_spheres=6, seed=11
                           ).astype(np.float32)
    zs = jax.device_put(jnp.asarray(np.stack([z] * 8), jnp.float32))
    zd = jax.device_put(jnp.asarray(z, jnp.float32))
    print(f"backend={jax.default_backend()}", flush=True)

    def one(d):
        return ao_pipeline(d, cam, par, None, impl="auto")[0]

    def scan8(d):
        return lax.scan(lambda c, x: (c, one(x)), None, d, unroll=8)[1]

    def loop8(d):
        return jnp.stack([one(d[i]) for i in range(8)])

    ms1 = device_time_ms(one, zd)
    print(f"single      {ms1:.4f} ms/frame", flush=True)
    for name, fn in (("scan8", scan8), ("loop8", loop8)):
        ms = device_time_ms(fn, zs)
        print(f"{name:11s} {ms:.4f} ms total = {ms/8:.4f} ms/view "
              f"({100*(ms/8/ms1-1):+.1f}% vs single)", flush=True)


if __name__ == "__main__":
    main()
