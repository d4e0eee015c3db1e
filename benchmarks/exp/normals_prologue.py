#!/usr/bin/env python
"""Probe: cost of the normals input prologue at 1080p.

The stage profile shows full_pipeline ~0.29 ms above the sum of its stages
with normals on; the suspects are the (H, W, 3) input layout (minor dim 3
tiles badly on TPU) and the pad->transpose order in ao_pipeline.  Times:

  read      - jnp.sum over the (H, W, 3) param (pure read cost)
  pad_mv    - pad in (H, W, 3) then moveaxis to (3, H, W)   [shipped order]
  mv_pad    - moveaxis first, pad in (3, H, W)
  slices    - three (H, W) channel slices, stack to (3, H, W)
  cf_pad    - channel-first (3, H, W) input, pad only        [layout ideal]
  prep      - full normals prologue + 4-level pyramid, both orders
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from tpuao.utils import fixtures as F
from tpuao.utils.profiling import device_time_ms

H, W = 1080, 1920
HP, WP = 1088, 1920


def pyramid(cf):  # (3, H, W) channel-first planes
    out = [cf]
    for _ in range(4):
        out.append(out[-1][..., 0::2, :][..., :, 0::2])
    return tuple(out)


def main():
    _, n = F.spheres_on_plane(H, W, n_spheres=6, seed=11, with_normals=True)
    nhw3 = jax.device_put(jnp.asarray(n, jnp.float32))
    n3hw = jax.device_put(jnp.asarray(np.moveaxis(n, -1, 0), jnp.float32))

    def pad_mv(x):
        p = jnp.pad(x, [(0, HP - H), (0, WP - W), (0, 0)], mode="edge")
        return jnp.moveaxis(p, -1, -3)

    def mv_pad(x):
        m = jnp.moveaxis(x, -1, -3)
        return jnp.pad(m, [(0, 0), (0, HP - H), (0, WP - W)], mode="edge")

    def slices(x):
        chans = [jnp.pad(x[..., c], [(0, HP - H), (0, WP - W)], mode="edge")
                 for c in range(3)]
        return jnp.stack(chans, axis=0)

    def cf_pad(x):
        return jnp.pad(x, [(0, 0), (0, HP - H), (0, WP - W)], mode="edge")

    for name, fn, arg in (
            ("read", lambda x: jnp.sum(x)[None, None], nhw3),
            ("pad_mv", pad_mv, nhw3),
            ("mv_pad", mv_pad, nhw3),
            ("slices", slices, nhw3),
            ("cf_pad", cf_pad, n3hw),
            ("prep(pad_mv)", lambda x: pyramid(pad_mv(x)), nhw3),
            ("prep(mv_pad)", lambda x: pyramid(mv_pad(x)), nhw3),
            ("prep(slices)", lambda x: pyramid(slices(x)), nhw3),
            ("prep(cf)", lambda x: pyramid(cf_pad(x)), n3hw),
    ):
        ms = device_time_ms(fn, arg)
        print(f"{name:14s} {ms:8.4f} ms")


if __name__ == "__main__":
    main()
