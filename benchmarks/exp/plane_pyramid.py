"""Plane-resident depth pyramid experiment (VERDICT r2 next-item 2).

The closed r2 question was keeping the *AO* chain in parity planes
(algebraic no: upsample taps read the whole lo field).  The DEPTH side is
different: every chain step re-derives the hi-depth parity planes by
strided slicing inside the fused chain (`ops/upsample.py`
_bilateral_upsample2x_ext), and the entry-HLO audit attributes ~54 MiB of
relayout copies to the chain region.  Here the pyramid's parity planes
are built ONCE in prepare (pick-one downsampling composes exactly with
parity decomposition: plane00 of level l IS level l+1, so only the three
sibling planes are new work) and fed to the steps directly.

Reports ms + temp bytes for the baseline and plane-fed pipelines at
1080p / 4K / 8K, and the max-abs-diff (expected 0: identical values,
different slicing site).

Usage: python benchmarks/exp/plane_pyramid.py [1080p|4k|8k ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tpuao.models.pipeline import _pad_to_64, ao_pipeline  # noqa: E402
from tpuao.ops import prepare as P  # noqa: E402
from tpuao.ops import render as R  # noqa: E402
from tpuao.ops import upsample as U  # noqa: E402
from tpuao.params import AOParams, CameraParams, padded_shape  # noqa: E402
from tpuao.utils import fixtures as F  # noqa: E402
from tpuao.utils.profiling import device_time_ms  # noqa: E402

RES = {"1080p": (1080, 1920), "4k": (2160, 3840), "8k": (4320, 7680)}


def plane_pipeline(depth, camera, params):
    """ao_pipeline (jnp, depth-only, blur) with prepare-built hi planes."""
    h0, w0 = depth.shape[-2:]
    hp, wp = padded_shape(h0, w0)
    depth = _pad_to_64(depth.astype(jnp.float32), hp, wp)
    d = params.hierarchy_depth
    linz = P.linearize_depth(depth, camera)
    pyr = P.build_pyramid(linz, d)
    # parity planes of levels 0..d-1 (the chain's hi sides), (p,q) order;
    # plane00 == the next pyramid level by pick-one composition
    hip = {}
    for l in range(d):
        even = pyr[l][..., 0::2, :]
        odd = pyr[l][..., 1::2, :]
        hip[l] = (pyr[l + 1], even[..., :, 1::2],
                  odd[..., :, 0::2], odd[..., :, 1::2])
    aos = {l: R.render_ao_level(pyr[l], l, wp, camera, params, None)
           for l in range(1, d + 1)}
    combined = aos[d]
    for l in range(d, 0, -1):
        combined = U.blur_upsample_step(
            combined, pyr[l], pyr[l - 1], params, wp,
            lo_ao2=aos[l] if l != d else None,
            hi_planes=hip[l - 1],
            **({"crop_hw": (h0, w0)} if l == 1 else {}))
    return combined


def main():
    names = sys.argv[1:] or ["1080p", "4k", "8k"]
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    print(f"backend={jax.default_backend()}", flush=True)
    base = lambda z: ao_pipeline(z, cam, par, None, impl="jnp")[0]
    plane = lambda z: plane_pipeline(z, cam, par)

    for name in names:
        h, w = RES[name]
        z = F.spheres_on_plane(h, w, n_spheres=6, seed=11).astype(np.float32)
        zd = jax.device_put(jnp.asarray(z))
        row = {"cfg": name}
        a = jax.jit(base)(zd)
        b = jax.jit(plane)(zd)
        row["max_abs_diff"] = float(jnp.abs(a - b).max())
        del a, b
        for label, fn in (("base", base), ("plane", plane)):
            ms, mn = device_time_ms(fn, zd, return_min=True)
            mem = jax.jit(fn).lower(zd).compile().memory_analysis()
            row[f"{label}_ms"] = round(ms, 4)
            row[f"{label}_ms_min"] = round(mn, 4)
            if mem is not None:
                row[f"{label}_temp_mb"] = round(
                    mem.temp_size_in_bytes / 1e6, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
