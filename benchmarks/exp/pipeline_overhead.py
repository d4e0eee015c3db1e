#!/usr/bin/env python
"""Where does the in-pipeline overhead live?  (compile-metadata audit)

Per-stage standalone sums are ~70% of the full-pipeline time at every
resolution (1080p: chain 2x its stage sum; 8K: ~3 ms unaccounted).
Blind timing probes (optimization barriers, banding) haven't explained
it.  This script audits the COMPILED full program instead:

  * cost_analysis(): flops + bytes accessed, pipeline vs sum of stages
    (byte inflation == fusion duplication / extra materialization);
  * memory_analysis(): temp bytes (layout-padding hazard check);
  * optimized HLO: every fusion/copy/transpose/concatenate with >=1 MB
    output, so relayout passes are visible by name.

Run: python benchmarks/exp/pipeline_overhead.py [HxW] [--hlo]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from tpuao.models.pipeline import ao_pipeline
from tpuao.ops import render as R
from tpuao.ops import upsample as U
from tpuao.ops.prepare import linearize_depth, build_pyramid
from tpuao.params import AOParams, CameraParams, padded_shape
from tpuao.utils.xla_opts import tpu_compiler_options


def audit(name, fn, *args):
    lowered = jax.jit(fn).lower(*args)
    comp = lowered.compile(compiler_options=tpu_compiler_options())
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ma = comp.memory_analysis()
    flops = ca.get("flops", 0.0)
    byt = ca.get("bytes accessed", 0.0)
    out = ca.get("bytes accessed output {}", 0.0)
    print(f"{name:22s} flops {flops/1e9:8.3f} G   bytes {byt/2**30:8.3f} GiB"
          f"   out {out/2**20:8.1f} MiB   temp "
          f"{ma.temp_size_in_bytes/2**20:8.1f} MiB", flush=True)
    return comp, byt


def hlo_big_ops(comp, min_mb=1.0):
    txt = comp.as_text()
    # entry computation only -- ops inside %fused_computation bodies are
    # fused (not materialized) and must not be counted
    m = re.search(r"^ENTRY .*?^\}", txt, re.M | re.S)
    if m:
        txt = m.group(0)
    pat = re.compile(
        r"^\s*(?:ROOT )?%?([\w.-]+) = (f32|bf16|u8|s32)\[([\d,]*)\][^ ]* "
        r"(fusion|copy|transpose|concatenate|slice|pad|reshape|"
        r"bitcast|convert)\(", re.M)
    rows = []
    for m in pat.finditer(txt):
        dims = [int(d) for d in m.group(3).split(",") if d]
        nbytes = np.prod(dims) * (1 if m.group(2) == "u8" else 4) if dims \
            else 0
        if nbytes >= min_mb * 2**20:
            rows.append((nbytes, m.group(1), m.group(4),
                         "x".join(map(str, dims))))
    rows.sort(reverse=True)
    for nb, nm, kind, shape in rows[:60]:
        print(f"  {nb/2**20:8.1f} MiB  {kind:12s} {shape:20s} {nm}")
    kinds = {}
    for nb, nm, kind, shape in rows:
        kinds[kind] = kinds.get(kind, 0) + nb
    print("  totals:", {k: f"{v/2**20:.0f} MiB" for k, v in kinds.items()},
          flush=True)


def main(argv):
    size = next((a for a in argv if "x" in a and a[0].isdigit()),
                "1080x1920")
    h0, w0 = (int(v) for v in size.split("x"))
    hp, wp = padded_shape(h0, w0)
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    d = 4
    zs = jax.ShapeDtypeStruct((h0, w0), jnp.float32)

    comp, pipe_bytes = audit(
        "full_pipeline",
        lambda z: ao_pipeline(z, cam, par, None, impl="jnp")[0], zs)
    if "--pipe-only" in argv:
        print("# big ops in optimized pipeline HLO (entry only)")
        hlo_big_ops(comp)
        return

    # stages on padded shapes (what the pipeline runs internally)
    zp = jax.ShapeDtypeStruct((hp, wp), jnp.float32)

    def prep(z):
        return tuple(build_pyramid(linearize_depth(z, cam), d))

    _, b = audit("prepare", prep, zp)
    tot = b
    shapes = [jax.ShapeDtypeStruct((hp >> l, wp >> l), jnp.float32)
              for l in range(d + 1)]
    for l in range(1, d + 1):
        _, b = audit(f"render_l{l}",
                     lambda x, l=l: R.render_ao_level(x, l, wp, cam, par),
                     shapes[l])
        tot += b
    for l in range(d, 0, -1):
        def step(a, lo_d, hi_d, l=l):
            a2 = a * 0.9 if l != d else None
            return U.blur_upsample_step(a, lo_d, hi_d, par, wp, lo_ao2=a2)
        _, b = audit(f"upsample_l{l}", step, shapes[l], shapes[l],
                     shapes[l - 1])
        tot += b
    print(f"{'stage_sum':22s} {'':20s}  bytes {tot/2**30:8.3f} GiB "
          f"(pipeline {pipe_bytes/2**30:.3f} GiB = "
          f"{pipe_bytes/max(tot,1):.2f}x)")

    if "--hlo" in argv:
        print("# big ops in optimized pipeline HLO")
        hlo_big_ops(comp)


if __name__ == "__main__":
    main(sys.argv[1:])
