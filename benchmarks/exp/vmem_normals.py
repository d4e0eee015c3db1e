"""Scoped-VMEM sweep for the NORMALS pipeline (the r2 sweep that set the
size classes in utils/xla_opts.py was depth-only; the normals program
carries two extra full-res planes through the render fusions, so its
optimum may differ).

Usage: VMEM_KIBS=16384,20480,32768 python benchmarks/exp/vmem_normals.py
       [1080p|4k|8k ...]

VMEM_KIBS picks the budgets (KiB); the default list covers the small-
frame candidates — for 8k pass the 16-24 MiB region explicitly (the
measured 8K+normals optimum is 16 MiB, see utils/xla_opts.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F
from tpuao.utils.profiling import device_time_ms

RES = {"1080p": (1080, 1920), "4k": (2160, 3840), "8k": (4320, 7680)}


def main():
    names = sys.argv[1:] or ["4k", "1080p"]
    cam = CameraParams(depth_mode="linear")
    par = AOParams(use_normals=True)
    print(f"backend={jax.default_backend()}", flush=True)
    for name in names:
        h, w = RES[name]
        z, n = F.spheres_on_plane(h, w, n_spheres=6, seed=11,
                                  with_normals=True)
        zd = jax.device_put(jnp.asarray(z, jnp.float32))
        nd = jax.device_put(jnp.asarray(n, jnp.float32))
        for kib in [int(v) for v in os.environ.get("VMEM_KIBS", "32768,49152,65536,98304,131072").split(",")]:
            def chained(iters, a, b):
                def body(i, c):
                    out = ao_pipeline(a + c * 1e-20, cam, par, b,
                                      impl="auto")[0]
                    return jnp.sum(out) * jnp.float32(1e-20)
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

            import time

            fj = jax.jit(chained, static_argnums=0, compiler_options={
                "xla_tpu_scoped_vmem_limit_kib": str(kib)})
            try:
                float(fj(1, zd, nd))
            except Exception as e:
                print(f"{name} vmem={kib//1024}MiB FAILED {str(e)[:80]}",
                      flush=True)
                continue
            t0 = time.perf_counter()
            float(fj(1, zd, nd))
            t1 = time.perf_counter() - t0
            iters = max(int(400.0 / max((t1 * 1e3), 0.5)), 50)
            samples = []
            for _ in range(3):
                t1s = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    float(fj(1, zd, nd))
                    t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(fj(iters, zd, nd))
                tn = time.perf_counter() - t0
                samples.append((tn - min(t1s)) / (iters - 1) * 1e3)
            print(f"{name} vmem={kib//1024}MiB "
                  f"{float(np.median(samples)):.4f} ms "
                  f"(min {min(samples):.4f})", flush=True)


if __name__ == "__main__":
    main()
