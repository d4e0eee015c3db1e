"""Blind-but-cheap XLA TPU flag sweep on the 1080p headline program.

The r2 scoped-VMEM win came from sweeping a compiler knob; this probes a
handful of other plausibly-relevant flags (copy insertion / fusion cost
/ vmem scavenging -- the measured overhead is relayout copies around the
chain interleaves).  Unknown flags fail compile fast and are reported as
REJECTED, so guessing is cheap.  Each candidate is timed against the
shipped baseline in the same process.

Usage: python benchmarks/exp/flag_sweep.py [HxW]
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
from tpuao.utils.xla_opts import scoped_vmem_kib

CANDIDATES = [
    {},  # baseline (shipped scoped-VMEM only)
    {"xla_tpu_scavenge_vmem_for_fusions": "true"},
    {"xla_tpu_copy_insertion_use_region_analysis": "true"},
    {"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    {"xla_tpu_enable_dma_deadlock_avoidance_checking": "false"},
    {"xla_tpu_enable_aggressive_instruction_fusion": "true"},
    {"xla_tpu_rwb_fusion": "true"},
    {"xla_tpu_licm_size_inflation_ratio": "2"},
    {"xla_tpu_copy_fusion_pad_unpad_ratio": "10"},
    {"xla_tpu_vector_load_fusion_scope": "2"},
]


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "1080x1920"
    h, w = (int(v) for v in size.split("x"))
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    z = F.spheres_on_plane(h, w, n_spheres=6, seed=11).astype(np.float32)
    zd = jax.device_put(jnp.asarray(z, jnp.float32))
    base_kib = str(scoped_vmem_kib(h * w))
    print(f"backend={jax.default_backend()} {h}x{w} "
          f"base_vmem={base_kib}", flush=True)

    import time

    def chained(iters, a):
        def body(i, c):
            out = ao_pipeline(a + c * 1e-20, cam, par, None,
                              impl="auto")[0]
            return jnp.sum(out) * jnp.float32(1e-20)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    for extra in CANDIDATES:
        opts = {"xla_tpu_scoped_vmem_limit_kib": base_kib, **extra}
        label = ",".join(f"{k.replace('xla_tpu_', '')}={v}"
                         for k, v in extra.items()) or "baseline"
        fj = jax.jit(chained, static_argnums=0, compiler_options=opts)
        try:
            float(fj(1, zd))
        except Exception as e:
            print(f"{label:55s} REJECTED {str(e)[:90]}", flush=True)
            continue
        t0 = time.perf_counter()
        float(fj(1, zd))
        t1 = time.perf_counter() - t0
        iters = max(int(400.0 / max(t1 * 1e3, 0.5)), 100)
        samples = []
        for _ in range(3):
            t1s = []
            for _ in range(2):
                t0 = time.perf_counter()
                float(fj(1, zd))
                t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(fj(iters, zd))
            tn = time.perf_counter() - t0
            samples.append((tn - min(t1s)) / (iters - 1) * 1e3)
        print(f"{label:55s} {float(np.median(samples)):.4f} ms "
              f"(min {min(samples):.4f})", flush=True)


if __name__ == "__main__":
    main()
