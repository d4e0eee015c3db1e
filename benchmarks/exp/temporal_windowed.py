"""Measure the scan-form windowed temporal resolve on the real chip (r4).

Context (benchmarks/exp/temporal_cost.py, same session): the UNROLLED
(2R+2)^2 tent-sum broke the toolchain -- ~10-min remote compiles, a hard
"Failed to serialize TpuExecutableProto (2.7 GB)" at R=4 standalone, and
+6.9 ms in-frame at R=4 when it did compile.  The true-gather path costs
~47 ms at 1080p.  This probe measures the shipped ``lax.scan`` +
``dynamic_slice`` form: standalone R ladder, in-frame cost, sequence rate.

Usage: python benchmarks/exp/temporal_windowed.py [HxW]
"""

import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, ".")

from tpuao.models.pipeline import (  # noqa: E402
    _sequence_scan_core,
    _temporal_frame_core,
    ao_pipeline,
)
from tpuao.ops import temporal as T  # noqa: E402
from tpuao.params import AOParams, CameraParams, TemporalParams  # noqa: E402
from tpuao.utils import fixtures as F  # noqa: E402
from tpuao.utils.profiling import device_time_ms  # noqa: E402


def main():
    shape = (1080, 1920)
    if len(sys.argv) > 1:
        h, w = sys.argv[1].split("x")
        shape = (int(h), int(w))
    h, w = shape
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    z = jnp.asarray(F.spheres_on_plane(h, w, n_spheres=6, seed=1),
                    jnp.float32)
    prev_ao, _ = T.initial_state(h, w)
    prev_d = jnp.asarray(z)
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 0.05
    motion = jnp.asarray(m)

    base = device_time_ms(lambda d: ao_pipeline(d, cam, par, None)[0], z)
    print(f"frame only                    {base:7.3f} ms", flush=True)

    for r in (2, 4, 8):
        tpr = TemporalParams(max_displacement=r)
        ms = device_time_ms(
            lambda a, tpr=tpr: T.temporal_resolve(a, z, prev_ao, prev_d,
                                                  cam, tpr, motion),
            prev_ao)
        print(f"resolve alone scan R={r}   {ms:8.3f} ms "
              f"({(2 * r + 2) ** 2} taps)", flush=True)

    tp = TemporalParams()
    ms_m = device_time_ms(
        lambda d: _temporal_frame_core(d, prev_ao, prev_d, motion, cam,
                                       par, tp, None, None, "auto",
                                       "float32"), z)
    print(f"frame + resolve (R={tp.max_displacement})  {ms_m:10.3f} ms  "
          f"(+{ms_m - base:.3f})", flush=True)

    t_n = 8
    depths = jnp.stack([z * (1.0 + 1e-4 * i) for i in range(t_n)])
    motions = jnp.stack([motion] * t_n)
    seq = device_time_ms(
        lambda ds: _sequence_scan_core(ds, motions, None, cam, par, tp,
                                       "auto", "float32"), depths)
    print(f"scan sequence (T={t_n})  {seq:10.3f} ms total = "
          f"{seq / t_n:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
