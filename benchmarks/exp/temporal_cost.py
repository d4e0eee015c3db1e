"""Measure the temporal-resolve cost on the real chip (r4).

Questions:
  1. What does the static-camera resolve add to a 1080p frame? (expected
     ~free: pure fused elementwise)
  2. What does the moving-camera resolve add? (the 4 bilinear history
     gathers are the first data-dependent gathers in the codebase --
     TPU gather throughput is the unknown being measured)
  3. What does the scan-based sequence save vs per-frame launches?
     (per-launch tax on this relay is ~3.3 ms, docs/PERF.md)

Usage: python benchmarks/exp/temporal_cost.py [HxW]
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
    tp = TemporalParams()
    z = jnp.asarray(F.spheres_on_plane(h, w, n_spheres=6, seed=1),
                    jnp.float32)
    prev_ao, prev_d = T.initial_state(h, w)
    prev_d = jnp.asarray(z)  # realistic agreeing history
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 0.05  # small lateral dolly: generic gather coordinates
    motion = jnp.asarray(m)

    base = device_time_ms(
        lambda d: ao_pipeline(d, cam, par, None)[0], z)
    print(f"frame only                  {base:7.3f} ms", flush=True)

    stat = device_time_ms(
        lambda d: _temporal_frame_core(d, prev_ao, prev_d, None, cam, par,
                                       tp, None, None, "auto", "float32"),
        z)
    print(f"frame + resolve (static)    {stat:7.3f} ms  "
          f"(+{stat - base:.3f})", flush=True)

    mov = device_time_ms(
        lambda d: _temporal_frame_core(d, prev_ao, prev_d, motion, cam,
                                       par, tp, None, None, "auto",
                                       "float32"),
        z)
    print(f"frame + resolve (motion R={tp.max_displacement})"
          f"    {mov:7.3f} ms  (+{mov - base:.3f})", flush=True)

    # resolve in isolation: static, windowed ladder, true gather
    riso_s = device_time_ms(
        lambda a: T.temporal_resolve(a, z, prev_ao, prev_d, cam, tp, None),
        prev_ao)
    print(f"resolve alone static        {riso_s:7.3f} ms", flush=True)
    for r in (2, 4, 8, None):
        tpr = TemporalParams(max_displacement=r)
        ms = device_time_ms(
            lambda a, tpr=tpr: T.temporal_resolve(a, z, prev_ao, prev_d,
                                                  cam, tpr, motion),
            prev_ao)
        label = "gather (R=None)" if r is None else f"windowed R={r}"
        print(f"resolve alone {label:16s} {ms:7.3f} ms", flush=True)

    # scan sequence: per-frame rate at T=8
    t_n = 8
    depths = jnp.stack([z * (1.0 + 1e-4 * i) for i in range(t_n)])
    motions = jnp.stack([motion] * t_n)
    seq = device_time_ms(
        lambda ds: _sequence_scan_core(ds, motions, None, cam, par, tp,
                                       "auto", "float32"),
        depths)
    print(f"scan sequence (T={t_n})        {seq:7.3f} ms total = "
          f"{seq / t_n:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
