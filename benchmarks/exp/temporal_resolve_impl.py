"""XLA row-scan vs Pallas VMEM-tile windowed resolve on the real chip (r4).

The moving-camera history resample has two bit-compatible forms: the
shipped XLA row-offset scan (``ops/temporal.py::_bilinear_windowed2``)
and the Pallas kernel (``pallas_kernels.windowed_resolve``) that holds a
(2, row_tile+2p, W+2p) history window VMEM-resident and reads the
history from HBM once per texel (the scan form re-streams the
accumulator carry every scan step).  This probe times both STANDALONE at
1080p (jitted, chain-timed) and checks on-chip parity.

STATUS (r4, unresolved): two runs on the live chip never returned from
the FIRST remote compile (frozen rchar at 0% CPU for 12+ min -- the
CLAUDE.md hung-compile signature; one kill+retry also stalled before
the round ended).  The XLA row-scan form remains the measured shipped
default (BENCH_DETAIL `temporal_1080p`: +1.90 ms in-frame at R=4); the
Pallas kernel is wired (`impl="pallas"`) and parity-tested in
interpret mode but has NO on-chip timing yet.  Re-run this probe when
the relay cooperates before considering an auto-impl flip.

Usage: python benchmarks/exp/temporal_resolve_impl.py [HxW] [R]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpuao.params import CameraParams, TemporalParams  # noqa: E402
from tpuao.ops import temporal as T  # noqa: E402
from tpuao.utils.profiling import device_time_ms  # noqa: E402


def main(argv):
    size = argv[1] if len(argv) > 1 else "1080x1920"
    h, w = (int(v) for v in size.split("x"))
    r = int(argv[2]) if len(argv) > 2 else 4
    rng = np.random.default_rng(0)
    ao = rng.uniform(0.2, 1.0, (h, w)).astype(np.float32)
    d = rng.uniform(0.1, 0.9, (h, w)).astype(np.float32)
    prev_ao = rng.uniform(0.2, 1.0, (h, w)).astype(np.float32)
    prev_d = d + 0.001
    cam = CameraParams(depth_mode="linear")
    tp = TemporalParams(max_displacement=r)
    mot = np.eye(4, dtype=np.float32)
    mot[0, 3] = 0.05
    args = [jnp.asarray(x) for x in (ao, d, prev_ao, prev_d)]
    m = jnp.asarray(mot)
    outs = {}
    for impl in ("auto", "pallas"):
        f = jax.jit(lambda a, b, c, e, mm, impl=impl: T.temporal_resolve(
            a, b, c, e, cam, tp, motion=mm, impl=impl))
        print(f"compiling impl={impl} ...", flush=True)
        out = f(*args, m)
        out = np.asarray(out)  # force materialization through the relay
        print(f"compiled + materialized impl={impl}", flush=True)
        outs[impl] = np.asarray(out)
        ms = device_time_ms(
            lambda a: f(a, args[1], args[2], args[3], m), args[0],
            repeats=3)
        print(f"standalone resolve {h}x{w} R={r} impl={impl}: "
              f"{ms:.4f} ms", flush=True)
    print("on-chip max abs diff:",
          float(np.abs(outs["auto"] - outs["pallas"]).max()), flush=True)


if __name__ == "__main__":
    main(sys.argv)
