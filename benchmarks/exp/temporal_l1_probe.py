"""On-chip probe: level-1 resolve overhead + Pallas resolve + R ladder (r5).

Answers VERDICT r4 items 2/3 with measured numbers at 1080p:

  A. plain frame (overhead baseline)
  B. frame + FULL-RES windowed resolve, moving camera (the r4 record row)
  C. frame + LEVEL-1 resolve, moving camera  <- the candidate fix
  D. standalone l1 resolve (XLA)
  E. standalone full-res resolve impl="pallas" (restructured kernel --
     the r4 'hung compile' was a 263 MB register-spill VMEM OOM)
  F. standalone l1 resolve impl="pallas"
  G. standalone full-res XLA resolve at R=2 and R=8 (window-cost law:
     predicted ~(2R+2)^2 scaling around the measured R=4 = 1.959 ms)

Every section is independently try/excepted and prints as it lands --
a hung Mosaic compile loses one row, not the session.

Usage: python benchmarks/exp/temporal_l1_probe.py [HxW]
"""

import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpuao.params import AOParams, CameraParams, TemporalParams  # noqa: E402
from tpuao.models.pipeline import (_temporal_frame_core,  # noqa: E402
                                   ao_pipeline)
from tpuao.ops import temporal as T  # noqa: E402
from tpuao.utils import fixtures as F  # noqa: E402
from tpuao.utils.profiling import device_time_ms  # noqa: E402

T0 = time.monotonic()


def log(msg):
    print(f"[+{time.monotonic() - T0:7.1f}s] {msg}", flush=True)


def section(name, fn):
    log(f"--- {name} ...")
    try:
        fn()
    except Exception as e:  # noqa: BLE001 - probe must survive any section
        log(f"!!! {name} FAILED: {e!r}")
        traceback.print_exc()


def main(argv):
    size = argv[1] if len(argv) > 1 else "1080x1920"
    h, w = (int(v) for v in size.split("x"))
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    z = np.asarray(F.spheres_on_plane(h, w, n_spheres=8, seed=3),
                   dtype=np.float32)
    zd = jax.device_put(jnp.asarray(z))
    mot = np.eye(4, dtype=np.float32)
    mot[0, 3] = 0.05
    m = jnp.asarray(mot)
    res = {}

    def frame_only():
        f = jax.jit(lambda d: ao_pipeline(d, cam, par, None)[0])
        res["frame"] = device_time_ms(f, zd)
        log(f"A frame only: {res['frame']:.4f} ms")

    def frame_resolve(level, key):
        tp = TemporalParams()
        h1, w1 = (h, w) if level == 0 else (-(-h // 2), -(-w // 2))
        st = T.initial_state(h1, w1)

        def g(d, pa, pd):
            out, (ra, rd) = _temporal_frame_core(
                d, pa, pd, m, cam, par, tp, None, None, "auto", "float32",
                level)
            return out, ra, rd

        ms = device_time_ms(g, zd, st[0], st[1])
        res[key] = ms
        log(f"{key}: {ms:.4f} ms (+{ms - res.get('frame', 0):.4f} over "
            "frame)")

    def standalone(level, impl, key, r=4):
        tp = TemporalParams(max_displacement=r)
        h1, w1 = (h, w) if level == 0 else (-(-h // 2), -(-w // 2))
        rng = np.random.default_rng(0)
        ao = jnp.asarray(rng.uniform(0.2, 1, (h1, w1)).astype(np.float32))
        d1 = jnp.asarray(rng.uniform(0.1, 0.9, (h1, w1)).astype(np.float32))
        pa = jnp.asarray(rng.uniform(0.2, 1, (h1, w1)).astype(np.float32))
        pd = d1 + 0.001
        if level == 0:
            fn = jax.jit(lambda a, b, c, e: T.temporal_resolve(
                a, b, c, e, cam, tp, motion=m, impl=impl))
        else:
            fn = jax.jit(lambda a, b, c, e: T.temporal_resolve_l1(
                a, b, c, e, h, w, cam, tp, motion=m, impl=impl))
        out = np.asarray(fn(ao, d1, pa, pd))  # compile + materialize
        ms = device_time_ms(lambda a: fn(a, d1, pa, pd), ao)
        res[key] = ms
        log(f"{key}: {ms:.4f} ms")
        return out

    outs = {}

    def pallas_vs_xla(level, tag):
        outs[(level, "auto")] = standalone(level, "auto",
                                           f"{tag}_xla")
        outs[(level, "pallas")] = standalone(level, "pallas",
                                             f"{tag}_pallas")
        diff = float(np.abs(outs[(level, "auto")]
                            - outs[(level, "pallas")]).max())
        log(f"{tag} pallas-vs-xla on-chip max abs diff: {diff:.3e}")

    section("A frame only", frame_only)
    section("C frame + L1 resolve (moving)",
            lambda: frame_resolve(1, "C_frame_l1"))
    section("B frame + fullres resolve (moving)",
            lambda: frame_resolve(0, "B_frame_fullres"))
    section("D/F standalone l1 xla+pallas", lambda: pallas_vs_xla(1, "l1"))
    section("E standalone fullres pallas vs xla",
            lambda: pallas_vs_xla(0, "fullres"))
    section("G ladder R=2", lambda: standalone(0, "auto", "R2_xla", r=2))
    section("G ladder R=8", lambda: standalone(0, "auto", "R8_xla", r=8))

    log("RESULTS " + " ".join(f"{k}={v:.4f}" for k, v in res.items()))


if __name__ == "__main__":
    main(sys.argv)
