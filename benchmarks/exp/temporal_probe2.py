"""Probe round 2: Pallas kernel v3 (row_tile=16) + XLA scan-unroll (r5).

Follow-up to temporal_l1_probe.py, which measured at 1080p:
frame 0.3225 / frame+l1 0.5124 / frame+fullres 2.2622 / l1_xla 0.1937 /
fullres_xla 1.9265 / R2 0.7224 / R8 6.8533 -- and found BOTH prior
kernel forms uncompilable (v1 register-spill OOM, v2 dynamic-sublane-
slice rejection).  This probe times:

  * kernel v3: static unroll, row_tile=16 (tap temporaries 16xW)
  * XLA row-scan with unroll=2 / unroll=5 (fewer carry HBM round trips)

Usage: python benchmarks/exp/temporal_probe2.py [HxW]
"""

import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpuao.params import CameraParams, TemporalParams  # noqa: E402
from tpuao.ops import temporal as T  # noqa: E402
from tpuao.utils.profiling import device_time_ms  # noqa: E402

T0 = time.monotonic()


def log(msg):
    print(f"[+{time.monotonic() - T0:7.1f}s] {msg}", flush=True)


def section(name, fn):
    log(f"--- {name} ...")
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        log(f"!!! {name} FAILED: {repr(e)[:400]}")
        traceback.print_exc()


def main(argv):
    size = argv[1] if len(argv) > 1 else "1080x1920"
    h, w = (int(v) for v in size.split("x"))
    cam = CameraParams(depth_mode="linear")
    rng = np.random.default_rng(0)
    mk = lambda hh, ww: (
        jnp.asarray(rng.uniform(0.2, 1, (hh, ww)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.1, 0.9, (hh, ww)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.2, 1, (hh, ww)).astype(np.float32)),
    )
    mot = np.eye(4, dtype=np.float32)
    mot[0, 3] = 0.05
    m = jnp.asarray(mot)
    res = {}
    ref = {}

    def run(key, fn, args):
        out = np.asarray(fn(*args))
        ms = device_time_ms(lambda a: fn(a, *args[1:]), args[0])
        res[key] = ms
        log(f"{key}: {ms:.4f} ms")
        return out

    def fullres(impl, key, unroll=1):
        tp = TemporalParams(max_displacement=4)
        ao, d1, pa = mk(h, w)
        pd = d1 + 0.001
        if unroll != 1:
            fn = jax.jit(lambda a, b, c, e: _unrolled_resolve(
                a, b, c, e, cam, tp, m, unroll))
        else:
            fn = jax.jit(lambda a, b, c, e: T.temporal_resolve(
                a, b, c, e, cam, tp, motion=m, impl=impl))
        out = run(key, fn, (ao, d1, pa, pd))
        if impl == "auto" and unroll == 1:
            ref["fullres"] = out
        elif "fullres" in ref:
            log(f"{key} vs xla max abs diff: "
                f"{float(np.abs(out - ref['fullres']).max()):.3e}")

    def _unrolled_resolve(a, b, c, e, cam_, tp_, m_, unroll):
        ip, jp, z_prev, in_front = T._reproject_coords(b, cam_, m_)
        hist, d_hist = T._bilinear_windowed2(c, e, ip, jp, 4, unroll=unroll)
        valid = (in_front
                 & (ip >= -0.5) & (ip <= h - 0.5)
                 & (jp >= -0.5) & (jp <= w - 0.5))
        di = ip - jnp.arange(h, dtype=jnp.float32)[:, None]
        dj = jp - jnp.arange(w, dtype=jnp.float32)[None, :]
        valid = (valid & (jnp.abs(di) <= 4.0)
                 & (jnp.abs(dj) <= 4.0)).astype(jnp.float32)
        rel_err = jnp.abs(d_hist - z_prev) / jnp.maximum(z_prev, 1e-6)
        conf = jnp.clip(1.0 - rel_err / tp_.depth_tolerance, 0.0, 1.0)
        alpha = tp_.history_weight * valid * conf
        lo, hi = T._neighborhood_bounds(a)
        return alpha * jnp.clip(hist, lo, hi) + (1.0 - alpha) * a

    def l1(impl, key):
        tp = TemporalParams(max_displacement=4)
        h1, w1 = -(-h // 2), -(-w // 2)
        ao, d1, pa = mk(h1, w1)
        pd = d1 + 0.001
        fn = jax.jit(lambda a, b, c, e: T.temporal_resolve_l1(
            a, b, c, e, h, w, cam, tp, motion=m, impl=impl))
        out = run(key, fn, (ao, d1, pa, pd))
        if impl == "auto":
            ref["l1"] = out
        elif "l1" in ref:
            log(f"{key} vs xla max abs diff: "
                f"{float(np.abs(out - ref['l1']).max()):.3e}")

    section("fullres xla (anchor)", lambda: fullres("auto", "fullres_xla"))
    section("fullres pallas v3 tile16",
            lambda: fullres("pallas", "fullres_pallas16"))
    section("fullres xla unroll=2",
            lambda: fullres("auto", "fullres_unroll2", unroll=2))
    section("fullres xla unroll=5",
            lambda: fullres("auto", "fullres_unroll5", unroll=5))
    section("l1 xla (anchor)", lambda: l1("auto", "l1_xla"))
    section("l1 pallas v3 tile16", lambda: l1("pallas", "l1_pallas16"))

    log("RESULTS " + " ".join(f"{k}={v:.4f}" for k, v in res.items()))


if __name__ == "__main__":
    main(sys.argv)
