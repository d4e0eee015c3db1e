"""Probe round 3: Pallas resolve v3 under the real compiler options (r5).

probe2 found: kernel v3 (row_tile=16) COMPILES; l1 standalone 0.1124 vs
0.1934 ms XLA; the fullres attempt OOM'd only because the probe jitted
without the pipeline's scoped-VMEM budget (16.23M vs default 16M); the
probe's cross-impl diffs were garbage (shared rng drew fresh inputs per
section).  This probe, all on SAME inputs + tpu_compiler_options:

  1. on-chip parity fullres+l1 pallas-vs-xla
  2. fullres pallas16 standalone timing
  3. in-frame A/B: frame + resolve with the resolve impl flipped
     independently of the pipeline impl (pipeline stays 'auto')

Usage: python benchmarks/exp/temporal_probe3.py [HxW]
"""

import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpuao.params import AOParams, CameraParams, TemporalParams  # noqa: E402
from tpuao.models.pipeline import (_resolve_l1_and_lift,  # noqa: E402
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
    except Exception as e:  # noqa: BLE001
        log(f"!!! {name} FAILED: {repr(e)[:300]}")
        traceback.print_exc()


def main(argv):
    size = argv[1] if len(argv) > 1 else "1080x1920"
    h, w = (int(v) for v in size.split("x"))
    h1, w1 = -(-h // 2), -(-w // 2)
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    tp = TemporalParams(max_displacement=4)
    rng = np.random.default_rng(0)
    mot = np.eye(4, dtype=np.float32)
    mot[0, 3] = 0.05
    m = jnp.asarray(mot)
    z = np.asarray(F.spheres_on_plane(h, w, n_spheres=8, seed=3),
                   dtype=np.float32)
    zd = jax.device_put(jnp.asarray(z))

    full = {k: jnp.asarray(rng.uniform(*r, (h, w)).astype(np.float32))
            for k, r in (("ao", (0.2, 1)), ("d", (0.1, 0.9)),
                         ("pa", (0.2, 1)))}
    full["pd"] = full["d"] + 0.001
    half = {k: jnp.asarray(rng.uniform(*r, (h1, w1)).astype(np.float32))
            for k, r in (("ao", (0.2, 1)), ("d", (0.1, 0.9)),
                         ("pa", (0.2, 1)))}
    half["pd"] = half["d"] + 0.001
    res = {}

    def standalone(level, impl, key):
        from tpuao.utils.xla_opts import tpu_compiler_options

        a = full if level == 0 else half
        # fn stays UN-jitted: the parity call jits it with the pipeline's
        # scoped-VMEM budget (the kernel needs >16M scoped at 1080p --
        # probe2's fullres OOM was just the default budget), and
        # device_time_ms wraps the same plain fn in its own options-jit
        # (options on a nested jit are forbidden)
        if level == 0:
            fn = lambda q, b, c, e: T.temporal_resolve(  # noqa: E731
                q, b, c, e, cam, tp, motion=m, impl=impl)
        else:
            fn = lambda q, b, c, e: T.temporal_resolve_l1(  # noqa: E731
                q, b, c, e, h, w, cam, tp, motion=m, impl=impl)
        args = (a["ao"], a["d"], a["pa"], a["pd"])
        a0 = args[0]
        px = a0.shape[-2] * a0.shape[-1]
        out = np.asarray(jax.jit(
            fn, compiler_options=tpu_compiler_options(px))(*args))
        ms = device_time_ms(lambda q: fn(q, *args[1:]), args[0])
        res[key] = ms
        log(f"{key}: {ms:.4f} ms")
        return out

    def parity_and_time(level, tag):
        o_x = standalone(level, "auto", f"{tag}_xla")
        o_p = standalone(level, "pallas", f"{tag}_pallas16")
        log(f"{tag} SAME-INPUT pallas-vs-xla max abs diff: "
            f"{float(np.abs(o_x - o_p).max()):.3e}")

    # in-frame: pipeline impl stays 'auto'; only the RESOLVE impl flips
    def inframe(level, resolve_impl, key):
        hs, ws = (h, w) if level == 0 else (h1, w1)
        pa = jnp.asarray(rng.uniform(0.2, 1, (hs, ws)).astype(np.float32))
        pd = jnp.asarray(rng.uniform(0.1, 0.9,
                                     (hs, ws)).astype(np.float32))

        def g(d):
            ao, dbg = ao_pipeline(d, cam, par, None, impl="auto")
            if level == 0:
                linz = dbg["linear_z"][..., :h, :w]
                return T.temporal_resolve(ao, linz, pa, pd, cam, tp, m,
                                          impl=resolve_impl)
            out, _ = _resolve_l1_and_lift(dbg, pa, pd, m, cam, par, tp,
                                          h, w, resolve_impl)
            return out

        ms = device_time_ms(g, zd)
        res[key] = ms
        log(f"{key}: {ms:.4f} ms")

    section("inframe l1 auto", lambda: inframe(1, "auto", "if_l1_xla"))
    section("inframe l1 pallas",
            lambda: inframe(1, "pallas", "if_l1_pallas"))
    section("inframe fullres auto",
            lambda: inframe(0, "auto", "if_full_xla"))
    section("inframe fullres pallas",
            lambda: inframe(0, "pallas", "if_full_pallas"))
    section("parity+time l1", lambda: parity_and_time(1, "l1"))
    section("parity+time fullres", lambda: parity_and_time(0, "fullres"))

    log("RESULTS " + " ".join(f"{k}={v:.4f}" for k, v in res.items()))


if __name__ == "__main__":
    main(sys.argv)
