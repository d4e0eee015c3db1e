#!/usr/bin/env python
"""Minimal AO serving endpoint: PFM depth in -> PFM (or PNG) AO out.

    python examples/serve.py [port] [--config cfg.json] [--batch 4]
                             [--warmup HxW] [--warmup-buffers normals,color]

Thin front end over ``tpuao.serving`` (the deployment-layer component:
AOHandler + make_server; see its module docstring for the HTTP API).

Example round-trip:

    python - <<'PY'
    import urllib.request
    from tpuao.utils.frameio import dumps_pfm, loads_pfm
    from tpuao.utils import fixtures as F
    z = F.spheres_on_plane(360, 640, n_spheres=5, seed=1)
    req = urllib.request.Request(
        "http://localhost:8080/ao?strength=2.0", data=dumps_pfm(z))
    ao = loads_pfm(urllib.request.urlopen(req).read())
    PY
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from tpuao.models.pipeline import AmbientOcclusionEngine
from tpuao.serving import AOHandler, make_server  # noqa: F401 (re-export)


def main(argv):
    import argparse

    ap = argparse.ArgumentParser(description="tpuao AO serving endpoint")
    ap.add_argument("port", nargs="?", type=int, default=8080)
    ap.add_argument("--config", help="engine config JSON (save_config)")
    ap.add_argument("--batch", type=int, default=0,
                    help="micro-batch size for default-tunable requests")
    ap.add_argument("--warmup", metavar="HxW",
                    help="pre-compile for this frame shape before serving")
    ap.add_argument("--warmup-buffers", metavar="LIST",
                    help="with --warmup: also pre-compile the multi-buffer "
                    "programs (comma list from {normals,color,temporal,"
                    "temporal_l1}; "
                    "every non-empty combination is warmed, e.g. "
                    "'normals,color' compiles the normal-weighted, "
                    "composited, and normal-weighted-composited programs "
                    "-- each is a distinct static shape; 'temporal' adds "
                    "the ?session= static+moving resolve programs)")
    ap.add_argument("--views", type=int, default=0,
                    help="shard each batch flush over an N-device view "
                    "mesh (fleet serving; implies --batch N)")
    ap.add_argument("--autotune-cache", metavar="PATH",
                    help="load per-shape scoped-VMEM budgets saved by "
                    "`tpuao tune --save` (same flag as `tpuao render`)")
    a = ap.parse_args(argv[1:])
    if a.autotune_cache:
        from tpuao.utils.autotune import load_tuned

        print(f"autotune cache: {load_tuned(a.autotune_cache)} entries")
    eng = AmbientOcclusionEngine.from_config(a.config) if a.config else None
    mesh = None
    if a.views:
        from tpuao.parallel.sharding import make_mesh

        mesh = make_mesh(a.views)
    srv = make_server(a.port, eng, verbose=True, batch_size=a.batch,
                      mesh=mesh)
    if a.warmup_buffers and not a.warmup:
        ap.error("--warmup-buffers needs --warmup HxW")
    if a.warmup:
        from tpuao.serving import warm_server

        h, w = (int(v) for v in a.warmup.split("x"))
        bufs = ([s.strip() for s in a.warmup_buffers.split(",")
                 if s.strip()] if a.warmup_buffers else ())
        try:
            warmed = warm_server(srv, (h, w), bufs)
        except ValueError as e:
            ap.error(str(e))
        print(f"warmed up for {h}x{w}: {', '.join(warmed)}")
    print(f"tpuao serving on http://127.0.0.1:{srv.server_address[1]} "
          f"(POST /ao, GET /config, GET /healthz)")
    srv.serve_forever()


if __name__ == "__main__":
    main(sys.argv)
