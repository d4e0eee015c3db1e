#!/usr/bin/env python
"""Full-stack serving load benchmark: HTTP + batching + device render.

bench.py's ``streaming_1080p_host_launch`` rows isolate the per-launch
dispatch cost with a host-driven chain; this harness measures the whole
deployment stack instead -- an in-process ``tpuao.serving`` server under
N concurrent ``tpuao.client`` workers -- and reports requests/s and
client-observed latency percentiles alongside the server's own /stats.

    python benchmarks/serve_load.py [--shape 1080x1920] [--requests 64]
                                    [--concurrency 8] [--batch 4]
                                    [--normals] [--warm]

On the TPU host this exercises the relay's real dispatch path; on CPU
(JAX_PLATFORMS=cpu) it validates the stack and the batching accounting.
Prints one JSON object.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--shape", default="1080x1920", metavar="HxW")
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4,
                    help="server micro-batch size (0 = direct renders)")
    ap.add_argument("--normals", action="store_true",
                    help="send depth+normals multi-buffer bodies")
    ap.add_argument("--no-warm", action="store_true",
                    help="skip warm_server (measure cold-start too)")
    a = ap.parse_args(argv)
    h, w = (int(v) for v in a.shape.lower().split("x"))

    from tpuao import serving as S
    from tpuao.client import AOClient
    from tpuao.utils import fixtures as F

    if a.normals:
        z, nrm = F.spheres_on_plane(h, w, n_spheres=6, seed=3,
                                    with_normals=True)
        nrm = nrm.astype(np.float32)
    else:
        z = F.spheres_on_plane(h, w, n_spheres=6, seed=3)
        nrm = None
    z = z.astype(np.float32)

    srv = S.make_server(0, batch_size=a.batch)
    if not a.no_warm:
        S.warm_server(srv, (h, w), ("normals",) if a.normals else ())
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    client = AOClient(f"http://127.0.0.1:{srv.server_address[1]}",
                      timeout=1800.0)

    lat_ms: list[float] = []
    lat_lock = threading.Lock()
    err = []

    def timed_render(d):
        t0 = time.perf_counter()
        out = client.render(d, normals=nrm)
        with lat_lock:
            lat_ms.append((time.perf_counter() - t0) * 1e3)
        return out

    # distinct frames (scaled copies) so result caching can't cheat
    frames = [z * (1.0 - 1e-4 * (i % 7)) for i in range(a.requests)]
    t0 = time.perf_counter()
    try:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=a.concurrency) as pool:
            outs = list(pool.map(timed_render, frames))
    except Exception as e:  # noqa: BLE001
        err.append(f"{type(e).__name__}: {e}")
        outs = []
    wall_s = time.perf_counter() - t0

    lat = sorted(lat_ms)
    result = {
        "shape": f"{h}x{w}",
        "requests": a.requests,
        "concurrency": a.concurrency,
        "batch": a.batch,
        "normals": a.normals,
        "completed": len(outs),
        "wall_s": round(wall_s, 3),
        "req_per_s": round(len(outs) / wall_s, 2) if wall_s else None,
        "mpix_per_s": round(len(outs) * h * w / 1e6 / wall_s, 1)
        if wall_s else None,
        "client_latency_ms": {
            "p50": round(lat[len(lat) // 2], 1) if lat else None,
            "p95": round(lat[int(len(lat) * 0.95)] if len(lat) > 1
                         else lat[0], 1) if lat else None,
            "max": round(lat[-1], 1) if lat else None,
        },
        "server_stats": client.stats(),
        "errors": err,
    }
    srv.shutdown()
    srv.server_close()
    print(json.dumps(result, indent=2))
    return 0 if not err else 1


if __name__ == "__main__":
    sys.exit(main())
