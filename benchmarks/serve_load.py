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
                                    [--sessions N] [--session-frames F]
                                    [--resolve-level {0,1}]

``--sessions N`` additionally runs N concurrent DOLLYING temporal
streams (``AOClient.session`` handles, per-frame view matrices) mixed
with the stateless traffic -- the load shape the session table, its
TTL-sweep lock, and the per-stream history actually face in serving
(VERDICT r4 item 5).  Per-stream ``X-TPUAO-Session-Frame`` counters are
checked monotone (a restart = TTL eviction or cross-stream corruption;
with the default 15-min TTL any restart under load is a bug).

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
    ap.add_argument("--sessions", type=int, default=0,
                    help="N concurrent dollying temporal streams mixed "
                    "with the stateless traffic")
    ap.add_argument("--session-frames", type=int, default=8,
                    help="frames per temporal stream")
    ap.add_argument("--resolve-level", type=int, default=0, choices=(0, 1),
                    help="session resolve level (1 = half-res fast path)")
    ap.add_argument("--record", action="store_true",
                    help="merge the result into BENCH_DETAIL.json under "
                    "'serve_load' (read-modify-write; never drops other "
                    "keys -- same contract as bench.py's merge flush)")
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
        buffers = ("normals",) if a.normals else ()
        if a.sessions:
            buffers += (("temporal_l1",) if a.resolve_level
                        else ("temporal",))
        S.warm_server(srv, (h, w), buffers)
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

    # -- temporal session streams (VERDICT r4 item 5) -----------------------
    ses_lat_ms: list[float] = []
    ses_restarts = [0]
    ses_frames_done = [0]

    def session_stream(sidx: int):
        """One dollying client: sequential frames, per-frame views, frame
        counters checked monotone via X-TPUAO-Session-Frame."""
        try:
            with client.session(f"load-{sidx}",
                                resolve_level=a.resolve_level) as ses:
                for t in range(a.session_frames):
                    v = np.eye(4)
                    v[0, 3] = 0.04 * t + 0.01 * sidx
                    t0 = time.perf_counter()
                    ses.render(frames[(sidx + t) % len(frames)], view=v)
                    dt = (time.perf_counter() - t0) * 1e3
                    with lat_lock:
                        ses_lat_ms.append(dt)
                        ses_frames_done[0] += 1
                        if ses.last_frame_index != t:
                            ses_restarts[0] += 1
        except Exception as e:  # noqa: BLE001
            with lat_lock:
                err.append(f"session {sidx}: {type(e).__name__}: {e}")

    # distinct frames (scaled copies) so result caching can't cheat
    frames = [z * (1.0 - 1e-4 * (i % 7)) for i in range(a.requests)]
    t0 = time.perf_counter()
    ses_threads = [threading.Thread(target=session_stream, args=(i,))
                   for i in range(a.sessions)]
    for th_ in ses_threads:
        th_.start()
    try:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=a.concurrency) as pool:
            outs = list(pool.map(timed_render, frames))
    except Exception as e:  # noqa: BLE001
        err.append(f"{type(e).__name__}: {e}")
        outs = []
    for th_ in ses_threads:
        th_.join()
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
    if a.sessions:
        slat = sorted(ses_lat_ms)
        result["sessions"] = {
            "streams": a.sessions,
            "frames_per_stream": a.session_frames,
            "resolve_level": a.resolve_level,
            "frames_completed": ses_frames_done[0],
            "restarts": ses_restarts[0],
            "frames_per_s": (round(ses_frames_done[0] / wall_s, 2)
                             if wall_s else None),
            "latency_ms": {
                "p50": round(slat[len(slat) // 2], 1) if slat else None,
                "p95": round(slat[int(len(slat) * 0.95)] if len(slat) > 1
                             else slat[0], 1) if slat else None,
                "max": round(slat[-1], 1) if slat else None,
            },
        }
    srv.shutdown()
    srv.server_close()
    print(json.dumps(result, indent=2))
    if a.record:
        path = os.environ.get("TPUAO_BENCH_DETAIL") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_DETAIL.json")
        record_result(result, path)
    return 0 if not err else 1


def record_result(result, path):
    """Merge a fresh serve_load row into the bench detail record.

    Atomic replace, tolerant of a missing/corrupt record.  The row is
    freshly measured, so the bench merge-flush's inherited marker for it
    (if a prior bench run carried it over) is cleared."""
    try:
        detail = json.load(open(path))
    except (OSError, ValueError):
        detail = {}
    detail["serve_load"] = result
    if "serve_load" in detail.get("inherited_keys", []):
        detail["inherited_keys"].remove("serve_load")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(detail, f, indent=1)
    os.replace(tmp, path)


if __name__ == "__main__":
    sys.exit(main())
