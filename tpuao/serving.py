"""HTTP AO serving: PFM depth in -> PFM (or PNG) AO out.

The deployment glue layer (SURVEY.md SS2 L4 analog for a service instead
of a game engine): one warm ``AmbientOcclusionEngine`` per process; the
compiled frame program is cached per input shape, and per-request
tunables ride as traced scalars so they NEVER recompile.  Pair with
``utils.batching.MicroBatcher`` (``batch_size > 0``) so concurrent
clients share fixed-shape batched programs.

API (stdlib HTTP, threaded):

  POST /ao            body = 1-3 concatenated PFM frames (PFM headers are
                      self-delimiting, so frames ride back-to-back in one
                      body: ``dumps_pfm(depth) + dumps_pfm(normals)``):
                        1 frame  = 'Pf' depth            -> AO out
                        2 frames = depth + 'PF' normals  -> AO out
                        3 frames = depth + normals + 'PF' color
                                                         -> composited out
      ?buffers=depth,color        overrides the positional meaning when
                                  the defaults don't fit (e.g. composite
                                  without a normals buffer)
      ?strength=2.0&rejection_falloff=5.0&...   per-request tunables
      ?near=0.1&far=100&fov=60                  per-request camera
      ?out=pfm (default) | png

  Normals requests flip the STATIC ``use_normals`` program knob, so the
  first one per frame shape compiles a new program (cached after); the
  tunables/camera params stay traced scalars and never recompile.

      ?session=<id>   TEMPORAL session: the server keeps this stream's
                      ``(ao, depth)`` history device-side and resolves
                      each frame against it (reprojection accumulation,
                      spec golden/temporal.py).  Per-frame camera motion
                      rides ``?view=`` (16 comma-separated floats: this
                      frame's world->eye matrix; the server derives the
                      relative motion) or ``?motion=`` (the current->
                      previous eye transform directly); omit both for a
                      static camera.  OBJECT motion instead rides a
                      trailing ``mv`` body buffer (``?buffers=depth,mv``
                      etc., session-only): a 3-channel 'PF' whose first
                      two channels are (di, dj) pixel offsets current->
                      previous (third ignored; spec golden/temporal.py),
                      mutually exclusive with ``view=``/``motion=``.  ``?reset=1`` drops history (scene
                      cut).  ``history_weight=``/``depth_tolerance=``
                      ride as traced scalars.  Camera overrides bind at
                      session creation and are rejected mid-stream (the
                      reprojection assumes one camera per sequence).
                      Sessions are stateful, so they always render on
                      the direct path (never batched); idle sessions
                      are evicted after ``session_ttl`` seconds.
  DELETE /session/<id>  drop a session's history explicitly
  GET  /config        the engine's current AOParams/CameraParams JSON
  GET  /healthz       200 once a frame has rendered (readiness gate:
                      the first compile takes tens of seconds on a
                      remote TPU; warm up before serving)
  GET  /stats         JSON observability counters: requests/ok/errors,
                      direct-vs-batched routing, latency p50/p95/max
                      over the last 1024 requests, batcher flush stats

``examples/serve.py`` is the runnable front end (argparse + warmup).
"""

from __future__ import annotations

import json
import re
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlparse

import numpy as np

from tpuao.models.pipeline import AmbientOcclusionEngine, render_frame
from tpuao.params import (
    PARAM_RANGES,
    TEMPORAL_PARAM_RANGES,
    CameraParams,
    params_to_dict,
)
from tpuao.utils.frameio import dumps_pfm, loads_pfm_multi
from tpuao.utils.resilience import retry_transient


_SESSION_ID_RE = r"[A-Za-z0-9_.-]{1,64}"


class ServerBusy(Exception):
    """Transient server resource exhaustion -> HTTP 503 (advisor r4).

    Distinct from ``ValueError`` (HTTP 400, a caller error): a full
    session table is a condition TTL eviction will clear, so clients
    should back off and retry rather than treat it as a bad request
    (``AOClient`` maps 5xx to ``RuntimeError``, 400 to ``ValueError``)."""


def _sweep_sessions(srv, now=None):
    """Evict idle temporal sessions (device-side history is ~2 full-res
    f32 planes per session -- an abandoned 4K stream parks ~66 MB of
    HBM).  Runs on EVERY /ao POST and DELETE, not just session traffic,
    so the TTL holds even when all later requests are stateless.
    Caller holds ``srv.sessions_lock`` (the table's own lock -- the
    sweep must never wait behind an in-flight render on ``srv.lock``)."""
    now = time.monotonic() if now is None else now
    for k in [k for k, s in srv.sessions.items()
              if now - s["last"] > srv.session_ttl]:
        del srv.sessions[k]


def _apply_camera_overrides(camera, cam_over):
    """Validated per-request camera: ``fov`` (degrees) converts to
    ``tan_half_fov_h``; the result is range-checked like the tunables."""
    import math

    fov = cam_over.pop("fov", None)
    if fov is not None:
        if not 0 < fov < 180:
            raise ValueError(f"fov={fov} outside (0, 180)")
        cam_over["tan_half_fov_h"] = math.tan(math.radians(fov) / 2)
    return camera.replace(**cam_over).validate()


class AOHandler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # quiet by default
        if self.server.verbose:
            super().log_message(fmt, *args)

    def _send(self, code, body, ctype="application/octet-stream",
              headers=()):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in headers:
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/healthz":
            if self.server.warmed:
                self._send(200, b"ok", "text/plain")
            else:
                self._send(503, b"warming: no frame rendered yet",
                           "text/plain")
        elif path == "/stats":
            srv = self.server
            with srv.stats_lock:
                stats = dict(srv.stats)
                lat = sorted(srv.latencies)
            if lat:
                stats["latency_ms"] = {
                    "count": len(lat),
                    "p50": round(lat[len(lat) // 2], 2),
                    "p95": round(lat[int(len(lat) * 0.95)
                                     if len(lat) > 1 else 0], 2),
                    "max": round(lat[-1], 2)}
            stats["sessions"] = len(srv.sessions)
            if srv.batcher is not None:
                stats["batcher"] = srv.batcher.stats()
            self._send(200, json.dumps(stats, indent=2).encode(),
                       "application/json")
        elif path == "/config":
            eng = self.server.engine
            body = json.dumps({"ao": params_to_dict(eng.params),
                               "camera": params_to_dict(eng.camera)},
                              indent=2).encode()
            self._send(200, body, "application/json")
        else:
            self._send(404, b"not found", "text/plain")

    def _count(self, key):
        with self.server.stats_lock:
            self.server.stats[key] += 1

    def do_DELETE(self):
        path = urlparse(self.path).path
        m = re.fullmatch(rf"/session/({_SESSION_ID_RE})", path)
        if not m:
            self._send(404, b"not found", "text/plain")
            return
        with self.server.sessions_lock:
            _sweep_sessions(self.server)
            dropped = self.server.sessions.pop(m.group(1), None)
        if dropped is None:
            self._send(404, b"no such session", "text/plain")
        else:
            self._send(200, b"session dropped", "text/plain")

    def _render_session(self, sid, depth, normals, color, mat, is_view,
                        reset, tunables, t_tunables, cam_over,
                        resolve_level):
        """One temporal-session frame (under the server render lock).

        Returns ``(ao, frame_index)`` -- the index rides back as the
        ``X-TPUAO-Session-Frame`` header so clients can DETECT a silent
        history restart (TTL eviction between frames recreates the
        session; index 0 on a frame the client thought was mid-stream
        means the accumulation started over).

        Every attempt (and any terminal failure) restores the session's
        pre-frame history first: ``TemporalAOEngine.render`` advances
        ``_prev_view``/``_state`` before+during the device render, so a
        fault mid-frame would otherwise make the NEXT frame derive an
        identity motion (or read a poisoned history) from half-updated
        state."""
        from tpuao.models.pipeline import TemporalAOEngine

        srv = self.server
        now = time.monotonic()
        with srv.lock:
            # the render itself serializes on srv.lock; the table ops
            # take the table's own lock (srv.lock first, always -- the
            # cheap request-path sweeps hold only sessions_lock)
            with srv.sessions_lock:
                _sweep_sessions(srv, now)
                ses = srv.sessions.get(sid)
                if ses is None:
                    if len(srv.sessions) >= srv.max_sessions:
                        raise ServerBusy(
                            f"session table full ({srv.max_sessions}); "
                            "DELETE /session/<id> or wait for TTL "
                            "eviction")
                    camera = srv.engine.camera
                    if cam_over:
                        camera = _apply_camera_overrides(camera,
                                                         dict(cam_over))
                    ses = {"engine": TemporalAOEngine(
                               camera, srv.engine.params,
                               impl=srv.engine.impl,
                               out_dtype=srv.engine.out_dtype,
                               resolve_level=resolve_level),
                           "last": now, "frames": 0, "created": True}
                    srv.sessions[sid] = ses
            if not ses.pop("created", False) and cam_over:
                # idempotent re-sends are fine (the thin client sends the
                # session camera on EVERY frame so a TTL-evicted stream
                # rebinds correctly on resume); only a CHANGE is an error
                bound = _apply_camera_overrides(srv.engine.camera,
                                                dict(cam_over))
                # identical query strings produce identical floats, so a
                # re-send compares exactly equal; any real change differs
                if params_to_dict(ses["engine"].camera) != \
                        params_to_dict(bound):
                    raise ValueError(
                        "camera is fixed per session (reprojection "
                        "assumes one camera per sequence); re-sending "
                        "the SAME camera is fine, changing it needs a "
                        "new session= (or DELETE first)")
            ses["last"] = now
            engine = ses["engine"]
            if resolve_level != engine.resolve_level:
                # like the camera: fixed per session (the history state
                # shape differs between levels); identical re-sends fine
                raise ValueError(
                    "resolve_level is fixed per session (the history "
                    f"lives at that resolution); this session is level "
                    f"{engine.resolve_level} -- start a new session= "
                    "(or DELETE first) to change it")
            # snapshot BEFORE applying reset (advisor r4): a reset frame
            # that fails terminally restores the PRE-reset history and
            # frame counter like any other failed frame
            saved = (engine._state, engine._prev_view,
                     engine._params, engine._tparams, ses["frames"])
            if reset:
                engine.reset()
                ses["frames"] = 0
            start_state = (engine._state, engine._prev_view)  # post-reset
            # per-request overlay semantics, same as the stateless path:
            # overrides apply to THIS frame only, and both param sets are
            # validated BEFORE either is applied (a 400 must not leave a
            # half-mutated session)
            params = engine.params.replace(**tunables).validate() \
                if tunables else engine.params
            if normals is not None and not params.use_normals:
                params = params.replace(use_normals=True)
            tparams = engine.tparams.replace(**t_tunables).validate() \
                if t_tunables else engine.tparams

            def attempt():
                engine._state, engine._prev_view = start_state
                engine._params, engine._tparams = params, tparams
                return np.asarray(engine.render(
                    depth, normals=normals, color=color,
                    motion=None if (mat is None or is_view) else mat,
                    view=mat if (mat is not None and is_view) else None))

            try:
                ao = retry_transient(attempt)()
            except BaseException:
                (engine._state, engine._prev_view,
                 engine._params, engine._tparams) = saved[:4]
                ses["frames"] = saved[4]
                raise
            engine._params, engine._tparams = saved[2], saved[3]
            frame = ses["frames"]
            ses["frames"] = frame + 1
            # refresh AFTER the render (advisor r4): ``now`` was captured
            # before queueing on srv.lock, so behind a long render/compile
            # (20-90 s through the relay) it backdates the TTL and a live
            # session could be evicted right after rendering
            ses["last"] = time.monotonic()
            return ao, frame

    def do_POST(self):
        url = urlparse(self.path)
        if url.path == "/maintenance/clear-caches":
            # drop every compiled program (tpuao builders + JAX global
            # caches): long-lived servers whose client geometry set has
            # churned accumulate executables without bound (see
            # utils/caches.py for the measured failure mode).  Taking
            # srv.lock serializes behind any in-flight render, so no
            # program is dropped mid-flight; the next request per shape
            # pays a recompile (20-90 s on TPU through the relay), so
            # this is an operator action, not something to automate on
            # a timer.
            from tpuao.utils.caches import clear_program_caches

            with self.server.lock:
                dropped = clear_program_caches()
            self.server.warmed = False  # /healthz: warmup state is gone
            self._count("cache_clears")
            self._send(200, json.dumps({"dropped": dropped}).encode(),
                       "application/json")
            return
        if url.path != "/ao":
            self._send(404, b"not found", "text/plain")
            return
        t0 = time.perf_counter()
        self._count("requests")
        with self.server.sessions_lock:
            # the TTL must hold even when all remaining traffic is
            # stateless; the table lock is never held across a render
            _sweep_sessions(self.server)
        try:
            q = dict(parse_qsl(url.query))
            out_fmt = q.pop("out", "pfm")
            if out_fmt not in ("pfm", "png"):
                # validate BEFORE rendering: a bad out= must not burn a
                # full device render just to 400 (review r3)
                raise ValueError(f"unknown out={out_fmt}")
            buf_names = q.pop("buffers", None)
            sid = q.pop("session", None)
            reset = q.pop("reset", "0") not in ("0", "", "false")
            rl_s = q.pop("resolve_level", None)
            if rl_s is not None and rl_s not in ("0", "1"):
                raise ValueError("resolve_level must be 0 or 1, "
                                 f"got {rl_s!r}")
            resolve_level = int(rl_s or 0)
            view_s = q.pop("view", None)
            motion_s = q.pop("motion", None)
            tunables = {k: float(v) for k, v in q.items()
                        if k in PARAM_RANGES}
            t_tunables = {k: float(v) for k, v in q.items()
                          if k in TEMPORAL_PARAM_RANGES}
            cam_over = {k: float(q[k]) for k in ("near", "far", "fov")
                        if k in q}
            unknown = (set(q) - set(tunables) - set(t_tunables)
                       - set(cam_over))
            if unknown:
                raise ValueError(f"unknown query params: {sorted(unknown)}")
            if sid is None and (reset or view_s is not None
                                or motion_s is not None or t_tunables
                                or rl_s is not None):
                raise ValueError("reset/view/motion/resolve_level/"
                                 "temporal tunables need session=")
            if sid is not None and not re.fullmatch(_SESSION_ID_RE, sid):
                raise ValueError(
                    f"session= must match {_SESSION_ID_RE}")
            if view_s is not None and motion_s is not None:
                raise ValueError("pass view= or motion=, not both")
            mat = None
            if view_s is not None or motion_s is not None:
                vals = [float(x) for x in
                        (view_s or motion_s).split(",")]
                if len(vals) != 16:
                    raise ValueError("view=/motion= must be 16 comma-"
                                     f"separated floats, got {len(vals)}")
                mat = np.asarray(vals, np.float64).reshape(4, 4)
            n = int(self.headers.get("Content-Length", "0"))
            if not 0 < n <= self.server.max_body:
                raise ValueError(
                    f"body size {n} outside (0, {self.server.max_body}]")
            frames = loads_pfm_multi(self.rfile.read(n))
            names = ([s.strip() for s in buf_names.split(",") if s.strip()]
                     if buf_names is not None
                     else ["depth", "normals", "color"][:len(frames)])
            if len(names) != len(frames):
                raise ValueError(f"buffers= names {len(names)} frames but "
                                 f"the body holds {len(frames)}")
            has_mv = bool(names) and names[-1] == "mv"
            core = names[1:-1] if has_mv else names[1:]
            if not names or names[0] != "depth" or core not in (
                    [], ["normals"], ["color"], ["normals", "color"]):
                raise ValueError(
                    "buffers= must be depth[,normals][,color][,mv] in "
                    f"order, got {names}")
            if has_mv:
                # per-pixel motion vectors (object motion): session-only
                # (stateless frames have no history to reproject), rides
                # as a 3-channel 'PF' whose first two channels are
                # (di, dj) pixel offsets current->previous (third channel
                # ignored -- PFM has no 2-channel form); mutually
                # exclusive with the view=/motion= camera matrices
                if sid is None:
                    raise ValueError("an mv buffer needs session=")
                if mat is not None:
                    raise ValueError("pass an mv buffer or view=/motion=, "
                                     "not both")
            bufs = dict(zip(names, frames))
            depth = bufs["depth"]
            if depth.ndim != 2:
                # a 3-channel 'PF' first frame would be misread as a
                # leading batch by the direct path (the batcher already
                # rejects it); both routes must 400 consistently
                raise ValueError("first frame must be a single-channel "
                                 f"'Pf' depth, got shape {depth.shape}")
            normals = bufs.get("normals")
            if normals is not None and (
                    normals.ndim != 3 or normals.shape[-1] != 3
                    or normals.shape[:2] != depth.shape):
                raise ValueError("normals frame must be 'PF' (H, W, 3) "
                                 f"matching depth {depth.shape}, got "
                                 f"{normals.shape}")
            color = bufs.get("color")
            if color is not None and color.shape[:2] != depth.shape:
                raise ValueError(f"color frame shape {color.shape} does "
                                 f"not match depth {depth.shape}")
            mv = bufs.get("mv")
            if mv is not None:
                if (mv.ndim != 3 or mv.shape[-1] != 3
                        or mv.shape[:2] != depth.shape):
                    raise ValueError("mv frame must be 'PF' (H, W, 3) "
                                     f"matching depth {depth.shape}, got "
                                     f"{mv.shape}")
                mat = np.ascontiguousarray(mv[..., :2], np.float32)
            eng = self.server.engine
            direct = bool(tunables or cam_over
                          or self.server.batcher is None)
            self._count("temporal" if sid is not None
                        else "direct" if direct else "batched")
            extra_headers = ()
            if sid is not None:
                # stateful: always the direct path, never batched
                ao, frame_idx = self._render_session(
                    sid, depth, normals, color, mat,
                    view_s is not None, reset, tunables, t_tunables,
                    cam_over, resolve_level)
                # frame 0 on a frame the client thought was mid-stream
                # means TTL eviction restarted the accumulation
                extra_headers = (("X-TPUAO-Session-Frame",
                                  str(frame_idx)),)
            elif direct:
                with self.server.lock:
                    # traced scalars: swapping tunables OR camera
                    # projection per request reuses the cached compiled
                    # program (validated)
                    params = eng.params.replace(**tunables).validate() \
                        if tunables else eng.params
                    if normals is not None and not params.use_normals:
                        # static knob: first such request per frame shape
                        # compiles the normals program (cached after)
                        params = params.replace(use_normals=True)
                    camera = eng.camera
                    if cam_over:
                        # validated like the tunables: ?far=0 must 400,
                        # not render NaN and count as ok (review r3)
                        camera = _apply_camera_overrides(camera, cam_over)
                    # retry_transient: the relayed backend's observed
                    # transient faults (HTTP 500 / worker restart) retry
                    # instead of surfacing as client 500s.  The wrapped
                    # callable INCLUDES np.asarray: dispatch is async, so
                    # an UNAVAILABLE raised during execution surfaces at
                    # materialization, which must sit inside the retry.
                    # render_frame is resolved per call so tests can
                    # monkeypatch ``serving.render_frame`` with a flake.
                    ao = retry_transient(
                        lambda *a, **kw: np.asarray(
                            render_frame(*a, **kw)))(
                        depth, camera, params, normals=normals,
                        color=color, impl=eng.impl)
            else:
                # default-tunable requests ride the micro-batcher: many
                # concurrent clients share fixed-shape batched programs
                # (multi-buffer requests batch with same-combination
                # requests; the flush flips use_normals like the direct
                # path would)
                ao = self.server.batcher.submit(
                    depth, normals=normals, color=color).result()
            # encode INSIDE the try: a missing Pillow (optional 'io'
            # extra) or encode fault must surface as a counted 500, not
            # an aborted connection after ok was already recorded
            if out_fmt == "png":
                from tpuao.utils.io import encode_ao_png

                body, ctype = encode_ao_png(ao), "image/png"
            else:
                body, ctype = dumps_pfm(ao), "application/x-pfm"
        except ServerBusy as e:
            # transient resource exhaustion: 503 + Retry-After so clients
            # back off and retry rather than treat it as a caller error
            self._count("errors")
            self._send(503, str(e).encode(), "text/plain",
                       headers=(("Retry-After", "5"),))
            return
        except ValueError as e:
            self._count("errors")
            self._send(400, str(e).encode(), "text/plain")
            return
        except Exception as e:  # render/backend fault: a 500 the client
            # can retry beats an aborted connection (and it is counted)
            self._count("errors")
            self._send(500, f"{type(e).__name__}: {e}".encode(),
                       "text/plain")
            return
        self.server.warmed = True
        with self.server.stats_lock:
            self.server.stats["ok"] += 1
            self.server.latencies.append((time.perf_counter() - t0) * 1e3)
        self._send(200, body, ctype, headers=extra_headers)


def warm_server(srv, shape, buffers=()) -> list[str]:
    """Pre-compile the server's programs for one frame shape.

    For every combination of ``buffers`` (subsets of
    {"normals", "color"}, including the empty depth-only one) this
    compiles exactly the programs the /ao handler can route that
    combination to: the direct single-frame program and, when a
    micro-batcher is configured, the batched program too (a DIFFERENT
    compile -- without it the readiness gate lies and the first real
    request eats the compile; ``use_normals`` flips statically and a
    present color arg changes the program structure).  A ``"temporal"``
    entry additionally warms the ``?session=`` programs (static- and
    moving-camera temporal resolves) for each combination;
    ``"temporal_l1"`` warms the half-res ``?resolve_level=1`` moving
    program too.  Marks the server warm; returns the list of warmed
    program names.
    """
    from itertools import combinations

    h, w = shape
    buffers = set(buffers)
    temporal = "temporal" in buffers or "temporal_l1" in buffers
    temporal_l1 = "temporal_l1" in buffers
    buffers -= {"temporal", "temporal_l1"}
    unknown = buffers - {"normals", "color"}
    if unknown:
        raise ValueError(f"unknown warmup buffers {sorted(unknown)} "
                         "(choose from normals,color,temporal,"
                         "temporal_l1)")
    zz = np.full((h, w), 0.5, np.float32)
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[..., 2] = 1.0
    col = np.full((h, w, 3), 0.5, np.float32)
    eng = srv.engine
    warmed = []
    wants = sorted(set(buffers))
    for combo in (c for r in range(len(wants) + 1)
                  for c in combinations(wants, r)):
        kw = {}
        if "normals" in combo:
            kw["normals"] = nrm
        if "color" in combo:
            kw["color"] = col
        params = (eng.params.replace(use_normals=True)
                  if "normals" in combo else eng.params)
        np.asarray(render_frame(zz, eng.camera, params, impl=eng.impl,
                                **kw))
        name = "depth" + ("+" + "+".join(combo) if combo else "")
        warmed.append(name)
        if temporal:
            # session programs are distinct compiles (pipeline + resolve
            # in ONE program; static-camera and moving-camera resolves
            # differ structurally).  The jit caches are process-global,
            # so this warms every future ?session= stream of this shape.
            from tpuao.models.pipeline import render_frame_temporal
            from tpuao.params import TemporalParams

            _, st = render_frame_temporal(
                zz, None, eng.camera, params, TemporalParams(),
                impl=eng.impl, out_dtype=eng.out_dtype, **kw)
            out, _ = render_frame_temporal(
                zz, st, eng.camera, params, TemporalParams(),
                motion=np.eye(4, dtype=np.float32),
                impl=eng.impl, out_dtype=eng.out_dtype, **kw)
            np.asarray(out)
            warmed.append(f"{name}[temporal static+moving]")
            if temporal_l1:
                _, st1 = render_frame_temporal(
                    zz, None, eng.camera, params, TemporalParams(),
                    impl=eng.impl, out_dtype=eng.out_dtype,
                    resolve_level=1, **kw)
                out1, _ = render_frame_temporal(
                    zz, st1, eng.camera, params, TemporalParams(),
                    motion=np.eye(4, dtype=np.float32), impl=eng.impl,
                    out_dtype=eng.out_dtype, resolve_level=1, **kw)
                np.asarray(out1)
                warmed.append(f"{name}[temporal_l1 static+moving]")
        if srv.batcher is not None:
            # every ladder rung is a distinct compile (batching.py); warm
            # deterministically via the batcher's own padded-batch path --
            # queue submissions cannot control which rung a flush lands on
            rungs = srv.batcher.warm(zz, **kw)
            warmed.extend(f"{name}[batch {r}]" for r in rungs)
    srv.warmed = True
    return warmed


class AOServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that also shuts the micro-batcher down."""

    batcher = None

    def server_close(self):
        if self.batcher is not None:
            self.batcher.close()
        super().server_close()


def make_server(port: int = 0, engine: AmbientOcclusionEngine | None = None,
                verbose: bool = False,
                batch_size: int = 0, mesh=None) -> AOServer:
    """Build (not start) the server; ``port=0`` picks a free port.

    ``batch_size > 0`` routes default-tunable requests through a
    ``utils.batching.MicroBatcher`` so concurrent clients share
    fixed-shape batched programs.  ``mesh`` (a ``jax.sharding.Mesh``
    from ``parallel.sharding.make_mesh``) additionally runs each flush
    VIEW-SHARDED across the mesh — the [BJ] config-5 fleet-serving
    shape: ``batch_size`` frames per flush, one view per chip when
    ``batch_size == mesh.devices.size``.  Requests that override
    tunables bypass the batcher and render single-chip."""
    srv = AOServer(("127.0.0.1", port), AOHandler)
    srv.engine = engine or AmbientOcclusionEngine(
        CameraParams(depth_mode="linear"))
    srv.lock = threading.Lock()  # one frame in flight per process
    srv.verbose = verbose
    srv.warmed = False  # /healthz turns 200 after the first render
    srv.stats_lock = threading.Lock()
    srv.stats = {"requests": 0, "ok": 0, "errors": 0,
                 "direct": 0, "batched": 0, "temporal": 0,
                 "cache_clears": 0}
    srv.sessions = {}  # temporal sessions: id -> {engine, last, frames}
    srv.sessions_lock = threading.Lock()  # table only, never held on render
    srv.session_ttl = 600.0  # idle seconds before history is evicted
    srv.max_sessions = 64
    srv.latencies = deque(maxlen=1024)  # end-to-end ms, ok requests only
    # the largest legal multi-buffer body is an 8K depth + 'PF' normals +
    # 'PF' color request: ~133 + 398 + 398 MB; reject above 1 GiB
    srv.max_body = 1024 << 20
    if mesh is not None and not batch_size:
        batch_size = int(mesh.devices.size)  # one view per chip
    if batch_size:
        from tpuao.utils.batching import MicroBatcher

        eng = srv.engine
        def batched_render(d, normals=None, color=None):
            # the /ao handler's static-knob contract applies per flush:
            # a normals batch flips use_normals exactly like the direct
            # path (flushes are homogeneous, so the whole batch agrees)
            params = eng.params
            if normals is not None and not params.use_normals:
                params = params.replace(use_normals=True)
            if mesh is None:
                return render_frame(d, eng.camera, params,
                                    normals=normals, color=color,
                                    impl=eng.impl)
            from tpuao.parallel.sharding import render_views_sharded

            return render_views_sharded(d, eng.camera, params,
                                        normals=normals, color=color,
                                        mesh=mesh, impl=eng.impl)

        # same retry policy as the direct path: a transient relay fault
        # fails a whole flush otherwise (every rider gets the error).
        # Materialize INSIDE the wrapper -- async-dispatched faults
        # surface at np.asarray, which the batcher would otherwise call
        # outside the retry.
        srv.batcher = MicroBatcher(
            retry_transient(
                lambda d, **kw: np.asarray(batched_render(d, **kw))),
            batch_size=batch_size)
    return srv
