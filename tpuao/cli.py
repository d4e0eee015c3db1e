"""Command-line front end: ``python -m tpuao <command>``.

The reference's user surface is "add the component to a Camera and move
sliders" (SURVEY.md SS2 L3/L4); outside a game engine the equivalent
one-liner is a shell command over image files.  Three subcommands:

  info    backend / device / version report (JSON)
  render  depth image in -> AO image out, every tunable as a flag
  serve   start the HTTP endpoint (delegates to examples/serve.py)

``render`` speaks PFM natively (the framework's frame interchange format,
``utils/frameio``: 1-channel 'Pf' depth, 3-channel 'PF' normals/color)
and PNG on either side for convenience: an 8/16-bit grayscale input PNG
is read as normalized linear depth in [0, 1] (``--depth-mode linear`` is
implied unless overridden), and a ``.png`` output writes the AO buffer as
8-bit grayscale (the reference's R8 occlusion RT, SURVEY.md SS3.0).

Tunables ride as traced scalars, so rendering many frames with varying
flags through one warm process (``serve``) never recompiles; one-shot
``render`` pays the single compile for its frame shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from tpuao.params import PARAM_RANGES


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tpuao", description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("info", help="backend / device / version report")

    r = sub.add_parser("render", help="depth image(s) in -> AO image(s) out")
    r.add_argument("input", help="depth frame (.pfm 'Pf', or grayscale "
                   ".png), or a quoted glob for a frame sequence")
    r.add_argument("output", help="AO output (.pfm, or 8-bit .png); a "
                   "directory when input is a sequence")
    r.add_argument("--normals", help="normals frame: 3-channel 'PF' .pfm "
                   "(raw signed components) or .png (standard (n+1)/2 "
                   "encoding, remapped to [-1, 1]); glob in sequence mode")
    r.add_argument("--color", help="color frame to composite (.pfm/.png); "
                   "glob in sequence mode")
    r.add_argument("--batch", type=int, default=4,
                   help="frames per device batch in sequence mode "
                   "(with --server: concurrent in-flight requests)")
    r.add_argument("--out-format", choices=("pfm", "png"), default="pfm",
                   help="output format in sequence mode")
    r.add_argument("--config", help="engine config JSON (save_config)")
    r.add_argument("--preset", help="quality preset "
                   "(VERY_LOW|LOW|MEDIUM|HIGH|ULTRA)")
    for name, (lo, hi) in PARAM_RANGES.items():
        r.add_argument(f"--{name.replace('_', '-')}", type=float,
                       dest=name, help=f"tunable in [{lo}, {hi}]")
    r.add_argument("--depth-mode", choices=("hardware", "linear"),
                   help="input depth convention (default: hardware for "
                   ".pfm, linear for .png)")
    r.add_argument("--near", type=float, help="camera near plane")
    r.add_argument("--far", type=float, help="camera far plane")
    r.add_argument("--projection", metavar="FILE_OR_16_FLOATS",
                   help="build the camera from a 4x4 projection matrix: a "
                   "path to a whitespace/comma-separated 16-float file, or "
                   "the 16 floats inline (comma-separated, row-major). "
                   "Derives near/far/fov/Z-convention and sets "
                   "depth_mode=hardware; --near/--far/--fov then override")
    r.add_argument("--projection-convention", choices=("unity", "gl"),
                   default="unity",
                   help="clip-space convention of --projection: 'unity' = "
                   "D3D [0,1] depth (GetGPUProjectionMatrix), 'gl' = "
                   "[-1,1] NDC (default: unity)")
    r.add_argument("--fov", type=float,
                   help="horizontal field of view, degrees")
    r.add_argument("--impl", default="auto",
                   choices=("auto", "jnp", "pallas", "fused"))
    r.add_argument("--sections", type=int, default=1,
                   help="split the frame into N halo-overlapped row "
                   "sections (bounds peak HBM for huge frames)")
    r.add_argument("--debug-dump", metavar="PATH",
                   help="also dump the intermediate-buffer pyramid "
                   "(.npz file, or a zarr directory)")

    r.add_argument("--temporal", action="store_true",
                   help="sequence mode: temporal accumulation across "
                   "frames (reprojection resolve, golden/temporal.py); "
                   "frames render in order through a TemporalAOEngine")
    r.add_argument("--camera-path", metavar="FILE",
                   help="JSON list of per-frame 4x4 world->eye view "
                   "matrices (16 floats each, row-major) for --temporal "
                   "reprojection; omit for a static camera")
    r.add_argument("--history-weight", type=float,
                   help="--temporal: max history fraction kept per frame "
                   "(default 0.9)")
    r.add_argument("--depth-tolerance", type=float,
                   help="--temporal: relative reprojected-depth mismatch "
                   "at which history is dropped (default 0.1)")
    r.add_argument("--no-temporal-clamp", action="store_true",
                   help="--temporal: disable the 3x3 anti-ghosting "
                   "neighborhood clamp")
    r.add_argument("--resolve-level", type=int, default=0, choices=(0, 1),
                   help="--temporal: 0 = full-res spec resolve (default), "
                   "1 = half-res level-1 resolve (the moving-camera fast "
                   "path: ~10x less resolve overhead, half-res history)")

    r.add_argument("--autotune-cache", metavar="PATH",
                   help="load per-shape scoped-VMEM budgets tuned by "
                   "`tpuao tune --save PATH` before rendering")
    r.add_argument("--server", metavar="URL",
                   help="render remotely via a running `tpuao serve` "
                   "endpoint (thin client, tpuao.client: no local device "
                   "or JAX backend is touched); tunables and "
                   "--near/--far/--fov ride as per-request query knobs, "
                   "while server-side state flags (--config/--preset/"
                   "--impl/--sections/--debug-dump/--autotune-cache) are "
                   "rejected; --depth-mode is checked against the "
                   "server's engine convention (GET /config)")

    t = sub.add_parser("tune", help="autotune the scoped-VMEM fusion "
                       "budget for one frame shape (on-device sweep)")
    t.add_argument("shape", help="frame shape HxW, e.g. 1440x2560")
    t.add_argument("--normals", action="store_true",
                   help="tune the normals-weighted program (its optimum "
                   "differs: the slope planes raise the live set)")
    t.add_argument("--impl", default="auto",
                   choices=("auto", "jnp", "pallas", "fused"))
    t.add_argument("--candidates", metavar="MIB,MIB,...",
                   help="budgets to sweep in MiB (default 16,20,24,32,48,64;"
                   " one 20-90 s remote compile each)")
    t.add_argument("--save", metavar="PATH",
                   help="merge the winner into this JSON cache file")

    s = sub.add_parser("serve", help="start the HTTP AO endpoint")
    s.add_argument("args", nargs=argparse.REMAINDER,
                   help="arguments passed through to examples/serve.py")
    return ap


# -- image IO ---------------------------------------------------------------

def _load_image(path: str) -> tuple[np.ndarray, bool]:
    """Load a frame; returns (array, was_png)."""
    if path.lower().endswith(".png"):
        from PIL import Image

        img = np.asarray(Image.open(path))
        scale = 65535.0 if img.dtype == np.uint16 else 255.0
        return np.asarray(img, np.float32) / scale, True
    from tpuao.utils.frameio import load_pfm

    return load_pfm(path), False


def _load_normals_frame(path: str) -> np.ndarray:
    """Load + validate a normals frame, decoding PNG normal maps.

    PNG normal maps carry the standard (n + 1) / 2 encoding; the
    pipeline wants signed view-space components in [-1, 1] (feeding
    [0, 1] pixel values silently skews the tangent test, review r3).
    Float 'PF' .pfm buffers are raw.  Shared by the local and remote
    render paths so validation and remap cannot drift."""
    normals, was_png = _load_image(path)
    if normals.ndim != 3 or 3 not in (normals.shape[0], normals.shape[-1]):
        raise ValueError("--normals must be a 3-channel buffer, got "
                         f"shape {normals.shape}")
    return normals * 2.0 - 1.0 if was_png else normals


def _match_streams(a, dpaths) -> dict:
    """Glob the --normals/--color patterns; each must match depth 1:1."""
    import glob as globlib

    out = {}
    for pat, name in ((a.normals, "--normals"), (a.color, "--color")):
        if pat:
            p = sorted(globlib.glob(pat))
            if len(p) != len(dpaths):
                raise ValueError(f"{name} matches {len(p)} files, "
                                 f"depth matches {len(dpaths)}")
            out[name] = p
    return out


def _save_image(path: str, arr: np.ndarray) -> None:
    if path.lower().endswith(".png"):
        # shared R8 quantization convention (utils/io.py::encode_ao_png)
        from tpuao.utils.io import save_ao_image

        save_ao_image(arr, path)
        return
    from tpuao.utils.frameio import save_pfm

    save_pfm(path, np.asarray(arr, np.float32))


# -- subcommands ------------------------------------------------------------

def _cmd_info(_a) -> int:
    import jax

    import tpuao

    try:
        devs = jax.devices()
        dev_info = {"backend": jax.default_backend(),
                    "devices": [str(d) for d in devs]}
    except Exception as e:  # no backend reachable
        dev_info = {"backend": None, "error": str(e)}
    print(json.dumps({
        "tpuao": tpuao.__version__,
        "jax": jax.__version__,
        **dev_info,
    }, indent=2))
    return 0


def _read_matrix16(spec: str):
    """--projection value -> 16 floats: a file path (whitespace/comma
    separated, '#' comments allowed) or the 16 values inline."""
    import os
    import re

    import numpy as np

    if os.path.exists(spec):
        with open(spec) as f:
            text = " ".join(line.split("#")[0] for line in f)
    else:
        text = spec
    vals = [float(v) for v in re.split(r"[\s,]+", text.strip()) if v]
    if len(vals) != 16:
        raise ValueError(
            f"--projection needs 16 floats, got {len(vals)} from {spec!r}")
    return np.array(vals).reshape(4, 4)


def _build_component(a, was_png: bool):
    """CLI flags -> validated (camera, params)."""
    from tpuao.models.pipeline import AmbientOcclusionEngine
    from tpuao.models.presets import preset
    from tpuao.params import AOParams, CameraParams

    if a.config:
        eng = AmbientOcclusionEngine.from_config(a.config, impl=a.impl)
        params, camera = eng.params, eng.camera
    else:
        params = preset(a.preset) if a.preset else AOParams()
        camera = CameraParams()
    if getattr(a, "projection", None):
        camera = CameraParams.from_projection(
            _read_matrix16(a.projection),
            convention=a.projection_convention)
    tunables = {k: getattr(a, k) for k in PARAM_RANGES
                if getattr(a, k) is not None}
    if tunables:
        params = params.replace(**tunables)
    cam_kw = {}
    if a.near is not None:
        cam_kw["near"] = a.near
    if a.far is not None:
        cam_kw["far"] = a.far
    if a.fov is not None:
        import math

        cam_kw["tan_half_fov_h"] = math.tan(math.radians(a.fov) / 2)
    # --projection implies hardware depth; the PNG->linear convenience
    # default must not silently override it
    depth_mode = a.depth_mode or (
        None if getattr(a, "projection", None)
        else ("linear" if was_png else None))
    if depth_mode:
        cam_kw["depth_mode"] = depth_mode
    if cam_kw:
        camera = camera.replace(**cam_kw)
    if a.normals and not params.use_normals:
        params = params.replace(use_normals=True)  # --normals implies it
    if a.fov is not None and not 0 < a.fov < 180:
        raise ValueError(f"--fov {a.fov} outside (0, 180)")
    return camera.validate(), params.validate()


def _cmd_tune(a) -> int:
    import jax

    from tpuao.utils import autotune

    try:
        h, w = (int(v) for v in a.shape.lower().split("x"))
    except ValueError:
        print(f"error: shape must be HxW, got {a.shape!r}", file=sys.stderr)
        return 2
    if jax.default_backend() != "tpu":
        print("warning: not on a TPU backend -- the scoped-VMEM flag is "
              "dropped and the sweep is meaningless; run on the device "
              "you deploy to", file=sys.stderr)
    candidates = autotune.DEFAULT_CANDIDATES_KIB
    if a.candidates:
        candidates = tuple(int(float(v) * 1024)
                           for v in a.candidates.split(","))
    res = autotune.tune_frame((h, w), use_normals=a.normals, impl=a.impl,
                              candidates=candidates)
    if a.save:
        if os.path.exists(a.save):
            with open(a.save) as f:
                prior = json.load(f)
            if (prior.get("entries")
                    and prior.get("device_kind") not in (
                        autotune._device_kind(), "unknown", None)):
                # refusing beats silently deleting another fleet's
                # measured budgets: save_tuned would rewrite the file
                # with only this process's entries
                print(f"error: {a.save} was tuned on "
                      f"{prior.get('device_kind')!r}, this host is "
                      f"{autotune._device_kind()!r}; use a separate "
                      "cache file per device kind", file=sys.stderr)
                return 2
            # merge: keep other shapes' entries, but a stale file entry
            # for THIS shape must not clobber the fresh measurement
            autotune.load_tuned(a.save)
            from tpuao.utils.xla_opts import set_tuned_vmem

            set_tuned_vmem(res["pixels"], res["use_normals"],
                           res["best_kib"])
        res["saved"] = autotune.save_tuned(a.save)
    print(json.dumps(res, indent=2))
    return 0


def _cmd_render_remote(a) -> int:
    """``--server``: POST frames to a running endpoint (tpuao.client).

    The thin-client path: image decode/encode and PNG normal remap stay
    local, the device render happens wherever ``tpuao serve`` runs.  The
    flags that configure the ENGINE (config/preset/impl/sections/...)
    are that server's state, not a request knob, so they are rejected
    here rather than silently ignored.  The depth convention is also the
    server engine's (``depth_mode`` is static); it is fetched from
    GET /config up front -- an explicit --depth-mode mismatch errors,
    and an implicit local-default mismatch (a .pfm defaults to hardware
    depth locally, the stock server renders linear) warns loudly
    instead of silently changing the answer.
    """
    import urllib.error

    bad = [f for f, on in (("--config", a.config), ("--preset", a.preset),
                           ("--impl", a.impl != "auto"),
                           ("--sections", a.sections > 1),
                           ("--debug-dump", a.debug_dump),
                           ("--autotune-cache", a.autotune_cache)) if on]
    if bad:
        print(f"error: {', '.join(bad)} configure the server-side engine; "
              "set them where `tpuao serve` runs", file=sys.stderr)
        return 2
    from tpuao.client import AOClient
    from tpuao.params import PARAM_RANGES as PR

    overrides = {k: getattr(a, k) for k in PR if getattr(a, k) is not None}
    overrides.update({k: getattr(a, k) for k in ("near", "far", "fov")
                      if getattr(a, k) is not None})
    client = AOClient(a.server)

    # depth_mode is server-side STATE (a static engine knob, not a
    # per-request query param), and the local and remote defaults
    # differ: a .pfm rendered locally defaults to hardware depth, but
    # the stock server engine is linear-mode.  The same command with
    # --server silently changing the depth interpretation would be a
    # wrong-answer trap, so check the server's convention up front:
    # an explicit --depth-mode that mismatches is an error, an implicit
    # mismatch of the local default gets a loud warning.
    try:
        server_mode = client.config()["camera"]["depth_mode"]
    except (RuntimeError, TimeoutError, OSError) as e:
        print(f"error: cannot reach {a.server}/config: {e}",
              file=sys.stderr)
        return 1
    local_default = ("linear" if a.input.lower().endswith(".png")
                     else "hardware")
    if a.depth_mode and a.depth_mode != server_mode:
        print(f"error: --depth-mode {a.depth_mode} but the server engine "
              f"renders depth_mode={server_mode!r} (a static knob; "
              "restart the server with the right engine or convert the "
              "input)", file=sys.stderr)
        return 2
    if not a.depth_mode and server_mode != local_default:
        print(f"note: server renders depth_mode={server_mode!r}; a local "
              f"render of this input would default to {local_default!r}. "
              f"Pass --depth-mode {server_mode} to confirm the input "
              "matches the server's convention and silence this.",
              file=sys.stderr)

    def one(dpath, npath, cpath, opath):
        depth, _ = _load_image(dpath)
        normals = _load_normals_frame(npath) if npath else None
        color = _load_image(cpath)[0] if cpath else None
        out_png = opath.lower().endswith(".png")
        res = client.render(depth, normals=normals, color=color,
                            out="png" if out_png else "pfm", **overrides)
        if out_png:
            with open(opath, "wb") as f:
                f.write(res)
        else:
            from tpuao.utils.frameio import save_pfm

            save_pfm(opath, res)
        return depth.shape

    try:
        if not any(c in a.input for c in "*?["):
            shape = one(a.input, a.normals, a.color, a.output)
            print(f"{a.input} {shape[1]}x{shape[0]} -> {a.output} "
                  f"(rendered by {a.server})")
            return 0
        import glob as globlib

        dpaths = sorted(globlib.glob(a.input))
        if not dpaths:
            print(f"error: no files match {a.input!r}", file=sys.stderr)
            return 2
        streams = _match_streams(a, dpaths)
        os.makedirs(a.output, exist_ok=True)
        npaths = streams.get("--normals", [None] * len(dpaths))
        cpaths = streams.get("--color", [None] * len(dpaths))

        def job(i):
            stem = os.path.splitext(os.path.basename(dpaths[i]))[0]
            one(dpaths[i], npaths[i], cpaths[i],
                os.path.join(a.output, f"{stem}_ao.{a.out_format}"))

        # --batch remotely = concurrent in-flight requests: sequential
        # POSTs would leave every server micro-batch flush at size 1
        # (see client.AOClient.render_many)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(1, a.batch)) as pool:
            list(pool.map(job, range(len(dpaths))))
        print(f"{len(dpaths)} frames -> {a.output} "
              f"(rendered by {a.server})")
        return 0
    except (RuntimeError, TimeoutError, urllib.error.URLError) as e:
        # backend/transport faults: message + status 1 (vs 2 for usage
        # errors); ValueError (client- or server-side validation)
        # propagates to main()'s shared handler
        print(f"error: {e}", file=sys.stderr)
        return 1


def _cmd_render(a) -> int:
    if a.temporal and not any(c in a.input for c in "*?["):
        print("error: --temporal accumulates across a frame sequence; "
              "pass a quoted glob input", file=sys.stderr)
        return 2
    if a.temporal and a.server:
        print("error: --temporal is local sequence state; the remote "
              "server renders stateless frames", file=sys.stderr)
        return 2
    if a.server:
        return _cmd_render_remote(a)
    if a.autotune_cache:
        from tpuao.utils import autotune

        autotune.load_tuned(a.autotune_cache)
    if any(c in a.input for c in "*?["):
        return _cmd_render_sequence(a)
    from tpuao.models.pipeline import AmbientOcclusionEngine

    depth, was_png = _load_image(a.input)
    if depth.ndim != 2:
        print(f"error: depth must be single-channel, got {depth.shape}",
              file=sys.stderr)
        return 2
    camera, params = _build_component(a, was_png)

    normals = _load_normals_frame(a.normals) if a.normals else None
    color = _load_image(a.color)[0] if a.color else None

    if a.sections > 1:
        if a.debug_dump:
            # validate BEFORE rendering: the incompatibility must not
            # burn the (remote-compiled) sections render just to error
            print("error: --debug-dump needs the monolithic path "
                  "(drop --sections)", file=sys.stderr)
            return 2
        from tpuao.parallel.sections import render_frame_sections

        ao = render_frame_sections(depth, camera, params,
                                   n_sections=a.sections, impl=a.impl,
                                   normals=normals, color=color)
    else:
        eng = AmbientOcclusionEngine(camera, params, impl=a.impl)
        if a.debug_dump:
            ao, dbg = eng.render(depth, normals=normals, color=color,
                                 debug_outputs=True)
            from tpuao.utils.debug_dump import dump_debug_buffers

            dump_debug_buffers(dbg, a.debug_dump)
        else:
            ao = eng.render(depth, normals=normals, color=color)

    ao = np.asarray(ao)
    _save_image(a.output, ao)
    print(f"{a.input} {depth.shape[1]}x{depth.shape[0]} -> {a.output} "
          f"(ao mean {float(np.mean(ao)):.4f}, "
          f"min {float(np.min(ao)):.4f})")
    return 0


def _cmd_render_sequence(a) -> int:
    """Glob input -> directory of AO frames, prefetcher-pipelined.

    Frames stream through ``utils.frameio.FramePrefetcher`` in batches of
    ``--batch`` (decode of batch k+1 overlaps the device render of batch
    k); the final partial batch is padded by repeating its last frame so
    every launch reuses ONE compiled batched program, then cropped.  All
    frames in a sequence must share one shape (the video contract of
    ``load_pfm_batch``).
    """
    import glob as globlib

    from tpuao.models.pipeline import AmbientOcclusionEngine
    from tpuao.utils.frameio import FramePrefetcher

    dpaths = sorted(globlib.glob(a.input))
    if not dpaths:
        print(f"error: no files match {a.input!r}", file=sys.stderr)
        return 2
    if any(not p.lower().endswith(".pfm") for p in dpaths):
        print("error: sequence mode streams PFM frames (the prefetcher's "
              "native codec); convert PNGs first or render per-frame",
              file=sys.stderr)
        return 2
    if a.debug_dump or a.sections > 1:
        print("error: --debug-dump/--sections need single-frame mode",
              file=sys.stderr)
        return 2
    matched = _match_streams(a, dpaths)
    streams = [dpaths] + [matched[k] for k in ("--normals", "--color")
                          if k in matched]
    camera, params = _build_component(a, was_png=False)
    if a.temporal:
        return _render_sequence_temporal(a, dpaths, streams, camera, params)
    eng = AmbientOcclusionEngine(camera, params, impl=a.impl)

    bs = max(1, a.batch)
    batches = []
    for i in range(0, len(dpaths), bs):
        sl = tuple(s[i:i + bs] for s in streams)
        batches.append(sl if len(streams) > 1 else sl[0])
    os.makedirs(a.output, exist_ok=True)

    done = 0
    with FramePrefetcher(batches) as pf:
        for got in pf:
            arrs = list(got) if isinstance(got, tuple) else [got]
            n = arrs[0].shape[0]
            if n < bs and done + n < len(dpaths):  # mid-stream mismatch
                raise AssertionError("short batch before the end")
            if n < bs:  # pad the tail batch: one compiled shape total
                arrs = [np.concatenate([x, np.repeat(x[-1:], bs - n, 0)])
                        for x in arrs]
            it = iter(arrs[1:])
            ao = np.asarray(eng.render(
                arrs[0],
                normals=next(it) if a.normals else None,
                color=next(it) if a.color else None))[:n]
            for j in range(n):
                stem = os.path.splitext(os.path.basename(
                    dpaths[done + j]))[0]
                _save_image(os.path.join(a.output,
                                         f"{stem}_ao.{a.out_format}"),
                            ao[j])
            done += n
    kinds = "depth" + ("+normals" if a.normals else "") + \
        ("+color" if a.color else "")
    print(f"{done} frames -> {a.output} (batch {bs}, {kinds})")
    return 0


def _render_sequence_temporal(a, dpaths, streams, camera, params) -> int:
    """--temporal sequence branch: frames render IN ORDER through a
    TemporalAOEngine (history state forbids batching the device render;
    the prefetcher still pipelines decode of the next batch under the
    current batch's renders)."""
    import json

    from tpuao.models.pipeline import TemporalAOEngine
    from tpuao.params import TemporalParams
    from tpuao.utils.frameio import FramePrefetcher

    views = None
    if a.camera_path:
        with open(a.camera_path) as f:
            raw = json.load(f)
        views = [np.asarray(v, np.float64).reshape(4, 4) for v in raw]
        if len(views) != len(dpaths):
            print(f"error: --camera-path has {len(views)} views for "
                  f"{len(dpaths)} frames", file=sys.stderr)
            return 2
    tp = TemporalParams(
        history_weight=(0.9 if a.history_weight is None
                        else a.history_weight),
        depth_tolerance=(0.1 if a.depth_tolerance is None
                         else a.depth_tolerance),
        neighborhood_clamp=not a.no_temporal_clamp).validate()
    eng = TemporalAOEngine(camera, params, tparams=tp, impl=a.impl,
                           resolve_level=a.resolve_level)

    bs = max(1, a.batch)
    batches = []
    for i in range(0, len(dpaths), bs):
        sl = tuple(s[i:i + bs] for s in streams)
        batches.append(sl if len(streams) > 1 else sl[0])
    os.makedirs(a.output, exist_ok=True)

    done = 0
    with FramePrefetcher(batches) as pf:
        for got in pf:
            arrs = list(got) if isinstance(got, tuple) else [got]
            it = iter(arrs[1:])
            nrm = next(it) if a.normals else None
            col = next(it) if a.color else None
            for j in range(arrs[0].shape[0]):
                t = done + j
                ao = np.asarray(eng.render(
                    arrs[0][j],
                    normals=None if nrm is None else nrm[j],
                    color=None if col is None else col[j],
                    view=None if views is None else views[t]))
                stem = os.path.splitext(os.path.basename(dpaths[t]))[0]
                _save_image(os.path.join(a.output,
                                         f"{stem}_ao.{a.out_format}"), ao)
            done += arrs[0].shape[0]
    kinds = "depth" + ("+normals" if a.normals else "") + \
        ("+color" if a.color else "")
    print(f"{done} frames -> {a.output} (temporal, "
          f"{'camera path' if views is not None else 'static camera'}, "
          f"{kinds})")
    return 0


def _cmd_serve(a) -> int:
    serve_py = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "serve.py")
    if not os.path.exists(serve_py):
        print("error: examples/serve.py not found next to the package "
              "(serve runs from a source checkout)", file=sys.stderr)
        return 2
    import importlib.util

    spec = importlib.util.spec_from_file_location("tpuao_serve", serve_py)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["serve"] + list(a.args))
    return 0


def main(argv=None) -> int:
    if os.environ.get("JAX_PLATFORMS"):
        # the axon sitecustomize force-sets jax_platforms in every
        # process; honor an explicit JAX_PLATFORMS=cpu anyway
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    a = _build_parser().parse_args(argv)
    try:
        return {"info": _cmd_info, "render": _cmd_render,
                "tune": _cmd_tune, "serve": _cmd_serve}[a.cmd](a)
    except ValueError as e:
        # validation errors (param/camera ranges, bad config values) exit
        # like every other CLI usage error: message + status 2, no trace
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
