"""IO helpers + timing-utility smoke tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuao.utils.io import (
    load_depth_image,
    save_ao_image,
    save_composite_image,
)
from tpuao.utils.profiling import device_time_ms


def test_depth_image_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    ao = rng.uniform(size=(32, 48))
    p = str(tmp_path / "ao.png")
    save_ao_image(ao, p)
    z = load_depth_image(p, near01=0.0, far01=1.0)
    assert z.shape == (32, 48)
    np.testing.assert_allclose(z, ao, atol=1 / 255.0 + 1e-9)


def test_save_composite(tmp_path):
    color = np.ones((16, 16, 3)) * 0.8
    ao = np.full((16, 16), 0.5)
    p = save_composite_image(color, ao, str(tmp_path / "c.png"))
    z = load_depth_image(p, 0.0, 1.0)
    np.testing.assert_allclose(z, 0.4, atol=1 / 255.0)


def test_device_time_ms_smoke():
    x = jnp.ones((64, 128), jnp.float32)
    ms = device_time_ms(lambda a: a * 2.0 + 1.0, x, iters=4, repeats=1)
    assert np.isfinite(ms)


def test_host_chain_time_ms_smoke():
    """Multi-launch host-driven chain: two jitted launches per iteration
    (the sections-mode timing path) must produce a finite estimate."""
    import jax

    from tpuao.utils.profiling import host_chain_time_ms

    f1 = jax.jit(lambda a: a * 2.0)
    f2 = jax.jit(lambda a: a + 1.0)
    x = jnp.ones((64, 128), jnp.float32)
    ms = host_chain_time_ms(lambda a: f2(f1(a)), x, iters=3, repeats=1)
    assert np.isfinite(ms)


@pytest.mark.slow
def test_stage_times_covers_all_stages():
    from tpuao.params import AOParams, CameraParams
    from tpuao.utils.fixtures import spheres_on_plane
    from tpuao.utils.profiling import stage_times_ms

    z, n = spheres_on_plane(64, 128, n_spheres=2, seed=0, with_normals=True)
    times = stage_times_ms(jnp.asarray(z, jnp.float32),
                           CameraParams(depth_mode="linear"),
                           AOParams(use_normals=True, hierarchy_depth=2),
                           normals=jnp.asarray(n, jnp.float32), iters=2)
    assert set(times) == {"prepare", "render_l1", "render_l2",
                          "upsample_l1", "upsample_l2", "full_pipeline"}
    assert all(np.isfinite(v) for v in times.values())


@pytest.mark.slow
def test_demo_script(tmp_path):
    import subprocess
    import sys
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "examples/demo.py", "96x128", str(tmp_path)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    for f in ("depth.png", "ao.png", "ao_normals.png", "ao_level1.png"):
        assert (tmp_path / f).exists(), f


@pytest.mark.slow
def test_streaming_script(tmp_path):
    import subprocess
    import sys
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "examples/streaming.py", "96x128", "4",
         str(tmp_path)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "ao_last.png").exists()
    assert "4 frames" in r.stdout


@pytest.mark.slow
def test_streaming_script_normals(tmp_path):
    """--normals mode: PF normals + color triples through the prefetcher
    into the normal-weighted estimator + on-device composite."""
    import subprocess
    import sys
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "examples/streaming.py", "96x128", "2",
         str(tmp_path), "--normals"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "ao_last.png").exists()
    assert "depth+normals+composite" in r.stdout


@pytest.mark.slow
def test_streaming_script_temporal(tmp_path):
    """--temporal mode: one world scene from a dollying eye through the
    stateful TemporalAOEngine (view-matrix motion derivation)."""
    import subprocess
    import sys
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "examples/streaming.py", "96x128", "3",
         str(tmp_path), "--temporal"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "ao_last.png").exists()
    assert "temporal dolly" in r.stdout


def test_serve_endpoint():
    """In-process round-trip through the serving endpoint: PFM depth in,
    PFM AO out; per-request tunables; config introspection."""
    import sys
    import threading
    import urllib.request

    sys.path.insert(0, "/root/repo/examples")
    import serve as S

    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        # readiness contract: 503 until a frame has rendered
        try:
            urllib.request.urlopen(f"{base}/healthz")
            assert False, "expected 503 before warmup"
        except urllib.error.HTTPError as e:
            assert e.code == 503
        cfg = __import__("json").loads(
            urllib.request.urlopen(f"{base}/config").read())
        assert cfg["ao"]["strength"] == 1.0

        z = F.spheres_on_plane(96, 128, n_spheres=3, seed=2
                               ).astype(np.float32)
        req = urllib.request.Request(f"{base}/ao?strength=2.0",
                                     data=dumps_pfm(z))
        ao = loads_pfm(urllib.request.urlopen(req).read())
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"
        cam = CameraParams(depth_mode="linear")
        want = np.asarray(render_frame(z, cam, AOParams(strength=2.0)))
        np.testing.assert_allclose(ao, want, atol=1e-6)

        # per-request camera override (traced scalars, like tunables)
        import math

        req = urllib.request.Request(f"{base}/ao?fov=80&far=50",
                                     data=dumps_pfm(z))
        ao = loads_pfm(urllib.request.urlopen(req).read())
        cam80 = CameraParams(
            depth_mode="linear", far=50.0,
            tan_half_fov_h=math.tan(math.radians(80.0) / 2))
        want = np.asarray(render_frame(z, cam80, AOParams()))
        np.testing.assert_allclose(ao, want, atol=1e-6)

        # png output path
        resp = urllib.request.urlopen(urllib.request.Request(
            f"{base}/ao?out=png", data=dumps_pfm(z)))
        assert resp.headers["Content-Type"] == "image/png"
        assert resp.read()[:8] == b"\x89PNG\r\n\x1a\n"

        # bad inputs are 400s, not 500s
        bad = urllib.request.Request(f"{base}/ao?nonsense=1",
                                     data=dumps_pfm(z))
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # observability: /stats counted every request above
        stats = __import__("json").loads(
            urllib.request.urlopen(f"{base}/stats").read())
        assert stats["requests"] == stats["ok"] + stats["errors"]
        assert stats["errors"] == 1 and stats["ok"] == 3
        assert stats["direct"] == 3  # no batcher; 400 rejected pre-route
        assert stats["latency_ms"]["count"] == 3
        assert stats["latency_ms"]["p50"] <= stats["latency_ms"]["max"]

        # a 3-channel 'PF' body is a 400 on the DIRECT path too (it
        # would otherwise be misread as a leading batch of (W, 3)
        # frames and return garbage with a 200)
        bad3 = urllib.request.Request(
            f"{base}/ao?strength=1.5",
            data=dumps_pfm(np.zeros((8, 8, 3), np.float32)))
        try:
            urllib.request.urlopen(bad3)
            assert False, "expected HTTP 400 for 3-channel body"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # degenerate camera overrides are 400s, not NaN frames with a
        # 200: far <= near, near <= 0, fov outside (0, 180)
        for qs in ("far=0.05", "near=0", "fov=200"):
            badc = urllib.request.Request(f"{base}/ao?{qs}",
                                          data=dumps_pfm(z))
            try:
                urllib.request.urlopen(badc)
                assert False, f"expected HTTP 400 for {qs}"
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_endpoint_batched():
    """batch_size routes default-tunable requests through MicroBatcher;
    concurrent clients still each get their own frame's AO."""
    import sys
    import threading
    import urllib.request

    from tpuao import serving as S
    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0, batch_size=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        frames = [F.spheres_on_plane(96, 128, n_spheres=3, seed=5 + i
                                     ).astype(np.float32) for i in range(4)]
        results = {}

        def post(i):
            req = urllib.request.Request(f"{base}/ao",
                                         data=dumps_pfm(frames[i]))
            results[i] = loads_pfm(urllib.request.urlopen(req).read())

        ts = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for th in ts:
            th.start()
        for th in ts:
            th.join(timeout=300)
        cam = CameraParams(depth_mode="linear")
        for i, z in enumerate(frames):
            want = np.asarray(render_frame(z, cam, AOParams()))
            np.testing.assert_allclose(results[i], want, atol=1e-6)

        # /stats exposes the batcher's flush accounting
        stats = __import__("json").loads(
            urllib.request.urlopen(f"{base}/stats").read())
        assert stats["batched"] == 4 and stats["ok"] == 4
        b = stats["batcher"]
        assert b["frames"] == 4
        assert b["frames"] + b["padded"] == 2 * b["flushes"]
    finally:
        srv.batcher.close()
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_serve_endpoint_view_sharded():
    """mesh= routes batcher flushes through render_views (the config-5
    fleet-serving shape): each flush renders view-sharded over the CPU
    mesh; concurrent clients still get their own frames back."""
    import threading
    import urllib.request

    from tpuao import serving as S
    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams
    from tpuao.parallel.sharding import make_mesh
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0, mesh=make_mesh(4))  # batch_size defaults to 4
    assert srv.batcher is not None and srv.batcher._bs == 4
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        frames = [F.spheres_on_plane(96, 128, n_spheres=3, seed=40 + i
                                     ).astype(np.float32) for i in range(4)]
        results = {}

        def post(i):
            req = urllib.request.Request(f"{base}/ao",
                                         data=dumps_pfm(frames[i]))
            results[i] = loads_pfm(urllib.request.urlopen(req).read())

        ts = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for th in ts:
            th.start()
        for th in ts:
            th.join(timeout=300)
        cam = CameraParams(depth_mode="linear")
        for i, z in enumerate(frames):
            want = np.asarray(render_frame(z, cam, AOParams()))
            np.testing.assert_allclose(results[i], want, atol=1e-6,
                                       err_msg=str(i))
    finally:
        srv.shutdown()
        srv.server_close()  # AOServer.server_close also closes the batcher
    assert srv.batcher._closed


@pytest.mark.slow
def test_serve_endpoint_multibuffer():
    """Normals / color ride the same POST body as concatenated PFM
    frames (config-3-style serving): depth+normals renders the
    normal-weighted program, depth+normals+color (and ?buffers=
    depth,color) return the composited frame; malformed multi-buffer
    bodies are 400s."""
    import threading
    import urllib.request

    from tpuao import serving as S
    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z, nrm = F.spheres_on_plane(96, 128, n_spheres=3, seed=6,
                                    with_normals=True)
        z = z.astype(np.float32)
        nrm = nrm.astype(np.float32)
        rng = np.random.default_rng(0)
        color = rng.uniform(0.0, 1.0, (96, 128, 3)).astype(np.float32)
        cam = CameraParams(depth_mode="linear")

        def post(qs, *frames):
            req = urllib.request.Request(
                f"{base}/ao{qs}", data=b"".join(dumps_pfm(f)
                                                for f in frames))
            return loads_pfm(urllib.request.urlopen(req).read())

        # depth + normals -> normal-weighted AO (static-knob flip)
        ao = post("", z, nrm)
        want = np.asarray(render_frame(
            z, cam, AOParams(use_normals=True), normals=nrm))
        np.testing.assert_allclose(ao, want, atol=1e-6)
        depth_only = np.asarray(render_frame(z, cam, AOParams()))
        assert np.abs(ao - depth_only).max() > 1e-4  # knob actually flipped

        # depth + normals + color -> composited (H, W, 3), tunables too
        out = post("?strength=2.0", z, nrm, color)
        want = np.asarray(render_frame(
            z, cam, AOParams(use_normals=True, strength=2.0),
            normals=nrm, color=color))
        assert out.shape == (96, 128, 3)
        np.testing.assert_allclose(out, want, atol=1e-6)

        # ?buffers=depth,color: composite without a normals buffer
        out = post("?buffers=depth,color", z, color)
        want = np.asarray(render_frame(z, cam, AOParams(), color=color))
        np.testing.assert_allclose(out, want, atol=1e-6)

        # png output of a composited frame is RGB
        req = urllib.request.Request(
            f"{base}/ao?buffers=depth,color&out=png",
            data=dumps_pfm(z) + dumps_pfm(color))
        resp = urllib.request.urlopen(req)
        assert resp.headers["Content-Type"] == "image/png"
        assert resp.read()[:8] == b"\x89PNG\r\n\x1a\n"

        # malformed multi-buffer bodies are 400s, not 500s
        bad_bodies = [
            ("", dumps_pfm(z) + dumps_pfm(nrm) + dumps_pfm(color)
             + dumps_pfm(z)),                         # 4 frames
            ("", dumps_pfm(z) + dumps_pfm(z)),        # 2-D normals frame
            ("?buffers=depth,normals", dumps_pfm(z)),  # count mismatch
            ("?buffers=color,depth", dumps_pfm(color) + dumps_pfm(z)),
            ("", dumps_pfm(z)
             + dumps_pfm(nrm[:48])),                  # H mismatch
            ("?buffers=depth,color", dumps_pfm(z)
             + dumps_pfm(color[:, :64])),             # W mismatch
        ]
        for qs, body in bad_bodies:
            try:
                urllib.request.urlopen(
                    urllib.request.Request(f"{base}/ao{qs}", data=body))
                assert False, f"expected HTTP 400 for {qs or body[:16]}"
            except urllib.error.HTTPError as e:
                assert e.code == 400, qs
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_serve_multibuffer_rides_batcher():
    """Default-knob normals requests route through the micro-batcher
    (not forced direct): concurrent same-shape normals requests share a
    flush and the results match the direct render."""
    import threading
    import urllib.request

    from tpuao import serving as S
    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0, batch_size=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z, nrm = F.spheres_on_plane(96, 128, n_spheres=3, seed=9,
                                    with_normals=True)
        z = z.astype(np.float32)
        nrm = nrm.astype(np.float32)
        body = dumps_pfm(z) + dumps_pfm(nrm)
        results = [None, None]

        def post(i):
            req = urllib.request.Request(f"{base}/ao", data=body)
            results[i] = loads_pfm(
                urllib.request.urlopen(req, timeout=600).read())

        ts = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        want = np.asarray(render_frame(
            z, CameraParams(depth_mode="linear"),
            AOParams(use_normals=True), normals=nrm))
        for r in results:
            np.testing.assert_allclose(r, want, atol=1e-6)
        assert srv.stats["batched"] == 2 and srv.stats["direct"] == 0
        st = srv.batcher.stats()
        assert st["frames"] == 2 and st["flushes"] >= 1
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_serve_multibuffer_view_sharded_batcher():
    """Fleet shape + multi-buffer: normals flushes render view-sharded
    across the mesh and match the single-device program."""
    import threading
    import urllib.request

    from tpuao import serving as S
    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams
    from tpuao.parallel.sharding import make_mesh
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0, mesh=make_mesh(2))  # batch_size = mesh size
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z, nrm = F.spheres_on_plane(96, 128, n_spheres=3, seed=13,
                                    with_normals=True)
        z = z.astype(np.float32)
        nrm = nrm.astype(np.float32)
        body = dumps_pfm(z) + dumps_pfm(nrm)
        results = [None, None]

        def post(i):
            req = urllib.request.Request(f"{base}/ao", data=body)
            results[i] = loads_pfm(
                urllib.request.urlopen(req, timeout=600).read())

        ts = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        want = np.asarray(render_frame(
            z, CameraParams(depth_mode="linear"),
            AOParams(use_normals=True), normals=nrm))
        for r in results:
            np.testing.assert_allclose(r, want, atol=1e-6)
        assert srv.stats["batched"] == 2
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_warm_server_compiles_all_advertised_programs():
    """warm_server marks the server ready and pre-compiles every
    program combination the /ao handler can route to, so the first
    real normals/composite request does not eat a compile after the
    readiness gate already said 200."""
    import pytest

    from tpuao import serving as S

    srv = S.make_server(0, batch_size=2)
    try:
        assert not srv.warmed
        warmed = S.warm_server(srv, (64, 96), ("normals",))
        assert srv.warmed
        # every ladder rung per combination (batch_size=2 -> rungs 1, 2);
        # one extra buffer suffices to pin the combination x rung grid
        # (the full normals+color product is exercised by the endpoint
        # tests; this was a 135 s test at the full product)
        assert warmed == [
            "depth", "depth[batch 1]", "depth[batch 2]",
            "depth+normals", "depth+normals[batch 1]",
            "depth+normals[batch 2]"]
        with pytest.raises(ValueError, match="unknown warmup buffers"):
            S.warm_server(srv, (64, 96), ("normals", "albedo"))
        # "temporal" adds the ?session= static+moving programs per combo
        warmed_t = S.warm_server(srv, (64, 96), ("temporal",))
        assert warmed_t == [
            "depth", "depth[temporal static+moving]",
            "depth[batch 1]", "depth[batch 2]"]
    finally:
        srv.batcher.close()
        srv.server_close()


def test_serve_retries_transient_faults(monkeypatch):
    """A transient relay fault (the observed UNAVAILABLE / HTTP 500
    class) is retried inside the endpoint instead of surfacing as a
    client 500; a persistent fault still 500s."""
    import threading
    import urllib.request

    from tpuao import serving as S
    from tpuao.utils import fixtures as F
    from tpuao.utils import resilience
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    # the retry backoff (2 + 4 s across both cases) is real wall-clock
    # the suite should not pay; the retry LOGIC is what's under test
    monkeypatch.setattr(resilience.time, "sleep", lambda s: None)
    real = S.render_frame
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("UNAVAILABLE: TPU worker process crashed "
                               "or restarted")
        return real(*a, **kw)

    monkeypatch.setattr(S, "render_frame", flaky)
    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z = F.spheres_on_plane(96, 128, n_spheres=3, seed=2
                               ).astype(np.float32)
        req = urllib.request.Request(f"{base}/ao", data=dumps_pfm(z))
        ao = loads_pfm(urllib.request.urlopen(req, timeout=300).read())
        assert calls["n"] == 2  # failed once, retried, served
        assert ao.shape == z.shape

        # persistent faults exhaust retries and surface as a 500
        def dead(*a, **kw):
            raise RuntimeError("UNAVAILABLE: TPU worker process crashed")

        monkeypatch.setattr(S, "render_frame", dead)
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/ao", data=dumps_pfm(z)), timeout=300)
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500

        # the batcher path is wrapped with the same retry policy
        srv2 = S.make_server(0, batch_size=2)
        try:
            assert getattr(srv2.batcher._render, "__wrapped__", None) \
                is not None
        finally:
            srv2.batcher.close()
            srv2.server_close()
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_serve_load_script():
    """The full-stack serving load harness runs and its accounting is
    self-consistent (all requests complete, all ride the batcher)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "benchmarks/serve_load.py", "--shape", "96x128",
         "--requests", "8", "--concurrency", "4", "--batch", "2"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout)
    assert out["completed"] == 8 and not out["errors"]
    assert out["server_stats"]["batched"] == 8
    assert out["server_stats"]["errors"] == 0
    assert out["client_latency_ms"]["p50"] is not None


@pytest.mark.slow
def test_calibrate_script():
    import subprocess
    import sys
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "examples/calibrate.py", "64x96", "--steps", "20"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "strength" in r.stdout


def test_serve_temporal_session():
    """Stateful temporal sessions: the server carries per-session history
    and resolves each posted frame against it (matching a local
    TemporalAOEngine fed the same frames+views); reset, session guard
    rails, DELETE, and /stats accounting."""
    import json
    import sys
    import threading
    import urllib.request

    sys.path.insert(0, "/root/repo/examples")
    import serve as S

    from tpuao.models.pipeline import TemporalAOEngine
    from tpuao.params import CameraParams
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        h, w = 80, 96
        frames = [F.spheres_on_plane(h, w, n_spheres=2, seed=s
                                     ).astype(np.float32)
                  for s in (1, 2, 3)]
        views = []
        for k in range(3):
            v = np.eye(4)
            v[0, 3] = 0.03 * k  # camera slides between frames
            views.append(v)

        def post(qs, z):
            req = urllib.request.Request(f"{base}/ao?{qs}",
                                         data=dumps_pfm(z))
            return loads_pfm(urllib.request.urlopen(req).read())

        eng = TemporalAOEngine(CameraParams(depth_mode="linear"))
        for k, (z, v) in enumerate(zip(frames, views)):
            vq = ",".join(repr(float(x)) for x in v.ravel())
            got = post(f"session=stream1&view={vq}", z)
            want = np.asarray(eng.render(z, view=v))
            np.testing.assert_allclose(got, want, atol=1e-6), k

        # reset drops history: the same frame resolves to its own
        # single-frame AO again (== a fresh local engine's frame 0)
        got = post("session=stream1&reset=1", frames[0])
        eng2 = TemporalAOEngine(CameraParams(depth_mode="linear"))
        np.testing.assert_allclose(got, np.asarray(eng2.render(frames[0])),
                                   atol=1e-6)

        # temporal tunables ride per-request
        got = post("session=stream1&history_weight=0.5", frames[1])
        eng2.history_weight = 0.5
        np.testing.assert_allclose(got, np.asarray(eng2.render(frames[1])),
                                   atol=1e-6)

        # guard rails: all 400s
        for qs, z in (
                ("view=1,0,0,0", frames[0]),          # view needs session
                ("reset=1", frames[0]),               # reset needs session
                ("history_weight=0.5", frames[0]),    # tparams need session
                ("session=bad/chars", frames[0]),     # id charset
                ("session=s2&view=1,2,3", frames[0]),  # not 16 floats
                ("session=s2&view=" + ",".join(["0"] * 16)
                 + "&motion=" + ",".join(["0"] * 16), frames[0]),
        ):
            try:
                post(qs, z)
                assert False, f"expected 400 for {qs}"
            except urllib.error.HTTPError as e:
                assert e.code == 400, qs

        # camera overrides bind at creation, are rejected mid-stream
        got = post("session=s3&fov=80", frames[0])
        import math

        eng3 = TemporalAOEngine(CameraParams(
            depth_mode="linear",
            tan_half_fov_h=math.tan(math.radians(80.0) / 2)))
        np.testing.assert_allclose(got, np.asarray(eng3.render(frames[0])),
                                   atol=1e-6)
        try:
            post("session=s3&fov=60", frames[1])
            assert False, "expected 400 for mid-stream camera change"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["sessions"] == 2  # stream1 + s3
        # routing is counted before the render (like direct/batched), so
        # the mid-stream camera 400 above counts as temporal but not ok
        assert stats["temporal"] == stats["ok"] + 1

        # DELETE drops the session; a second DELETE 404s
        req = urllib.request.Request(f"{base}/session/stream1",
                                     method="DELETE")
        assert urllib.request.urlopen(req).status == 200
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/session/stream1", method="DELETE"))
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["sessions"] == 1
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_temporal_session_ttl_eviction():
    """Idle sessions are evicted on the next session request (history is
    device HBM; abandoned streams must not park it forever)."""
    import sys
    import threading
    import urllib.request

    sys.path.insert(0, "/root/repo/examples")
    import serve as S

    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm

    srv = S.make_server(0)
    srv.session_ttl = 0.05
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z = F.spheres_on_plane(48, 64, n_spheres=2, seed=4
                               ).astype(np.float32)

        def post(qs):
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/ao?{qs}", data=dumps_pfm(z))).read()

        post("session=a")
        assert "a" in srv.sessions
        import time as _time

        _time.sleep(0.1)
        post("session=b")  # the sweep runs on session requests
        assert "a" not in srv.sessions and "b" in srv.sessions
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_temporal_session_resume_and_overlay():
    """Review-fix pins: (a) a TTL-evicted stream resumed with the SAME
    camera rebinds it (identical re-sends accepted; only changes 400) and
    signals the restart via X-TPUAO-Session-Frame: 0; (b) session
    tunables are per-request overlays like the stateless path, not
    sticky mutations."""
    import sys
    import threading
    import time as _time
    import urllib.request

    sys.path.insert(0, "/root/repo/examples")
    import serve as S

    from tpuao.models.pipeline import render_frame_temporal
    from tpuao.params import AOParams, CameraParams, TemporalParams
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z = [F.spheres_on_plane(64, 96, n_spheres=2, seed=s
                                ).astype(np.float32) for s in (7, 8)]

        def post(qs, depth):
            req = urllib.request.Request(f"{base}/ao?{qs}",
                                         data=dumps_pfm(depth))
            r = urllib.request.urlopen(req)
            return (loads_pfm(r.read()),
                    int(r.headers["X-TPUAO-Session-Frame"]))

        # (a) camera re-send + TTL restart detection
        _, f0 = post("session=r1&fov=80", z[0])
        _, f1 = post("session=r1&fov=80", z[1])  # identical re-send ok
        assert (f0, f1) == (0, 1)
        srv.session_ttl = 0.05
        _time.sleep(0.1)
        got, f2 = post("session=r1&fov=80", z[0])  # evicted -> rebinds
        assert f2 == 0  # restart is visible to the client
        import math

        cam80 = CameraParams(
            depth_mode="linear",
            tan_half_fov_h=math.tan(math.radians(80.0) / 2))
        want, _ = render_frame_temporal(z[0], None, cam80, AOParams(),
                                        TemporalParams())
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)
        srv.session_ttl = 600.0
        try:
            post("session=r1&fov=60", z[0])  # a CHANGE still 400s
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # (b) overlay tunables: frame 1 with strength=2, frame 2 bare
        got1, _ = post("session=ov&strength=2.0", z[0])
        got2, _ = post("session=ov", z[1])
        cam = CameraParams(depth_mode="linear")
        w1, st = render_frame_temporal(z[0], None, cam,
                                       AOParams(strength=2.0),
                                       TemporalParams())
        w2, _ = render_frame_temporal(z[1], st, cam, AOParams(),
                                      TemporalParams())
        np.testing.assert_allclose(got1, np.asarray(w1), atol=1e-6)
        np.testing.assert_allclose(got2, np.asarray(w2), atol=1e-6)
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_temporal_session_failed_frame_restores_history(monkeypatch):
    """A frame that 500s terminally must leave the session history
    exactly as before the attempt (review fix: a poisoned/half-advanced
    state would mis-blend every later frame)."""
    import sys
    import threading
    import urllib.request

    sys.path.insert(0, "/root/repo/examples")
    import serve as S

    from tpuao.models.pipeline import TemporalAOEngine
    from tpuao.params import CameraParams
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z = [F.spheres_on_plane(48, 64, n_spheres=2, seed=s
                                ).astype(np.float32) for s in (1, 2, 3)]

        def post(qs, depth):
            req = urllib.request.Request(f"{base}/ao?{qs}",
                                         data=dumps_pfm(depth))
            return loads_pfm(urllib.request.urlopen(req).read())

        post("session=hf", z[0])
        # make the next render fail persistently (not transient-classed)
        from tpuao.models import pipeline as P

        real = P.render_frame_temporal

        def boom(*a, **kw):
            raise RuntimeError("injected persistent fault")

        monkeypatch.setattr(P, "render_frame_temporal", boom)
        try:
            post("session=hf", z[1])
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
        monkeypatch.setattr(P, "render_frame_temporal", real)
        got = post("session=hf", z[2])
        # reference: the failed frame never happened
        eng = TemporalAOEngine(CameraParams(depth_mode="linear"))
        eng.render(z[0])
        want = np.asarray(eng.render(z[2]))
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_session_failed_reset_frame_restores_history(monkeypatch):
    """Advisor r4: a ?reset=1 frame that 500s terminally must restore
    the PRE-reset history and frame counter (the snapshot is taken
    before the reset is applied) -- the failed scene cut never
    happened."""
    import threading
    import urllib.request

    from tpuao import serving as S
    from tpuao.models.pipeline import TemporalAOEngine
    from tpuao.params import CameraParams
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm, loads_pfm

    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z = [F.spheres_on_plane(48, 64, n_spheres=2, seed=s
                                ).astype(np.float32) for s in (1, 2, 3)]

        def post(qs, depth):
            req = urllib.request.Request(f"{base}/ao?{qs}",
                                         data=dumps_pfm(depth))
            r = urllib.request.urlopen(req)
            return (loads_pfm(r.read()),
                    int(r.headers["X-TPUAO-Session-Frame"]))

        _, f0 = post("session=rr", z[0])
        _, f1 = post("session=rr", z[1])
        assert (f0, f1) == (0, 1)
        from tpuao.models import pipeline as P

        real = P.render_frame_temporal

        def boom(*a, **kw):
            raise RuntimeError("injected persistent fault")

        monkeypatch.setattr(P, "render_frame_temporal", boom)
        try:
            post("session=rr&reset=1", z[2])
            assert False, "expected 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
        monkeypatch.setattr(P, "render_frame_temporal", real)
        got, f2 = post("session=rr", z[2])
        assert f2 == 2  # counter restored: the failed reset never happened
        eng = TemporalAOEngine(CameraParams(depth_mode="linear"))
        eng.render(z[0])
        eng.render(z[1])
        want = np.asarray(eng.render(z[2]))  # history NOT dropped
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_session_table_full_503():
    """Advisor r4: a full session table is transient resource
    exhaustion (TTL eviction clears it) -> HTTP 503 + Retry-After, not
    400; the thin client maps it to RuntimeError (retryable), not
    ValueError (caller error)."""
    import threading
    import urllib.request

    from tpuao import serving as S
    from tpuao.client import AOClient
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm

    srv = S.make_server(0)
    srv.max_sessions = 1
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z = F.spheres_on_plane(48, 64, n_spheres=2, seed=4
                               ).astype(np.float32)

        def post(qs):
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/ao?{qs}", data=dumps_pfm(z))).read()

        post("session=a")
        try:
            post("session=b")
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers["Retry-After"]
            assert b"session table full" in e.read()
        # the client splits retryable (5xx -> RuntimeError) from caller
        # error (400 -> ValueError)
        ses = AOClient(base).session("c")
        with pytest.raises(RuntimeError, match="HTTP 503"):
            ses.render(z)
        # an EXISTING session still renders while the table is full
        post("session=a")
        # DELETE frees the slot
        urllib.request.urlopen(urllib.request.Request(
            f"{base}/session/a", method="DELETE"))
        post("session=b")
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_session_ttl_refreshed_after_render(monkeypatch):
    """Advisor r4: ses['last'] must be stamped AFTER the render -- a
    frame that spends longer than the TTL inside the render (queued
    behind srv.lock or a slow remote compile) must not leave the
    session backdated and evicted by the very next sweep."""
    import threading
    import time as _time
    import urllib.request

    from tpuao import serving as S
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm

    srv = S.make_server(0)
    srv.session_ttl = 0.25
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        z = F.spheres_on_plane(48, 64, n_spheres=2, seed=4
                               ).astype(np.float32)

        def post(qs):
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/ao?{qs}", data=dumps_pfm(z))).read()

        post("session=x")
        eng = srv.sessions["x"]["engine"]
        real = eng.render

        def slow_render(*a, **kw):
            _time.sleep(0.4)  # longer than the TTL, like a slow compile
            return real(*a, **kw)

        monkeypatch.setattr(eng, "render", slow_render)
        post("session=x")  # renders for 0.4 s > ttl 0.25 s
        # a sweep right after must NOT evict the just-rendered session
        with srv.sessions_lock:
            S._sweep_sessions(srv)
        assert "x" in srv.sessions
    finally:
        srv.shutdown()
        srv.server_close()


def test_client_session_close_swallows_http_errors():
    """Advisor r4: TemporalSession.close() runs from __exit__ during
    error unwinding -- a 5xx on the DELETE must not replace the
    exception that actually broke the stream."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from tpuao.client import AOClient

    class Fail(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_DELETE(self):
            body = b"injected backend fault"
            self.send_response(500)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = HTTPServer(("127.0.0.1", 0), Fail)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = AOClient(f"http://127.0.0.1:{srv.server_address[1]}")
        with pytest.raises(RuntimeError, match="original"):
            with c.session("s"):
                raise RuntimeError("original failure")  # close() must
                # not mask this with its own HTTP-500 RuntimeError
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_temporal_session_mv():
    """Object-motion sessions: a trailing 'mv' body buffer (per-pixel
    current->previous pixel offsets as 'PF' with a zero third channel)
    resolves like a local engine fed motion=mv; guard rails 400."""
    import sys
    import threading
    import urllib.error
    import urllib.request

    sys.path.insert(0, "/root/repo/examples")
    import serve as S

    from tpuao.client import AOClient
    from tpuao.models.pipeline import TemporalAOEngine
    from tpuao.params import CameraParams
    from tpuao.utils import fixtures as F
    from tpuao.utils.frameio import dumps_pfm

    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        h, w = 80, 96
        z0 = F.spheres_on_plane(h, w, n_spheres=2, seed=5).astype(np.float32)
        z1 = np.roll(z0, 2, axis=1)  # content slides +2 px in x
        mv = np.zeros((h, w, 2), np.float32)
        mv[..., 1] = -2.0  # current pixel was previously 2 px left

        eng = TemporalAOEngine(CameraParams(depth_mode="linear"))
        client = AOClient(base)
        with client.session("mvstream") as ses:
            got0 = ses.render(z0)
            np.testing.assert_allclose(got0, np.asarray(eng.render(z0)),
                                       atol=1e-6)
            got1 = ses.render(z1, mv=mv)
            want1 = np.asarray(eng.render(z1, motion=mv))
            np.testing.assert_allclose(got1, want1, atol=1e-6)
            assert ses.last_frame_index == 1

        # client-side validation: wrong mv shape, mv+view conflict
        with client.session("mvstream2") as ses2:
            with pytest.raises(ValueError, match="mv must be"):
                ses2.render(z0, mv=np.zeros((h, w, 3), np.float32))
            with pytest.raises(ValueError, match="not several"):
                ses2.render(z0, mv=mv, view=np.eye(4))

        # server guard rails: all 400s
        body_mv = dumps_pfm(z1) + dumps_pfm(
            np.concatenate([mv, np.zeros((h, w, 1), np.float32)], axis=-1))
        for qs, body in (
                # mv buffer without session=
                ("buffers=depth,mv", body_mv),
                # mv buffer + motion= matrix conflict
                ("session=s9&buffers=depth,mv&motion="
                 + ",".join(["0"] * 16), body_mv),
                # mv must be trailing / known combination
                ("session=s9&buffers=mv,depth", body_mv),
                # shape mismatch: 'Pf' single-channel mv frame
                ("session=s9&buffers=depth,mv",
                 dumps_pfm(z1) + dumps_pfm(z0)),
        ):
            req = urllib.request.Request(f"{base}/ao?{qs}", data=body)
            try:
                urllib.request.urlopen(req)
                assert False, f"expected 400 for {qs}"
            except urllib.error.HTTPError as e:
                assert e.code == 400, qs
    finally:
        srv.shutdown()
        srv.server_close()
