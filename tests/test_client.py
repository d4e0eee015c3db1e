"""tpuao.client -- the thin HTTP client for the serving endpoint.

End-to-end against a real in-process ``tpuao.serving`` server: rendered
results must match the local ``render_frame`` bit-for-bit (the client is
pure transport), validation must fail FAST client-side (no round trip),
and the server's 400/500 split must map onto ValueError/RuntimeError.
"""

from __future__ import annotations

import threading

import numpy as np
import pytest

from tpuao.client import AOClient, request_ao


@pytest.fixture(scope="module")
def server():
    from tpuao import serving as S

    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


@pytest.fixture(scope="module")
def base(server):
    return f"http://127.0.0.1:{server.server_address[1]}"


@pytest.fixture(scope="module")
def scene():
    from tpuao.utils import fixtures as F

    z, nrm = F.spheres_on_plane(96, 128, n_spheres=3, seed=11,
                                with_normals=True)
    rng = np.random.default_rng(3)
    color = rng.uniform(0.0, 1.0, (96, 128, 3)).astype(np.float32)
    return z.astype(np.float32), nrm.astype(np.float32), color


def test_render_matches_local(base, scene):
    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams

    z, _, _ = scene
    cam = CameraParams(depth_mode="linear")  # the stock server engine
    c = AOClient(base)
    ao = c.render(z)
    np.testing.assert_allclose(
        ao, np.asarray(render_frame(z, cam, AOParams())), atol=1e-6)

    # traced per-request knobs: tunable + camera fov
    ao2 = c.render(z, strength=2.0, fov=70.0)
    import math

    cam2 = cam.replace(tan_half_fov_h=math.tan(math.radians(70.0) / 2))
    np.testing.assert_allclose(
        ao2, np.asarray(render_frame(z, cam2, AOParams(strength=2.0))),
        atol=1e-6)
    assert np.abs(ao2 - ao).max() > 1e-4  # the knobs actually rode along

    # module-level convenience wrapper is the same call
    np.testing.assert_array_equal(request_ao(base, z), ao)


def test_render_multibuffer(base, scene):
    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams

    z, nrm, color = scene
    cam = CameraParams(depth_mode="linear")
    c = AOClient(base)

    ao = c.render(z, normals=nrm)
    want = np.asarray(render_frame(z, cam, AOParams(use_normals=True),
                                   normals=nrm))
    np.testing.assert_allclose(ao, want, atol=1e-6)

    # color WITHOUT normals: the client must send ?buffers=depth,color
    # (positionally frame 2 would be read as normals and 400)
    out = c.render(z, color=color)
    want = np.asarray(render_frame(z, cam, AOParams(), color=color))
    assert out.shape == (96, 128, 3)
    np.testing.assert_allclose(out, want, atol=1e-6)

    # png output returns encoded bytes as-is
    png = c.render(z, out="png")
    assert isinstance(png, bytes) and png[:8] == b"\x89PNG\r\n\x1a\n"


def test_client_side_validation_no_round_trip(base, server, scene):
    z, _, _ = scene
    c = AOClient(base)
    before = server.stats["requests"]
    with pytest.raises(ValueError, match="unknown override"):
        c.render(z, strengh=2.0)  # typo'd tunable
    with pytest.raises(ValueError, match="outside"):
        c.render(z, strength=1e9)
    with pytest.raises(ValueError, match="fov"):
        c.render(z, fov=270.0)
    with pytest.raises(ValueError, match="out must be"):
        c.render(z, out="jpeg")
    with pytest.raises(ValueError, match="depth must be"):
        c.render(np.zeros((4, 8, 3), np.float32))
    assert server.stats["requests"] == before  # all failed pre-flight


def test_server_error_mapping(base, scene, monkeypatch):
    z, nrm, _ = scene
    c = AOClient(base)
    # server-side 400 (normals H mismatch passes the client untouched)
    with pytest.raises(ValueError, match="normals frame"):
        c.render(z, normals=nrm[:48])
    # non-transient backend fault -> HTTP 500 -> RuntimeError
    from tpuao import serving as S

    def boom(*a, **kw):
        raise RuntimeError("lowering exploded (not transient)")

    monkeypatch.setattr(S, "render_frame", boom)
    with pytest.raises(RuntimeError, match="HTTP 500"):
        c.render(z)


def test_client_transport_retry(base, scene, monkeypatch):
    """Transport-level faults (reset/refused) are re-sent (renders are
    pure); HTTP-status errors are never retried client-side (the server
    already retried its own transient class before answering)."""
    import urllib.request as ur

    z, nrm, _ = scene
    real = ur.urlopen
    calls = {"n": 0}

    def flaky(req, timeout=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionResetError("peer reset mid-request")
        return real(req, timeout=timeout)

    monkeypatch.setattr(ur, "urlopen", flaky)
    c = AOClient(base, backoff_s=0.0)
    ao = c.render(z)
    assert calls["n"] == 2 and ao.shape == z.shape  # one re-send, served

    # a server 400 is a caller error: exactly ONE request, no retry
    before = calls["n"]
    with pytest.raises(ValueError, match="normals frame"):
        c.render(z, normals=nrm[:48])
    assert calls["n"] == before + 1

    # retries exhausted -> the transport error surfaces
    def dead(req, timeout=None):
        calls["n"] += 1
        raise ConnectionResetError("always")

    monkeypatch.setattr(ur, "urlopen", dead)
    before = calls["n"]
    with pytest.raises(ConnectionResetError):
        AOClient(base, retries=1, backoff_s=0.0).render(z)
    assert calls["n"] == before + 2  # initial + 1 retry


def test_wait_ready_and_stats(scene):
    """A fresh server is unhealthy until its first render; wait_ready
    returns promptly once a frame has gone through."""
    from tpuao import serving as S

    z, _, _ = scene
    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = AOClient(f"http://127.0.0.1:{srv.server_address[1]}")
        assert not c.healthy()
        with pytest.raises(TimeoutError):
            c.wait_ready(timeout=0.3, interval=0.1)
        c.render(z)
        assert c.wait_ready(timeout=5.0, interval=0.05) < 5.0
        s = c.stats()
        assert s["ok"] >= 1
        cfg = c.config()
        assert cfg["camera"]["depth_mode"] == "linear"
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_render_many_fills_batcher_flushes(scene):
    """Concurrent fan-out from ONE client actually shares the server's
    micro-batched flushes (a sequential loop would leave every flush at
    size 1); results come back in input order and match per-frame."""
    from tpuao import serving as S

    z, _, _ = scene
    depths = [z + 0.001 * k for k in range(8)]
    srv = S.make_server(0, batch_size=4)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = AOClient(f"http://127.0.0.1:{srv.server_address[1]}")
        c.render(z)  # warm the compiled batch program once
        got = c.render_many(depths, workers=8)
        singles = [c.render(d) for d in depths]
        for g, s in zip(got, singles):
            np.testing.assert_allclose(g, s, atol=1e-6)
        st = srv.batcher.stats()
        # 8 concurrent frames over batch_size=4: strictly fewer flushes
        # than frames proves real batching happened
        assert st["frames"] >= 8
        assert st["flushes"] < st["frames"]

        # one shared normals buffer broadcast to every frame, riding the
        # batcher too (homogeneous multi-buffer flushes)
        from tpuao.models.pipeline import render_frame
        from tpuao.params import AOParams, CameraParams
        from tpuao.utils import fixtures as F

        _, nrm = F.spheres_on_plane(96, 128, n_spheres=3, seed=11,
                                    with_normals=True)
        nrm = nrm.astype(np.float32)
        got_n = c.render_many(depths[:4], normals=nrm, workers=4)
        for d, g in zip(depths[:4], got_n):
            want = np.asarray(render_frame(
                d, CameraParams(depth_mode="linear"),
                AOParams(use_normals=True), normals=nrm))
            np.testing.assert_allclose(g, want, atol=1e-6)
        # per-frame sequence must match 1:1
        with pytest.raises(ValueError, match="2 buffers for 4"):
            c.render_many(depths[:4], normals=[nrm, nrm])
    finally:
        srv.shutdown()
        srv.server_close()


def test_cli_remote_render(base, scene, tmp_path, capsys):
    """`tpuao render --server URL` round-trips through the endpoint and
    rejects server-side state flags."""
    from tpuao.cli import main
    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams
    from tpuao.utils.frameio import load_pfm, save_pfm

    z, _, _ = scene
    src = tmp_path / "depth.pfm"
    dst = tmp_path / "ao.pfm"
    save_pfm(str(src), z)
    rc = main(["render", str(src), str(dst),
               "--server", base, "--strength", "1.5"])
    assert rc == 0
    want = render_frame(z, CameraParams(depth_mode="linear"),
                        AOParams(strength=1.5))
    np.testing.assert_allclose(load_pfm(str(dst)), np.asarray(want),
                               atol=1e-6)
    cap = capsys.readouterr()
    assert "rendered by" in cap.out
    # a .pfm defaults to hardware depth locally but the stock server is
    # linear-mode: the silent-divergence trap warns loudly
    assert "depth_mode" in cap.err

    # explicit --depth-mode matching the server renders silently
    rc = main(["render", str(src), str(dst), "--server", base,
               "--depth-mode", "linear"])
    assert rc == 0
    assert "depth_mode" not in capsys.readouterr().err
    # ... and a mismatching one is an error, not a wrong answer
    rc = main(["render", str(src), str(dst), "--server", base,
               "--depth-mode", "hardware"])
    assert rc == 2
    assert "depth_mode" in capsys.readouterr().err

    # engine-state flags are rejected, not silently ignored
    rc = main(["render", str(src), str(dst), "--server", base,
               "--preset", "HIGH"])
    assert rc == 2
    assert "--preset" in capsys.readouterr().err

    # transport faults exit 1 with a message, no traceback
    rc = main(["render", str(src), str(dst),
               "--server", "http://127.0.0.1:9"])  # discard port, refused
    assert rc == 1
    assert "error:" in capsys.readouterr().err


def test_cli_remote_sequence(base, scene, tmp_path, capsys):
    """Glob sequence mode works remotely: per-frame requests, outputs
    named like the local sequence path."""
    import os

    from tpuao.cli import main
    from tpuao.utils.frameio import load_pfm, save_pfm

    z, _, _ = scene
    seq = tmp_path / "seq"
    out = tmp_path / "out"
    os.makedirs(seq)
    for k in range(3):
        save_pfm(str(seq / f"f{k:03d}.pfm"), z + 0.001 * k)
    rc = main(["render", str(seq / "f*.pfm"), str(out), "--server", base])
    assert rc == 0
    assert "3 frames" in capsys.readouterr().out
    got = sorted(os.listdir(out))
    assert got == ["f000_ao.pfm", "f001_ao.pfm", "f002_ao.pfm"]
    aos = [load_pfm(str(out / p)) for p in got]
    for ao in aos:
        assert ao.shape == z.shape and 0.0 <= ao.min() <= ao.max() <= 1.0
    # frames differ, so outputs must differ (order preserved, no dup)
    assert np.abs(aos[0] - aos[2]).max() > 0


def test_temporal_session_roundtrip(base, scene):
    """Client session handle == a local TemporalAOEngine fed the same
    frames+views; context-manager exit DELETEs the server history."""
    from tpuao.models.pipeline import TemporalAOEngine
    from tpuao.params import CameraParams
    from tpuao.utils import fixtures as F

    c = AOClient(base)
    frames = [F.spheres_on_plane(64, 96, n_spheres=2, seed=s
                                 ).astype(np.float32) for s in (4, 5, 6)]
    eng = TemporalAOEngine(CameraParams(depth_mode="linear"))
    with c.session("cli-stream") as ses:
        for k, z in enumerate(frames):
            v = np.eye(4)
            v[0, 3] = 0.03 * k
            got = ses.render(z, view=v)
            want = np.asarray(eng.render(z, view=v))
            np.testing.assert_allclose(got, want, atol=1e-6)
        # reset() rides the next frame
        ses.reset()
        got = ses.render(frames[0])
        eng.reset()
        want = np.asarray(eng.render(frames[0]))
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert c.stats()["sessions"] >= 1
    # context exit closed it server-side: a DELETE now finds nothing
    import urllib.error
    import urllib.request

    try:
        urllib.request.urlopen(urllib.request.Request(
            f"{base}/session/cli-stream", method="DELETE"))
        assert False, "expected 404 after close()"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    with pytest.raises(ValueError):
        ses.render(frames[0])  # closed handle fails fast


def test_temporal_session_validation_no_round_trip(base, server, scene):
    """Session-side validation fails fast without touching the server."""
    c = AOClient(base)
    ses = c.session()
    before = server.stats["requests"]
    z = np.full((32, 32), 0.5, np.float32)
    with pytest.raises(ValueError):
        ses.render(z, view=np.eye(3))  # wrong matrix shape
    with pytest.raises(ValueError):
        ses.render(z, view=np.eye(4), motion=np.eye(4))  # both
    with pytest.raises(ValueError):
        ses.render(z, history_weight=2.0)  # outside range
    with pytest.raises(ValueError):
        ses.render(z, nonsense=1.0)
    assert server.stats["requests"] == before


def test_temporal_session_resolve_level(base, scene):
    """resolve_level=1 sessions ride the half-res level-1 resolve: parity
    with a local resolve_level=1 engine, fixed-per-session enforcement,
    and stateless rejection."""
    import urllib.error
    import urllib.request

    from tpuao.models.pipeline import TemporalAOEngine
    from tpuao.params import CameraParams
    from tpuao.utils import fixtures as F

    c = AOClient(base)
    frames = [F.spheres_on_plane(64, 96, n_spheres=2, seed=s
                                 ).astype(np.float32) for s in (7, 8)]
    eng = TemporalAOEngine(CameraParams(depth_mode="linear"),
                           resolve_level=1)
    with c.session("l1-stream", resolve_level=1) as ses:
        for k, z in enumerate(frames):
            v = np.eye(4)
            v[0, 3] = 0.03 * k
            got = ses.render(z, view=v)
            want = np.asarray(eng.render(z, view=v))
            np.testing.assert_allclose(got, want, atol=1e-6)
        # mid-stream level change -> 400 (fixed per session, like camera)
        from tpuao.utils.frameio import dumps_pfm

        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/ao?session=l1-stream&resolve_level=0",
                data=dumps_pfm(frames[0])))
            assert False, "expected 400 for mid-stream level change"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    # stateless resolve_level -> 400
    from tpuao.utils.frameio import dumps_pfm

    try:
        urllib.request.urlopen(urllib.request.Request(
            f"{base}/ao?resolve_level=1", data=dumps_pfm(frames[0])))
        assert False, "expected 400 for stateless resolve_level"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    with pytest.raises(ValueError):
        c.session(resolve_level=2)
