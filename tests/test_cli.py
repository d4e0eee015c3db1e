"""CLI (`python -m tpuao`) tests: in-process main() on the CPU backend."""

import json

import numpy as np
import pytest

from tpuao.cli import main
from tpuao.models.pipeline import render_frame
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F
from tpuao.utils.frameio import load_pfm, save_pfm


def _depth(h=96, w=128):
    return F.spheres_on_plane(h, w, n_spheres=3, seed=7).astype(np.float32)


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["backend"] == "cpu" and "tpuao" in out


def test_cli_render_pfm_roundtrip(tmp_path, capsys):
    z = _depth()
    src = str(tmp_path / "depth.pfm")
    dst = str(tmp_path / "ao.pfm")
    save_pfm(src, z)
    assert main(["render", src, dst, "--depth-mode", "linear",
                 "--strength", "2.0"]) == 0
    ao = load_pfm(dst)
    ref = np.asarray(render_frame(
        z, CameraParams(depth_mode="linear"),
        AOParams(strength=2.0)))
    np.testing.assert_allclose(ao, ref, atol=1e-6)
    assert "ao mean" in capsys.readouterr().out


def test_cli_render_png_in_out(tmp_path):
    from PIL import Image

    z = (np.clip(_depth(), 0, 1) * 65535).astype(np.uint16)
    src = str(tmp_path / "depth.png")
    dst = str(tmp_path / "ao.png")
    Image.fromarray(z).save(src)
    # PNG input implies linear depth mode; PNG output is 8-bit grayscale
    assert main(["render", src, dst]) == 0
    ao = np.asarray(Image.open(dst))
    assert ao.dtype == np.uint8 and ao.shape == z.shape
    assert ao.min() < 250 and ao.max() > 200  # plane ~1, spheres darken


@pytest.mark.slow
def test_cli_render_preset_sections_debug(tmp_path):
    z = _depth(128, 128)
    src = str(tmp_path / "d.pfm")
    save_pfm(src, z)
    # preset + sections path
    dst = str(tmp_path / "a.pfm")
    assert main(["render", src, dst, "--depth-mode", "linear",
                 "--preset", "LOW", "--sections", "2"]) == 0
    ref = np.asarray(render_frame(
        z, CameraParams(depth_mode="linear"),
        AOParams(hierarchy_depth=2)))
    np.testing.assert_allclose(load_pfm(dst), ref, atol=1e-5)
    # debug dump path
    dmp = str(tmp_path / "dbg.npz")
    assert main(["render", src, dst, "--depth-mode", "linear",
                 "--debug-dump", dmp]) == 0
    with np.load(dmp) as f:
        assert len(f.files) > 0
    # --sections + --debug-dump is rejected
    assert main(["render", src, dst, "--sections", "2",
                 "--debug-dump", dmp]) == 2


def test_cli_render_rejects_bad_input(tmp_path):
    src = str(tmp_path / "c.pfm")
    save_pfm(src, np.zeros((8, 8, 3), np.float32))  # 3-channel: not depth
    assert main(["render", src, str(tmp_path / "o.pfm")]) == 2


def test_cli_tunable_flags_cover_param_ranges():
    # every tunable in PARAM_RANGES is exposed as a flag
    from tpuao.cli import _build_parser
    from tpuao.params import PARAM_RANGES

    sub = _build_parser()._subparsers._group_actions[0].choices
    render_help = sub["render"].format_help()
    for name in PARAM_RANGES:
        assert f"--{name.replace('_', '-')}" in render_help, name


@pytest.mark.slow
def test_cli_normals_png_remap(tmp_path):
    """PNG normal maps carry the standard (n+1)/2 encoding; the CLI
    remaps them to signed [-1, 1] so they match the raw 'PF' .pfm path
    (review r3: [0,1] pseudo-normals rendered wrong-but-plausible AO
    silently)."""
    from PIL import Image

    z, nrm = F.spheres_on_plane(96, 128, n_spheres=3, seed=7,
                                with_normals=True)
    z = z.astype(np.float32)
    src = str(tmp_path / "d.pfm")
    save_pfm(src, z)
    npfm = str(tmp_path / "n.pfm")
    save_pfm(npfm, np.asarray(nrm, np.float32))
    npng = str(tmp_path / "n.png")
    enc = np.clip((np.asarray(nrm) + 1.0) / 2.0, 0.0, 1.0)
    Image.fromarray((enc * 255).round().astype(np.uint8)).save(npng)

    out_a, out_b = str(tmp_path / "a.pfm"), str(tmp_path / "b.pfm")
    assert main(["render", src, out_a, "--depth-mode", "linear",
                 "--normals", npfm]) == 0
    assert main(["render", src, out_b, "--depth-mode", "linear",
                 "--normals", npng]) == 0
    # 8-bit quantization of the normal components, nothing more
    np.testing.assert_allclose(load_pfm(out_b), load_pfm(out_a), atol=0.02)


def test_cli_rejects_bad_buffers_and_camera(tmp_path, capsys):
    z = np.full((64, 64), 0.5, np.float32)
    src = str(tmp_path / "d.pfm")
    save_pfm(src, z)
    dst = str(tmp_path / "o.pfm")
    # single-channel normals buffer
    save_pfm(str(tmp_path / "n1.pfm"), z)
    assert main(["render", src, dst, "--depth-mode", "linear",
                 "--normals", str(tmp_path / "n1.pfm")]) == 2
    assert "3-channel" in capsys.readouterr().err
    # degenerate camera flags exit 2 with a message, not a traceback
    assert main(["render", src, dst, "--depth-mode", "linear",
                 "--far", "0.05"]) == 2
    assert "far" in capsys.readouterr().err
    assert main(["render", src, dst, "--depth-mode", "linear",
                 "--fov", "200"]) == 2
    assert "fov" in capsys.readouterr().err


@pytest.mark.slow
def test_cli_render_sequence(tmp_path):
    # 5 frames, batch 2: tests the padded tail batch + one compiled shape
    outd = tmp_path / "out"
    refs = []
    for i in range(5):
        z = F.spheres_on_plane(64, 96, n_spheres=2, seed=i).astype(
            np.float32)
        save_pfm(str(tmp_path / f"f_{i:03d}.pfm"), z)
        refs.append(np.asarray(render_frame(
            z, CameraParams(depth_mode="linear"), AOParams())))
    assert main(["render", str(tmp_path / "f_*.pfm"), str(outd),
                 "--depth-mode", "linear", "--batch", "2"]) == 0
    for i in range(5):
        got = load_pfm(str(outd / f"f_{i:03d}_ao.pfm"))
        np.testing.assert_allclose(got, refs[i], atol=2e-6, err_msg=str(i))


def test_cli_render_sequence_errors(tmp_path):
    assert main(["render", str(tmp_path / "none_*.pfm"),
                 str(tmp_path / "o")]) == 2
    save_pfm(str(tmp_path / "a.pfm"), np.full((32, 64), 0.5, np.float32))
    save_pfm(str(tmp_path / "b.pfm"), np.full((32, 64), 0.5, np.float32))
    # normals glob count mismatch
    assert main(["render", str(tmp_path / "?.pfm"), str(tmp_path / "o"),
                 "--normals", str(tmp_path / "a.pfm")]) == 2
    # sections is single-frame only
    assert main(["render", str(tmp_path / "?.pfm"), str(tmp_path / "o"),
                 "--sections", "2"]) == 2


@pytest.mark.slow
def test_cli_normals_color(tmp_path):
    z, nrm = F.spheres_on_plane(96, 128, n_spheres=3, seed=7,
                                with_normals=True)
    z = z.astype(np.float32)
    src = str(tmp_path / "d.pfm")
    npath = str(tmp_path / "n.pfm")
    cpath = str(tmp_path / "c.pfm")
    dst = str(tmp_path / "o.pfm")
    save_pfm(src, z)
    save_pfm(npath, np.asarray(nrm, np.float32))
    color = np.random.default_rng(0).uniform(
        0, 1, z.shape + (3,)).astype(np.float32)
    save_pfm(cpath, color)
    assert main(["render", src, dst, "--depth-mode", "linear",
                 "--normals", npath, "--color", cpath]) == 0
    out = load_pfm(dst)
    assert out.shape == color.shape


def test_cli_render_projection_matrix(tmp_path):
    """--projection: camera built from a 16-float matrix file; rendering
    hardware depth through it matches render_frame with the analytically
    extracted camera (VERDICT r3 item 6)."""
    import math

    n, f = 0.3, 100.0
    x = 1.0 / math.tan(math.radians(70.0) / 2)
    P = np.zeros((4, 4))
    P[0, 0] = x
    P[1, 1] = x * 16 / 9
    P[2, 2] = n / (f - n)
    P[2, 3] = n * f / (f - n)
    P[3, 2] = -1.0  # Unity reversed-Z
    mtx = str(tmp_path / "proj.txt")
    with open(mtx, "w") as fh:
        fh.write("# unity reversed-Z\n")
        fh.write("\n".join(" ".join(str(v) for v in row) for row in P))

    z_lin = np.clip(_depth(), 1e-3, 1.0)
    z_eye = z_lin * f
    d_hw = (P[2, 2] * (-z_eye) + P[2, 3]) / (P[3, 2] * (-z_eye))
    src = str(tmp_path / "depth.pfm")
    dst = str(tmp_path / "ao.pfm")
    save_pfm(src, d_hw.astype(np.float32))
    assert main(["render", src, dst, "--projection", mtx]) == 0
    ao = load_pfm(dst)

    cam = CameraParams.from_projection(P)
    assert cam.depth_mode == "hardware" and cam.reversed_z
    ref = np.asarray(render_frame(d_hw.astype(np.float32), cam, AOParams()))
    np.testing.assert_allclose(ao, ref, atol=1e-6)


def test_cli_render_projection_inline_and_errors(tmp_path, capsys):
    z = _depth()
    src = str(tmp_path / "d.pfm")
    dst = str(tmp_path / "a.pfm")
    save_pfm(src, z)
    # ValueErrors exit 2 with the message on stderr (CLI usage contract)
    assert main(["render", src, dst, "--projection", "1,2,3"]) == 2
    assert "16 floats" in capsys.readouterr().err
    # inline 16 floats, orthographic -> clear rejection
    assert main(["render", src, dst, "--projection",
                 ",".join(str(v) for v in np.eye(4).ravel())]) == 2
    assert "perspective" in capsys.readouterr().err


def test_cli_render_sequence_temporal(tmp_path):
    """--temporal sequence: frame 0 equals the single-frame render, later
    identical frames stay at the steady state; --camera-path with identity
    views matches the static-camera run."""
    from tpuao.models.pipeline import render_frame_temporal

    z = _depth(64, 96)
    seq = tmp_path / "seq"
    seq.mkdir()
    for t in range(3):
        save_pfm(str(seq / f"f{t:03d}.pfm"), z)
    out = tmp_path / "out"
    assert main(["render", str(seq / "f*.pfm"), str(out),
                 "--depth-mode", "linear", "--temporal",
                 "--history-weight", "0.8", "--batch", "2"]) == 0
    ref, st = render_frame_temporal(
        z, None, CameraParams(depth_mode="linear"), AOParams())
    np.testing.assert_allclose(load_pfm(str(out / "f000_ao.pfm")),
                               np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(load_pfm(str(out / "f002_ao.pfm")),
                               np.asarray(ref), atol=1e-6)

    views = [np.eye(4).ravel().tolist() for _ in range(3)]
    vp = tmp_path / "views.json"
    vp.write_text(json.dumps(views))
    out2 = tmp_path / "out2"
    assert main(["render", str(seq / "f*.pfm"), str(out2),
                 "--depth-mode", "linear", "--temporal",
                 "--camera-path", str(vp)]) == 0
    np.testing.assert_allclose(load_pfm(str(out2 / "f002_ao.pfm")),
                               load_pfm(str(out / "f002_ao.pfm")),
                               atol=1e-5)


def test_cli_temporal_usage_errors(tmp_path, capsys):
    z = _depth(32, 32)
    src = str(tmp_path / "d.pfm")
    save_pfm(src, z)
    # single frame: temporal needs a sequence
    assert main(["render", src, str(tmp_path / "o.pfm"),
                 "--temporal"]) == 2
    assert "sequence" in capsys.readouterr().err
    # camera path length mismatch
    seq = tmp_path / "seq"
    seq.mkdir()
    for t in range(2):
        save_pfm(str(seq / f"f{t}.pfm"), z)
    vp = tmp_path / "v.json"
    vp.write_text(json.dumps([np.eye(4).ravel().tolist()]))
    assert main(["render", str(seq / "f*.pfm"), str(tmp_path / "out"),
                 "--temporal", "--camera-path", str(vp),
                 "--depth-mode", "linear"]) == 2
    assert "views for" in capsys.readouterr().err
    # out-of-range tunable -> ValueError contract (exit 2)
    assert main(["render", str(seq / "f*.pfm"), str(tmp_path / "out"),
                 "--temporal", "--history-weight", "1.5",
                 "--depth-mode", "linear"]) == 2
