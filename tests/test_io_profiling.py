"""IO helpers + timing-utility smoke tests."""

import numpy as np
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


def test_calibrate_script():
    import subprocess
    import sys
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "examples/calibrate.py", "96x128"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "strength" in r.stdout
