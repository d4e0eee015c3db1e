"""2-D mesh (views x row-bands) tests on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuao.models.pipeline import render_frame
from tpuao.parallel.grid import make_grid_mesh, render_views_spatial
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F

CAM = CameraParams(depth_mode="linear")
PAR = AOParams()
HALO = 320  # the default HALO_ROWS: full stencil reach, exact band joins


def _views(v, h, w):
    return np.stack([F.spheres_on_plane(h, w, n_spheres=4, seed=i)
                     for i in range(v)]).astype(np.float32)


def _padded_single(z):
    padded = np.concatenate(
        [np.tile(z[:1], (HALO, 1)), z, np.tile(z[-1:], (HALO, 1))], axis=0)
    return np.asarray(render_frame(padded, CAM, PAR, impl="jnp"))[
        HALO: HALO + z.shape[0]]


@pytest.mark.slow
def test_grid_2x4_matches_padded_single_device():
    v, h, w = 2, 1280, 128  # 2 views x 4 bands of 320 rows
    zs = _views(v, h, w)
    mesh = make_grid_mesh(2, 4)
    out = np.asarray(render_views_spatial(zs, CAM, PAR, mesh=mesh,
                                          halo_rows=HALO))
    assert out.shape == (v, h, w)
    for i in range(v):
        np.testing.assert_allclose(out[i], _padded_single(zs[i]), atol=1e-6)


@pytest.mark.slow
def test_grid_multiple_views_per_chip():
    v, h, w = 4, 640, 128  # 4 views on a 2-view mesh -> lax.map of 2 each
    zs = _views(v, h, w)
    mesh = make_grid_mesh(2, 2)
    out = np.asarray(render_views_spatial(zs, CAM, PAR, mesh=mesh,
                                          halo_rows=HALO))
    assert out.shape == (v, h, w)
    for i in range(v):
        np.testing.assert_allclose(out[i], _padded_single(zs[i]), atol=1e-6)


def test_grid_collectives_neighbor_only_and_view_independent():
    zs = _views(2, 1280, 128)
    mesh = make_grid_mesh(2, 4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpuao.parallel.grid import VIEW_AXIS, ROW_AXIS

    spec = NamedSharding(mesh, P(VIEW_AXIS, ROW_AXIS, None))
    d = jax.device_put(jnp.asarray(zs), spec)
    hlo = jax.jit(
        lambda x: render_views_spatial(x, CAM, PAR, mesh=mesh,
                                       halo_rows=HALO)
    ).lower(d).compile().as_text()
    assert "collective-permute" in hlo  # row halo exchange
    for coll in ("all-reduce", "all-gather", "all-to-all", "reduce-scatter"):
        assert coll not in hlo, coll


@pytest.mark.slow
def test_grid_auto_pad_height():
    """Misaligned H on the 2-D mesh: auto_pad pads rows and crops back."""
    from tpuao.parallel.grid import make_grid_mesh, render_views_spatial

    h, w = 1000, 128  # 1000 % (64*2) != 0 -> padded to 1024
    z = np.stack([
        F.spheres_on_plane(h, w, n_spheres=4, seed=s).astype(np.float32)
        for s in (3, 4)])
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    mesh = make_grid_mesh(2, 2)
    out = np.asarray(render_views_spatial(z, cam, par, mesh=mesh,
                                          impl="jnp", halo_rows=320))
    assert out.shape == (2, h, w)
    for i in range(2):
        plain = np.asarray(render_frame(z[i], cam, par, impl="jnp"))
        np.testing.assert_allclose(out[i, 400:-400], plain[400:-400],
                                   atol=1e-5)


@pytest.mark.slow
def test_grid_per_view_rig():
    """per_view camera/tunable rigs on the 2-D mesh: view-axis-sharded
    leaves, row-axis replicated."""
    import math

    from tpuao.params import AOParams as AOP

    v, h, w = 2, 1280, 128
    zs = _views(v, h, w)
    fovs = [50.0, 75.0]
    cam = CameraParams(
        depth_mode="linear",
        near=np.full(v, 0.1, np.float32), far=np.full(v, 100.0, np.float32),
        tan_half_fov_h=np.asarray(
            [math.tan(math.radians(f) / 2) for f in fovs], np.float32))
    par = AOP(strength=np.asarray([1.0, 3.0], np.float32),
              noise_filter_tolerance=np.full(v, -3.0, np.float32),
              blur_tolerance=np.full(v, -5.0, np.float32),
              upsample_tolerance=np.full(v, -7.0, np.float32),
              rejection_falloff=np.full(v, 2.5, np.float32))
    out = np.asarray(render_views_spatial(zs, cam, par,
                                          mesh=make_grid_mesh(2, 4),
                                          halo_rows=HALO, per_view=True))
    for i in range(v):
        cam_i = CameraParams(depth_mode="linear",
                             tan_half_fov_h=float(cam.tan_half_fov_h[i]))
        par_i = AOP(strength=float(par.strength[i]))
        padded = np.concatenate(
            [np.tile(zs[i][:1], (HALO, 1)), zs[i],
             np.tile(zs[i][-1:], (HALO, 1))], axis=0)
        want = np.asarray(render_frame(padded, cam_i, par_i,
                                       impl="jnp"))[HALO: HALO + h]
        np.testing.assert_allclose(out[i], want, atol=1e-6,
                                   err_msg=f"view {i}")


def test_grid_constraints():
    with pytest.raises(ValueError, match="needs"):
        make_grid_mesh(4, 4)  # 16 > 8 CPU devices
    with pytest.raises(AssertionError, match="divisible"):
        render_views_spatial(np.ones((3, 1280, 128), np.float32),
                             CAM, PAR, mesh=make_grid_mesh(2, 4),
                             halo_rows=HALO)
    with pytest.raises(AssertionError, match="multiple"):
        render_views_spatial(np.ones((2, 100, 128), np.float32),
                             CAM, PAR, mesh=make_grid_mesh(2, 4),
                             halo_rows=HALO, auto_pad=False)
    with pytest.raises(AssertionError, match="band height"):
        # auto_pad fixes alignment (100 -> 256) but bands stay too short
        render_views_spatial(np.ones((2, 100, 128), np.float32),
                             CAM, PAR, mesh=make_grid_mesh(2, 4),
                             halo_rows=HALO)
