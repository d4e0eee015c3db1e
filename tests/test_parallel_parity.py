"""Feature parity of the parallel modes with render_frame (VERDICT r2
item 3): normals, color composite, out_dtype, and the debug dict must work
-- and match the single-device program -- in all three sharded modes.

Spatial/grid references follow those modes' edge semantics: the
single-device pipeline on the halo-padded frame, cropped (see
parallel/spatial.py docstring); ``crop_debug_rows`` applied to the
monolithic padded run's debug dict is by construction the per-leaf
reference for the sharded debug output.
"""

import numpy as np
import pytest

from tpuao.models.pipeline import render_frame
from tpuao.parallel.grid import make_grid_mesh, render_views_spatial
from tpuao.parallel.sharding import make_mesh, render_views_sharded
from tpuao.parallel.spatial import (
    crop_debug_rows,
    make_row_mesh,
    render_frame_spatial,
    stencil_halo_rows,
)
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F

# cross-mode parity sweeps: every test compiles multiple sharded programs (slow tier; the per-mode basics stay in smoke via their own files)
pytestmark = pytest.mark.slow

CAM = CameraParams(depth_mode="linear")
PAR2 = AOParams(hierarchy_depth=2, use_normals=True)  # halo 128: small tests
HALO2 = stencil_halo_rows(PAR2)


def _scene(h, w, seed):
    z, n = F.spheres_on_plane(h, w, n_spheres=4, seed=seed,
                              with_normals=True)
    return z.astype(np.float32), n.astype(np.float32)


def _pad_rows(x, halo):
    reps = (halo,) + (1,) * (x.ndim - 1)
    return np.concatenate([np.tile(x[:1], reps), x,
                           np.tile(x[-1:], reps)], axis=0)


def test_spatial_full_parity():
    h, w = 256, 128
    z, n = _scene(h, w, 21)
    rng = np.random.default_rng(4)
    color = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    mesh = make_row_mesh(2)

    out, dbg = render_frame_spatial(z, CAM, PAR2, mesh=mesh, normals=n,
                                    color=color, out_dtype="uint8",
                                    debug_outputs=True)
    assert out.dtype == np.uint8 and out.shape == (h, w, 3)

    # reference: monolithic program on the halo-padded inputs, cropped
    zp, np_ = _pad_rows(z, HALO2), _pad_rows(n, HALO2)
    ref_ao, ref_dbg = render_frame(zp, CAM, PAR2, normals=np_, impl="jnp",
                                   debug_outputs=True)
    ref_ao = np.asarray(ref_ao)[HALO2: HALO2 + h]
    ref = np.round(color.astype(np.float32)
                   * ref_ao[..., None]).astype(np.int32)
    got = np.asarray(out).astype(np.int32)
    assert np.abs(got - ref).max() <= 1  # uint8 rounding on ULP diffs

    # debug dict: every leaf equals the halo-crop of the monolithic debug
    ref_dbg = crop_debug_rows(ref_dbg, HALO2, h)
    flat_got, tree_got = __import__("jax").tree_util.tree_flatten_with_path(
        dbg)
    flat_ref = dict(__import__("jax").tree_util.tree_flatten_with_path(
        ref_dbg)[0])
    assert len(flat_got) >= 5
    for path, leaf in flat_got:
        want = np.asarray(flat_ref[path])
        np.testing.assert_allclose(np.asarray(leaf), want, atol=1e-6,
                                   err_msg=str(path))


def test_grid_full_parity():
    v, h, w = 2, 256, 128
    zs, ns = zip(*[_scene(h, w, 30 + i) for i in range(v)])
    zs, ns = np.stack(zs), np.stack(ns)
    rng = np.random.default_rng(5)
    color = rng.uniform(0.0, 1.0, size=(v, h, w, 3)).astype(np.float32)
    mesh = make_grid_mesh(2, 2)

    out = render_views_spatial(zs, CAM, PAR2, mesh=mesh, normals=ns,
                               color=color, out_dtype="bfloat16")
    assert out.shape == (v, h, w, 3)
    assert str(out.dtype) == "bfloat16"
    for i in range(v):
        ref_ao = np.asarray(render_frame(
            _pad_rows(zs[i], HALO2), CAM, PAR2,
            normals=_pad_rows(ns[i], HALO2),
            impl="jnp"))[HALO2: HALO2 + h]
        ref = color[i] * ref_ao[..., None]
        got = np.asarray(out[i]).astype(np.float32)
        # bf16 has ~3 decimal digits
        np.testing.assert_allclose(got, ref, atol=8e-3)


def test_grid_debug_outputs():
    v, h, w = 2, 256, 128
    zs = np.stack([_scene(h, w, 40 + i)[0] for i in range(v)])
    par = AOParams(hierarchy_depth=2)
    halo = stencil_halo_rows(par)
    out, dbg = render_views_spatial(zs, CAM, par, mesh=make_grid_mesh(2, 2),
                                    debug_outputs=True)
    assert out.shape == (v, h, w)
    ref0 = render_frame(_pad_rows(zs[0], halo), CAM, par, impl="jnp",
                        debug_outputs=True)[1]
    ref0 = crop_debug_rows(ref0, halo, h)
    import jax

    got0 = jax.tree_util.tree_map(lambda x: np.asarray(x)[0], dbg)
    flat_got = jax.tree_util.tree_flatten_with_path(got0)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref0)[0])
    for path, leaf in flat_got:
        np.testing.assert_allclose(leaf, np.asarray(flat_ref[path]),
                                   atol=1e-6, err_msg=str(path))


def test_views_sharded_color_dtype_debug():
    v, h, w = 8, 64, 128
    zs = np.stack([_scene(h, w, 50 + i)[0] for i in range(v)])
    rng = np.random.default_rng(6)
    color = rng.integers(0, 255, size=(v, h, w, 3), dtype=np.uint8)
    par = AOParams()
    out, dbg = render_views_sharded(zs, CAM, par, mesh=make_mesh(8),
                                    impl="jnp", color=color,
                                    out_dtype="uint8", debug_outputs=True)
    assert out.shape == (v, h, w, 3) and out.dtype == np.uint8
    import jax

    for i in range(v):
        ref_ao, ref_dbg = render_frame(zs[i], CAM, par, impl="jnp",
                                       debug_outputs=True)
        ref = np.round(color[i].astype(np.float32)
                       * np.asarray(ref_ao)[..., None]).astype(np.int32)
        assert np.abs(np.asarray(out[i]).astype(np.int32) - ref).max() <= 1
        flat_got = jax.tree_util.tree_flatten_with_path(
            jax.tree_util.tree_map(lambda x, i=i: np.asarray(x)[i], dbg))[0]
        flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_dbg)[0])
        for path, leaf in flat_got:
            np.testing.assert_allclose(leaf, np.asarray(flat_ref[path]),
                                       atol=1e-6, err_msg=str(path))


def test_views_sharded_scan_with_color():
    """>1 view per chip (the lax.scan path) with a color composite but no
    normals — exercises the scan body's positional arg threading."""
    v, h, w = 4, 64, 128
    zs = np.stack([_scene(h, w, 80 + i)[0] for i in range(v)])
    rng = np.random.default_rng(8)
    color = rng.uniform(0.0, 1.0, size=(v, h, w)).astype(np.float32)
    par = AOParams(hierarchy_depth=2)
    out = render_views_sharded(zs, CAM, par, mesh=make_mesh(2), impl="jnp",
                               color=color)
    assert out.shape == (v, h, w)
    for i in range(v):
        ref_ao = np.asarray(render_frame(zs[i], CAM, par, impl="jnp"))
        np.testing.assert_allclose(np.asarray(out[i]), color[i] * ref_ao,
                                   atol=1e-6)


def test_grid_scan_with_normals_and_color():
    """2 views on a 1-view x 2-band grid: local view block of 2 runs the
    scan with normals AND color present."""
    v, h, w = 2, 256, 128
    zs, ns = zip(*[_scene(h, w, 85 + i) for i in range(v)])
    zs, ns = np.stack(zs), np.stack(ns)
    rng = np.random.default_rng(9)
    color = rng.uniform(0.0, 1.0, size=(v, h, w)).astype(np.float32)
    out = render_views_spatial(zs, CAM, PAR2, mesh=make_grid_mesh(1, 2),
                               normals=ns, color=color)
    assert out.shape == (v, h, w)
    for i in range(v):
        ref_ao = np.asarray(render_frame(
            _pad_rows(zs[i], HALO2), CAM, PAR2,
            normals=_pad_rows(ns[i], HALO2), impl="jnp"))[HALO2: HALO2 + h]
        np.testing.assert_allclose(np.asarray(out[i]), color[i] * ref_ao,
                                   atol=1e-6)


def test_spatial_channel_first_normals_auto_pad():
    """Channel-first (3, H, W) normals through the auto_pad recursion:
    canonicalized to channel-last BEFORE row padding, so the pad never
    lands on the size-3 channel axis (review r3).  Must equal the
    channel-last call bit-for-bit."""
    h, w = 200, 128  # 200 % (64*2) != 0 -> auto_pad path on a 2-mesh
    z, n = _scene(h, w, 91)
    mesh = make_row_mesh(2)
    out_cf = np.asarray(render_frame_spatial(
        z, CAM, PAR2, mesh=mesh, normals=np.moveaxis(n, -1, 0)))
    out_cl = np.asarray(render_frame_spatial(z, CAM, PAR2, mesh=mesh,
                                             normals=n))
    assert out_cf.shape == (h, w)
    np.testing.assert_array_equal(out_cf, out_cl)


def test_grid_channel_first_normals_auto_pad():
    """Same defect class on the 2-D mesh: (V, 3, H, W) normals with a
    misaligned height (review r3)."""
    v, h, w = 2, 200, 128
    zs, ns = zip(*[_scene(h, w, 93 + i) for i in range(v)])
    zs, ns = np.stack(zs), np.stack(ns)
    mesh = make_grid_mesh(2, 2)
    out_cf = np.asarray(render_views_spatial(
        zs, CAM, PAR2, mesh=mesh, normals=np.moveaxis(ns, -1, 1)))
    out_cl = np.asarray(render_views_spatial(zs, CAM, PAR2, mesh=mesh,
                                             normals=ns))
    assert out_cf.shape == (v, h, w)
    np.testing.assert_array_equal(out_cf, out_cl)


def test_grid_default_mesh_prefers_view_parallelism():
    """mesh=None with an 8-view batch on 8 devices must pick the 8x1
    view-parallel grid, not 1x8 row bands (which would trip the
    band >= halo constraint for modest frame heights — review r3)."""
    v, h, w = 8, 384, 128
    zs = np.stack([_scene(h, w, 100 + i)[0] for i in range(v)])
    out = np.asarray(render_views_spatial(zs, CAM, PAR2))
    assert out.shape == (v, h, w)
    # nr=1: halo extension is pure edge replication -> padded-single ref
    for i in (0, v - 1):
        ref = np.asarray(render_frame(
            _pad_rows(zs[i], HALO2), CAM, PAR2,
            impl="jnp"))[HALO2: HALO2 + h]
        np.testing.assert_allclose(out[i], ref, atol=1e-6)


@pytest.mark.slow
def test_spatial_realistic_1080p_geometry():
    """Real 1080p geometry (1088x1920, auto-padded to 1280 on 4 bands):
    the lane dimension finally sees a full-width frame in a sharded mode
    (VERDICT r2 weak-item 3)."""
    h, w = 1088, 1920
    z = F.spheres_on_plane(h, w, n_spheres=6, seed=61).astype(np.float32)
    par = AOParams()
    halo = stencil_halo_rows(par)
    out = np.asarray(render_frame_spatial(z, CAM, par,
                                          mesh=make_row_mesh(4)))
    assert out.shape == (h, w)
    plain = np.asarray(render_frame(z, CAM, par, impl="jnp"))
    np.testing.assert_allclose(out[halo + 64: -(halo + 64)],
                               plain[halo + 64: -(halo + 64)], atol=1e-5)


@pytest.mark.slow
def test_grid_realistic_1080p_geometry():
    """2 views x 4 bands at 1088x1920 (bands 320 rows == halo)."""
    h, w = 1088, 1920
    zs = np.stack([
        F.spheres_on_plane(h, w, n_spheres=5, seed=70 + i).astype(np.float32)
        for i in range(2)])
    par = AOParams()
    halo = stencil_halo_rows(par)
    out = np.asarray(render_views_spatial(zs, CAM, par,
                                          mesh=make_grid_mesh(2, 4)))
    assert out.shape == zs.shape
    for i in range(2):
        plain = np.asarray(render_frame(zs[i], CAM, par, impl="jnp"))
        np.testing.assert_allclose(out[i, halo + 64: -(halo + 64)],
                                   plain[halo + 64: -(halo + 64)],
                                   atol=1e-5)
