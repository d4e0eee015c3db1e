"""Pallas kernel tests (SURVEY.md SS5.2 per-kernel + SS6 'race detection':
interpret=True runs the kernels under CPU semantics, the Pallas analog of a
sanitizer pass).  On the CPU test backend the kernels run in interpreter
mode; compiled-TPU agreement is additionally enforced by bench.py's
max-abs-err column."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuao.golden import reference as G
from tpuao.ops import pallas_kernels as PK
from tpuao.ops import render as R
from tpuao.ops import upsample as U
from tpuao.params import (
    AOParams,
    CameraParams,
    GoldenAOParams,
    GoldenCameraParams,
)
from tpuao.utils import fixtures as F

TOL = 1e-5  # interpreter mode == jax semantics; vs golden f64


@pytest.fixture(scope="module")
def ds():
    z = F.spheres_on_plane(128, 192, n_spheres=4, seed=3)
    return G.downsample2x(z)


def test_pallas_render_matches_golden(ds):
    for exhaustive in (True, False):
        got = np.asarray(PK.render_ao_level(
            jnp.asarray(ds, jnp.float32), 1, 192, CameraParams(),
            AOParams(exhaustive=exhaustive)))
        want = G.render_ao_level(ds, 1, 192, GoldenCameraParams(),
                                 GoldenAOParams(exhaustive=exhaustive))
        np.testing.assert_allclose(got, want, atol=TOL)


def test_pallas_render_row_tiling(ds):
    # tiled grid (R=16 -> 4 grid steps at 64 rows) == single block
    one = np.asarray(PK.render_ao_level(
        jnp.asarray(ds, jnp.float32), 1, 192, CameraParams(), AOParams(),
        row_tile=64))
    tiled = np.asarray(PK.render_ao_level(
        jnp.asarray(ds, jnp.float32), 1, 192, CameraParams(), AOParams(),
        row_tile=16))
    np.testing.assert_allclose(one, tiled, atol=1e-6)


def test_pallas_render_uneven_rows(ds):
    # row count not divisible by tile: 64 rows, tile 24 -> pad + crop path
    got = np.asarray(PK.render_ao_level(
        jnp.asarray(ds, jnp.float32), 1, 192, CameraParams(), AOParams(),
        row_tile=24))
    want = G.render_ao_level(ds, 1, 192, GoldenCameraParams(),
                             GoldenAOParams())
    np.testing.assert_allclose(got, want, atol=TOL)


def test_pallas_render_normals(ds):
    z, n = F.spheres_on_plane(128, 192, n_spheres=4, seed=9,
                              with_normals=True)
    dsn = G.downsample2x(z)
    nds = n[0::2, 0::2, :]
    got = np.asarray(PK.render_ao_level(
        jnp.asarray(dsn, jnp.float32), 1, 192, CameraParams(),
        AOParams(use_normals=True), jnp.asarray(nds, jnp.float32)))
    want = G.render_ao_level(dsn, 1, 192, GoldenCameraParams(),
                             GoldenAOParams(use_normals=True), nds)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_pallas_render_dma_matches_golden(ds):
    # double-buffered HBM-tile variant ([BJ] config 4); depth-only path
    got = np.asarray(PK.render_ao_level_dma(
        jnp.asarray(ds, jnp.float32), 1, 192, CameraParams(), AOParams(),
        row_tile=24))
    want = G.render_ao_level(ds, 1, 192, GoldenCameraParams(),
                             GoldenAOParams())
    np.testing.assert_allclose(got, want, atol=TOL)


def test_pallas_upsample_matches_golden(rng):
    lh, lw = 32, 48
    lo_d = rng.uniform(0.2, 0.8, (lh, lw))
    hi_d = np.repeat(np.repeat(lo_d, 2, 0), 2, 1)
    hi_d = hi_d + rng.uniform(-0.01, 0.01, hi_d.shape)
    lo1 = rng.uniform(size=(lh, lw))
    lo2 = rng.uniform(size=(lh, lw))
    for use2 in (False, True):
        got = np.asarray(PK.blur_upsample_step(
            jnp.asarray(lo1, jnp.float32), jnp.asarray(lo_d, jnp.float32),
            jnp.asarray(hi_d, jnp.float32), AOParams(), 192,
            lo_ao2=jnp.asarray(lo2, jnp.float32) if use2 else None,
            row_tile=16))
        want = G.blur_upsample_step(
            lo1, lo_d, hi_d, GoldenAOParams(), 192,
            lo_ao2=lo2 if use2 else None)
        np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


def test_pallas_upsample_blendout(rng):
    lh, lw = 16, 32
    lo_d = rng.uniform(0.2, 0.8, (lh, lw))
    hi_d = np.repeat(np.repeat(lo_d, 2, 0), 2, 1)
    lo1 = rng.uniform(size=(lh, lw))
    hi_ao = rng.uniform(size=(2 * lh, 2 * lw)).astype(np.float32)
    got = np.asarray(PK.blur_upsample_step(
        jnp.asarray(lo1, jnp.float32), jnp.asarray(lo_d, jnp.float32),
        jnp.asarray(hi_d, jnp.float32), AOParams(), 192,
        hi_ao_blend=jnp.asarray(hi_ao)))
    want = G.blur_upsample_step(lo1, lo_d, hi_d, GoldenAOParams(), 192,
                                hi_ao_blend=hi_ao)
    np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


@pytest.mark.slow
def test_full_pipeline_impl_pallas():
    z = F.spheres_on_plane(128, 192, n_spheres=4, seed=3)
    from tpuao.models.pipeline import render_frame

    a = np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                AOParams(), impl="jnp"))
    b = np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                AOParams(), impl="pallas"))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_full_pipeline_impl_fused():
    # fused render+premin+filter+upsample chain kernel
    z = F.spheres_on_plane(128, 192, n_spheres=4, seed=3)
    from tpuao.models.pipeline import render_frame

    a = np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                AOParams(), impl="jnp"))
    b = np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                AOParams(), impl="fused"))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_fused_step_zero_copy_variant(rng):
    from tpuao.ops import pallas_kernels as PK
    from tpuao.ops import render as R
    from tpuao.ops import upsample as U

    lh, lw = 96, 64
    ds = jnp.asarray(rng.uniform(0.2, 0.8, (lh, lw)), jnp.float32)
    hi = jnp.asarray(rng.uniform(0.2, 0.8, (2 * lh, 2 * lw)), jnp.float32)
    c1 = jnp.asarray(rng.uniform(0.3, 1.0, (lh, lw)), jnp.float32)
    cam, par = CameraParams(), AOParams()
    aos1 = R.render_ao_level(ds, 1, 2 * lw, cam, par)
    want = np.asarray(U.blur_upsample_step(c1, ds, hi, par, 2 * lw,
                                           lo_ao2=aos1))
    got = np.asarray(PK.fused_render_upsample_step_zc(
        ds, c1, hi, 1, 2 * lw, cam, par, row_tile=48))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_fused_step_uneven_tiles(rng):
    from tpuao.ops import pallas_kernels as PK
    from tpuao.ops import render as R
    from tpuao.ops import upsample as U

    lh, lw = 44, 64  # not divisible by row_tile
    ds = jnp.asarray(rng.uniform(0.2, 0.8, (lh, lw)), jnp.float32)
    hi = jnp.asarray(rng.uniform(0.2, 0.8, (2 * lh, 2 * lw)), jnp.float32)
    c1 = jnp.asarray(rng.uniform(0.3, 1.0, (lh, lw)), jnp.float32)
    cam, par = CameraParams(), AOParams()
    aos1 = R.render_ao_level(ds, 1, 2 * lw, cam, par)
    want = np.asarray(U.blur_upsample_step(c1, ds, hi, par, 2 * lw,
                                           lo_ao2=aos1))
    got = np.asarray(PK.fused_render_upsample_step(ds, c1, hi, 1, 2 * lw,
                                                   cam, par, row_tile=16))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_batched_frames_all_impls():
    # ADVICE r1: leading-batch input must work (or vmap-fallback) for every
    # impl, not just "auto"/"jnp".
    zs = np.stack([F.spheres_on_plane(64, 128, n_spheres=2, seed=s)
                   for s in (0, 1)])
    from tpuao.models.pipeline import render_frame

    cam = CameraParams(depth_mode="linear")
    want = np.asarray(render_frame(zs, cam, AOParams(), impl="jnp"))
    for impl in ("pallas", "fused"):
        got = np.asarray(render_frame(zs, cam, AOParams(), impl=impl))
        assert got.shape == (2, 64, 128)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_fully_occluded_pixel_small_strength():
    """A vis==0 pixel with strength=0.1 must return exactly 0 from the
    Pallas kernels, matching jnp.power (regression: the 1e-30 log floor
    alone returned 1e-30**0.1 ~= 1.0000002e-3, over the [BJ] budget)."""
    h, w = 32, 64
    z = np.full((h, w), 0.2, np.float32)
    z[h // 2, w // 2] = 0.95  # deep pixel in a shallow field: all taps in
    # front by a huge margin -> every pair test clamps to 0 -> vis == 0
    cam = CameraParams(depth_mode="linear")
    par = AOParams(strength=0.1)
    want = np.asarray(R.render_ao_level(jnp.asarray(z), 1, 2 * w, cam, par))
    got = np.asarray(PK.render_ao_level(jnp.asarray(z), 1, 2 * w, cam, par))
    assert want[h // 2, w // 2] == 0.0
    assert got[h // 2, w // 2] == 0.0
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_normals_layout_handling():
    """Channel-first and channel-last normals give identical results on
    every impl; ambiguous layouts raise instead of silently misreading."""
    from tpuao.models.pipeline import render_frame

    z, n = F.spheres_on_plane(64, 128, n_spheres=2, seed=4,
                              with_normals=True)
    cam = CameraParams(depth_mode="linear")
    par = AOParams(use_normals=True)
    n_cl = np.asarray(n, np.float32)           # (H, W, 3)
    n_cf = np.moveaxis(n_cl, -1, 0).copy()     # (3, H, W)
    for impl in ("jnp", "pallas"):
        a = np.asarray(render_frame(z, cam, par, normals=n_cl, impl=impl))
        b = np.asarray(render_frame(z, cam, par, normals=n_cf, impl=impl))
        np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="ambiguous"):
        R.normals_channel_last(np.zeros((3, 5, 3), np.float32))
    with pytest.raises(ValueError, match="channel"):
        R.normals_channel_last(np.zeros((4, 5, 2), np.float32))
