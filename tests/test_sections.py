"""Sequential section execution tests (single-device semantics).

The sections mode must equal the MONOLITHIC single-chip program (not the
padded-frame program the spatial mode matches): boundary sections include
the real frame edge and the halo covers the full stencil reach.
"""

import numpy as np
import pytest

from tpuao.models.pipeline import render_frame
from tpuao.parallel.sections import render_frame_sections, section_plan
from tpuao.parallel.spatial import stencil_halo_rows
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F


CAM = CameraParams(depth_mode="linear")


def test_stencil_halo_rows_values():
    assert stencil_halo_rows(AOParams()) == 320  # historical HALO_ROWS
    assert stencil_halo_rows(AOParams(hierarchy_depth=3)) == 192
    assert stencil_halo_rows(AOParams(hierarchy_depth=2)) == 128
    assert stencil_halo_rows(AOParams(hierarchy_depth=1)) == 64
    assert stencil_halo_rows(AOParams(enable_blur=False)) == 256


def test_section_plan_bounds():
    ha, band, plan = section_plan(2560, 4, 320)
    assert (ha, band) == (2560, 640)
    assert plan == [(0, 960, 0), (320, 1600, 320),
                    (960, 2240, 320), (1600, 2560, 320)]
    # misaligned height pads up; boundary sections clamp at the frame
    ha, band, plan = section_plan(1000, 3, 128)
    assert ha == 1152 and band == 384
    assert plan[0] == (0, 512, 0)
    assert plan[-1] == (640, 1152, 128)
    # one section degenerates to the monolithic program
    assert section_plan(512, 1, 320) == (512, 512, [(0, 512, 0)])


@pytest.mark.slow
def test_sections_match_monolithic():
    h, w = 2560, 128
    z = F.spheres_on_plane(h, w, n_spheres=5, seed=6).astype(np.float32)
    par = AOParams()
    want = np.asarray(render_frame(z, CAM, par, impl="jnp"))
    got = np.asarray(render_frame_sections(z, CAM, par, n_sections=4,
                                           impl="jnp"))
    assert got.shape == (h, w)
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.slow
def test_sections_misaligned_height_depth2():
    # derived halo (128 for depth 2) + a height needing the pad-and-crop
    h, w = 1000, 128
    z = F.spheres_on_plane(h, w, n_spheres=4, seed=7).astype(np.float32)
    par = AOParams(hierarchy_depth=2)
    want = np.asarray(render_frame(z, CAM, par, impl="jnp"))
    got = np.asarray(render_frame_sections(z, CAM, par, n_sections=3,
                                           impl="jnp"))
    assert got.shape == (h, w)
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.slow
def test_sections_normals_color_out_dtype():
    h, w = 512, 128
    z, n = F.spheres_on_plane(h, w, n_spheres=4, seed=8, with_normals=True)
    z = z.astype(np.float32)
    n = n.astype(np.float32)
    rng = np.random.default_rng(3)
    color = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    par = AOParams(hierarchy_depth=2, use_normals=True)
    want = np.asarray(render_frame(z, CAM, par, normals=n, color=color,
                                   impl="jnp", out_dtype="uint8"))
    got = np.asarray(render_frame_sections(z, CAM, par, n_sections=2,
                                           normals=n, color=color,
                                           impl="jnp", out_dtype="uint8"))
    assert got.dtype == np.uint8 and got.shape == (h, w, 3)
    # uint8 rounding can flip one code on ULP-level float differences
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


@pytest.mark.slow
def test_sections_fused_matches_monolithic():
    from tpuao.parallel.sections import render_frame_sections_fused

    h, w = 2560, 128
    z = F.spheres_on_plane(h, w, n_spheres=5, seed=6).astype(np.float32)
    par = AOParams()
    want = np.asarray(render_frame(z, CAM, par, impl="jnp"))
    for k in (2, 4):
        got = np.asarray(render_frame_sections_fused(z, CAM, par,
                                                     n_sections=k,
                                                     impl="jnp"))
        assert got.shape == (h, w)
        np.testing.assert_allclose(got, want, atol=2e-6, err_msg=f"k={k}")
    # misaligned height + one-section degenerate
    z2 = F.spheres_on_plane(1000, 128, n_spheres=4, seed=7
                            ).astype(np.float32)
    par2 = AOParams(hierarchy_depth=2)
    want2 = np.asarray(render_frame(z2, CAM, par2, impl="jnp"))
    got2 = np.asarray(render_frame_sections_fused(z2, CAM, par2,
                                                  n_sections=3, impl="jnp"))
    np.testing.assert_allclose(got2, want2, atol=2e-6)


@pytest.mark.slow
def test_derived_halo_sufficient_at_every_depth():
    """Sections-vs-monolithic equality IS an empirical stencil-reach
    test: if stencil_halo_rows under-estimated the reach for some
    hierarchy_depth, the crop would keep rows computed from truncated
    neighborhoods and the outputs would diverge."""
    w = 128
    for d, blur in ((1, True), (3, True), (4, False)):
        par = AOParams(hierarchy_depth=d, enable_blur=blur)
        halo = stencil_halo_rows(par)
        h = max(4 * 64, 2 * halo)  # 2 sections, each at least one halo
        z = F.spheres_on_plane(h, w, n_spheres=4, seed=10 + d
                               ).astype(np.float32)
        want = np.asarray(render_frame(z, CAM, par, impl="jnp"))
        got = np.asarray(render_frame_sections(z, CAM, par, n_sections=2,
                                               impl="jnp"))
        np.testing.assert_allclose(got, want, atol=2e-6,
                                   err_msg=f"depth={d} blur={blur}")


@pytest.mark.slow
def test_sections_fused_rejects_clamped_plan():
    """band < halo clamps the plan; the fused form's uniform-shape
    stacks would keep the wrong crop rows (review r3), so it must refuse
    -- while the separate-launch mode handles the same geometry exactly."""
    from tpuao.parallel.sections import render_frame_sections_fused

    z = F.spheres_on_plane(512, 128, n_spheres=3, seed=4
                           ).astype(np.float32)
    par = AOParams()  # halo 320 > band 256 at k=2
    with pytest.raises(AssertionError, match="band"):
        render_frame_sections_fused(z, CAM, par, n_sections=2, impl="jnp")
    want = np.asarray(render_frame(z, CAM, par, impl="jnp"))
    got = np.asarray(render_frame_sections(z, CAM, par, n_sections=2,
                                           impl="jnp"))
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.slow
def test_sections_batched_inputs():
    """Leading batch axes thread through the row slicing/stitching."""
    b, h, w = 2, 512, 128
    zs = np.stack([F.spheres_on_plane(h, w, n_spheres=3, seed=20 + i)
                   for i in range(b)]).astype(np.float32)
    par = AOParams(hierarchy_depth=2)
    want = np.asarray(render_frame(zs, CAM, par, impl="jnp"))
    got = np.asarray(render_frame_sections(zs, CAM, par, n_sections=2,
                                           impl="jnp"))
    assert got.shape == (b, h, w)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_sections_single_is_monolithic():
    h, w = 256, 128
    z = F.spheres_on_plane(h, w, n_spheres=3, seed=9).astype(np.float32)
    par = AOParams(hierarchy_depth=2)
    want = np.asarray(render_frame(z, CAM, par, impl="jnp"))
    got = np.asarray(render_frame_sections(z, CAM, par, n_sections=1,
                                           impl="jnp"))
    np.testing.assert_array_equal(got, want)
