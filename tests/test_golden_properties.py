"""Property tests for the golden NumPy spec (SURVEY.md SS5.1).

These hand-derived cases calibrate the pair test / rejection falloff
(SURVEY.md SS3.2 "to re-derive" note): with the reference mount empty, the
golden passing these properties is what makes it a valid spec.
"""

import numpy as np
import pytest

from tpuao.golden import reference as G
from tpuao.params import (
    GoldenAOParams,
    GoldenCameraParams,
    build_pair_table,
)
from tpuao.utils import fixtures as F


H, W = 128, 192  # small but multiple of 64 so no padding ambiguity


def test_pair_table_exhaustive():
    offs, w = build_pair_table(True)
    assert offs.shape == (34, 2)  # 4*2 axial + 3*2 diag + 5*4 L pairs
    assert np.isclose(w.sum(), 1.0)
    # all covered taps are distinct integer grid points with 0 < r^2 < 25
    taps = set()
    for (x, y) in offs:
        for s in (1, -1):
            taps.add((s * int(x), s * int(y)))
    assert all(0 < x * x + y * y < 25 for (x, y) in taps)
    assert len(taps) == 68

def test_pair_table_sparse():
    offs, w = build_pair_table(False)
    assert np.isclose(w.sum(), 1.0)
    # the sparse disc is exactly the even-coordinate entries -- taps that
    # stay on the half-res grid (the reference's non-exhaustive mode);
    # pin the offsets, not just the count, so a silent subset change
    # can't slip through a snapshot regeneration
    assert {(int(x), int(y)) for x, y in offs} == {
        (0, 2), (0, 4), (2, -4), (2, -2), (2, 0),
        (2, 2), (2, 4), (4, -2), (4, 0), (4, 2)}
    assert all(x % 2 == 0 and y % 2 == 0 for x, y in offs)


def test_linearize_monotone_and_range():
    cam = GoldenCameraParams(reversed_z=True, depth_mode="hardware")
    d = np.linspace(0, 1, 101)
    z = G.linearize_depth(d[None, :], cam)[0]
    assert np.all(np.diff(z) < 0)  # reversed-Z: d=1 is near -> z decreasing
    assert np.isclose(z[0], 1.0)  # far plane -> z/far = 1
    assert np.isclose(z[-1], cam.near / cam.far)


def test_pad_parity4_slice_clamp():
    x = np.arange(8 * 12, dtype=np.float64).reshape(8, 12)
    p = G.pad_parity4(x, 8)
    # stride-4 walk off the left edge from column c lands on column c % 4
    for c in range(4):
        assert np.all(p[8:16, 8 + c - 4] == x[:, c])
        assert np.all(p[8:16, 8 + c - 8] == x[:, c])
    # and off the bottom edge preserves row parity: padded rows 16..19
    # (BELOW the original's last row 15) must replicate rows 4..7
    for r in range(4):
        assert np.all(p[8 + 8 + r, 8:20] == x[4 + r, :])
        assert np.all(p[8 + 12 + r, 8:20] == x[4 + r, :])
    # and off the top edge: padded rows 4..7 replicate rows 0..3
    for r in range(4):
        assert np.all(p[4 + r, 8:20] == x[r, :])


def test_deinterleave_equivalence():
    # Spec claim: strided render with parity-clamp == per-slice render.
    rng = np.random.default_rng(0)
    z = rng.uniform(0.2, 0.8, size=(32, 48))
    p = G.pad_parity4(z, 16)
    # build the same padded array via explicit deinterleave -> edge-pad ->
    # interleave, proving the claimed equivalence in the module docstring
    slices = z.reshape(8, 4, 12, 4).transpose(1, 3, 0, 2)  # (4,4,h/4,w/4)
    padded_slices = np.stack(
        [
            np.pad(slices[i, j], 4, mode="edge")
            for i in range(4)
            for j in range(4)
        ]
    ).reshape(4, 4, 16, 20)
    re = padded_slices.transpose(2, 0, 3, 1).reshape(64, 80)
    assert np.array_equal(re, p)


def test_flat_plane_ao_is_one():
    cam = GoldenCameraParams(depth_mode="linear")
    par = GoldenAOParams()
    z = F.flat_plane(H, W, 0.3)
    ao = G.render_frame_golden(z, cam, par)
    assert ao.shape == (H, W)
    np.testing.assert_allclose(ao, 1.0, atol=1e-6)


def test_ao_in_unit_range(rng):
    cam = GoldenCameraParams(depth_mode="linear")
    par = GoldenAOParams()
    z = np.clip(rng.uniform(0.05, 1.0, size=(H, W)), 1e-3, 1.0)
    ao = G.render_frame_golden(z, cam, par)
    assert np.all(ao >= 0.0) and np.all(ao <= 1.0)


def test_corner_darker_than_walls():
    cam = GoldenCameraParams(depth_mode="linear")
    par = GoldenAOParams(enable_blur=False, hierarchy_depth=1)
    z = F.corner(H, W, z_base=0.5, slope=0.002)
    ao = G.render_ao_level(G.downsample2x(z), 1, W, cam, par)
    crease = ao[:, W // 4]  # center column at half res
    wall = ao[:, W // 8]
    assert crease.mean() < wall.mean() - 0.05
    assert wall.mean() > 0.9  # sloped wall mostly rescued by pair rejection


def test_step_edge_background_not_hazed():
    # Foreground object over far background: background pixels next to the
    # edge must not be strongly darkened (the scalable-AO rejection trick).
    cam = GoldenCameraParams(depth_mode="linear")
    par = GoldenAOParams(enable_blur=False, hierarchy_depth=1)
    z = F.step_edge(H, W, 0.15, 0.75)
    ao = G.render_ao_level(G.downsample2x(z), 1, W, cam, par)
    bg_near_edge = ao[:, W // 4 + 2 : W // 4 + 6]
    assert bg_near_edge.mean() > 0.7


def test_rejection_falloff_monotone():
    cam = GoldenCameraParams(depth_mode="linear")
    z = F.step_edge(H, W, 0.15, 0.75)
    means = []
    for falloff in (1.0, 2.5, 6.0, 10.0):
        par = GoldenAOParams(rejection_falloff=falloff, enable_blur=False,
                             hierarchy_depth=1)
        ao = G.render_ao_level(G.downsample2x(z), 1, W, cam, par)
        means.append(ao[:, W // 4 : W // 4 + 8].mean())
    # larger falloff -> quicker rejection -> more visibility
    assert all(b >= a - 1e-9 for a, b in zip(means, means[1:]))


def test_strength_darkens():
    cam = GoldenCameraParams(depth_mode="linear")
    z = F.corner(H, W, 0.5, 0.002)
    aos = []
    for s in (0.5, 1.0, 2.0, 4.0):
        par = GoldenAOParams(strength=s, enable_blur=False, hierarchy_depth=1)
        aos.append(G.render_ao_level(G.downsample2x(z), 1, W, cam, par).mean())
    assert all(b <= a + 1e-12 for a, b in zip(aos, aos[1:]))


def test_noise_filter_idempotent_on_constant():
    rng = np.random.default_rng(3)
    d = rng.uniform(0.2, 0.8, size=(24, 32))
    a = np.full((24, 32), 0.7)
    out = G.noise_filter(a, d, noise_filter_strength=1000.0)
    np.testing.assert_allclose(out, 0.7, atol=1e-12)


def test_noise_filter_smooths_flat_depth():
    rng = np.random.default_rng(4)
    d = np.full((24, 32), 0.5)
    a = 0.5 + 0.3 * rng.standard_normal((24, 32))
    out = G.noise_filter(a, d, noise_filter_strength=1.0)
    assert out.std() < a.std()


def test_noise_filter_suppresses_across_depth_step():
    """The 1/(1+NFS*dd^2) term must down-weight neighbors across a depth
    edge: with a strong step, a pixel's filtered AO stays near its own
    side's value instead of averaging across (a depth-blind [1,2,1]^2
    blur would fail this)."""
    d = np.full((8, 16), 0.2)
    d[:, 8:] = 0.9
    a = np.where(d < 0.5, 0.0, 1.0)
    strong = G.noise_filter(a, d, noise_filter_strength=1e4)
    blind = G.noise_filter(a, d, noise_filter_strength=0.0)
    # boundary columns: depth-aware keeps the edge sharp
    assert strong[:, 7].max() < 0.01 and strong[:, 8].min() > 0.99
    # sanity: the depth-blind filter DOES bleed (so the assert above is
    # discriminating, not vacuous)
    assert blind[:, 7].max() > 0.2 and blind[:, 8].min() < 0.8


def test_bilateral_upsample_exact_on_constant():
    lo = np.full((8, 12), 0.42)
    lo_d = np.full((8, 12), 0.5)
    hi_d = np.full((16, 24), 0.5)
    up = G.bilateral_upsample2x(lo, lo_d, hi_d, k_blur=1.0, k_up=1e-7)
    np.testing.assert_allclose(up, 0.42, atol=1e-9)


def test_bilateral_upsample_respects_depth_edges():
    # AO=0 on a foreground object, AO=1 on background; upsampling must not
    # bleed the foreground AO across a strong depth edge.
    lo_d = np.full((8, 12), 0.8)
    lo_d[:, :6] = 0.2
    lo = np.where(lo_d < 0.5, 0.0, 1.0)
    hi_d = np.repeat(np.repeat(lo_d, 2, 0), 2, 1)
    up = G.bilateral_upsample2x(lo, lo_d, hi_d, k_blur=1e-4, k_up=1e-9)
    # background column adjacent to the edge stays ~1
    assert up[:, 13].min() > 0.95
    assert up[:, 10].max() < 0.05
    # the DISCRIMINATING column: hi column 11 interpolates lo columns 5
    # (foreground) and 6 (background); plain bilinear would give 0.5,
    # the depth term must keep it on its own (foreground) side
    assert up[:, 11].max() < 0.05


def test_full_pipeline_shapes_and_padding():
    cam = GoldenCameraParams(depth_mode="linear")
    par = GoldenAOParams()
    z = F.spheres_on_plane(100, 150, cam)  # odd sizes -> exercises padding
    ao = G.render_frame_golden(z, cam, par)
    assert ao.shape == (100, 150)
    assert np.all((ao >= 0) & (ao <= 1))


def test_spheres_scene_has_contact_shadows():
    cam = GoldenCameraParams(depth_mode="linear")
    par = GoldenAOParams()
    z = F.spheres_on_plane(192, 256, cam, n_spheres=4, seed=2)
    ao = G.render_frame_golden(z, cam, par)
    assert ao.min() < 0.85  # some occlusion somewhere
    assert ao.mean() > 0.6  # but the scene is mostly open


def test_normals_path_runs_and_differs():
    cam = GoldenCameraParams(depth_mode="linear")
    z, n = F.spheres_on_plane(128, 192, cam, n_spheres=3, seed=5,
                              with_normals=True)
    par0 = GoldenAOParams()
    par1 = GoldenAOParams(use_normals=True)
    ao0 = G.render_frame_golden(z, cam, par0)
    ao1 = G.render_frame_golden(z, cam, par1, normals=n)
    assert ao1.shape == ao0.shape
    assert np.all((ao1 >= 0) & (ao1 <= 1))
    assert not np.allclose(ao0, ao1)


def test_normals_grazing_plane_no_horizon_band():
    # Regression: an empty ground plane viewed to the horizon must stay
    # unoccluded under the normals path (hard tangent clamps produced a
    # black horizon band; the soft clamp fades to depth-only behavior).
    cam = GoldenCameraParams(depth_mode="linear")
    z, n = F.spheres_on_plane(192, 256, cam, n_spheres=0, with_normals=True)
    ao = G.render_frame_golden(z, cam, GoldenAOParams(use_normals=True),
                               normals=n)
    assert ao.min() > 0.75, ao.min()
    assert ao.mean() > 0.97


def test_normals_flat_wall_unchanged():
    # A camera-facing wall has zero tangent correction: normals path == plain.
    cam = GoldenCameraParams(depth_mode="linear")
    z = F.flat_plane(H, W, 0.4)
    n = np.zeros((H, W, 3))
    n[..., 2] = 1.0
    ao0 = G.render_frame_golden(z, cam, GoldenAOParams())
    ao1 = G.render_frame_golden(z, cam, GoldenAOParams(use_normals=True),
                                normals=n)
    np.testing.assert_allclose(ao0, ao1, atol=1e-12)


def test_composite():
    color = np.full((16, 16, 3), 0.8)
    ao = np.full((16, 16), 0.5)
    out = G.composite(color, ao)
    np.testing.assert_allclose(out, 0.4)
    dbg = G.composite(color, ao, debug=True)
    np.testing.assert_allclose(dbg, 0.5)


def test_hierarchy_depths():
    cam = GoldenCameraParams(depth_mode="linear")
    z = F.spheres_on_plane(128, 128, cam, seed=7)
    for d in (1, 2, 3, 4):
        ao = G.render_frame_golden(z, cam, GoldenAOParams(hierarchy_depth=d))
        assert ao.shape == (128, 128)


def test_hardware_depth_roundtrip(hw_camera):
    z = F.spheres_on_plane(64, 64)
    d = F.to_hardware_depth(z, hw_camera)
    z2 = G.linearize_depth(d, hw_camera)
    np.testing.assert_allclose(z2, np.clip(z, hw_camera.near / hw_camera.far, 1.0),
                               atol=1e-6)
