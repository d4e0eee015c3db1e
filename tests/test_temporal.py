"""Temporal accumulation tests (spec: tpuao/golden/temporal.py).

Golden property tests pin the resolve semantics (null history, disocclusion
reset, identity-motion == static, translation reprojection geometry); the
parity tests hold the JAX implementation (ops/temporal.py and the pipeline/
scan drivers) to the golden spec.
"""

import numpy as np
import pytest

from tpuao.golden import temporal as GT
from tpuao.golden.reference import linearize_depth
from tpuao.params import (
    AOParams,
    CameraParams,
    GoldenAOParams,
    GoldenCameraParams,
    GoldenTemporalParams,
    TemporalParams,
)
from tpuao.utils import fixtures as F


CAM = GoldenCameraParams(depth_mode="linear")
JCAM = CameraParams(depth_mode="linear")


def smooth_depth(h, w, seed=0):
    """Smooth analytic depth in (0, 1): bounded neighbor deltas keep the
    f32-vs-f64 bilinear coordinate quantization error well under 1e-3."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    z = 0.45 + 0.15 * np.sin(xx / 17.0 + rng.uniform(0, 6)) * \
        np.cos(yy / 23.0 + rng.uniform(0, 6)) + 0.1 * (xx + yy) / (h + w)
    return np.clip(z, 0.05, 0.95)


def smooth_field(h, w, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    return 0.5 + 0.4 * np.sin(xx / 11.0 + rng.uniform(0, 6)) * \
        np.sin(yy / 13.0 + rng.uniform(0, 6))


def translation(tx=0.0, ty=0.0, tz=0.0):
    m = np.eye(4)
    m[0, 3], m[1, 3], m[2, 3] = tx, ty, tz
    return m


# ---------------------------------------------------------------------------
# Golden spec properties
# ---------------------------------------------------------------------------

def test_null_history_resolves_to_current():
    h, w = 48, 64
    ao = smooth_field(h, w)
    d = smooth_depth(h, w)
    prev_ao = np.ones((h, w))
    prev_d = np.full((h, w), GT.NULL_DEPTH)
    out = GT.temporal_resolve_golden(ao, d, prev_ao, prev_d, CAM,
                                     GoldenTemporalParams())
    np.testing.assert_array_equal(out, ao)


def test_static_blend_formula():
    # matching depths, clamp off: out = w*hist + (1-w)*curr exactly
    h, w = 32, 40
    ao = smooth_field(h, w)
    hist = smooth_field(h, w, seed=7)
    d = smooth_depth(h, w)
    tp = GoldenTemporalParams(history_weight=0.8, neighborhood_clamp=False)
    out = GT.temporal_resolve_golden(ao, d, hist, d, CAM, tp)
    np.testing.assert_allclose(out, 0.8 * hist + 0.2 * ao, atol=1e-12)


def test_disocclusion_resets_to_current():
    h, w = 32, 40
    ao = smooth_field(h, w)
    hist = np.zeros((h, w))  # maximally different history
    d = smooth_depth(h, w)
    tp = GoldenTemporalParams(depth_tolerance=0.1, neighborhood_clamp=False)
    out = GT.temporal_resolve_golden(ao, d, hist, d * 2.0, CAM, tp)
    np.testing.assert_array_equal(out, ao)  # rel_err 1.0 >> tol


def test_confidence_soft_falloff_monotone():
    # history influence decreases monotonically with depth mismatch
    h, w = 16, 16
    ao = np.full((h, w), 0.5)
    hist = np.ones((h, w))
    d = np.full((h, w), 0.4)
    tp = GoldenTemporalParams(history_weight=0.9, depth_tolerance=0.2,
                              neighborhood_clamp=False)
    outs = [
        GT.temporal_resolve_golden(ao, d, hist, d * (1 + e), CAM, tp).mean()
        for e in (0.0, 0.05, 0.1, 0.15, 0.25)
    ]
    assert all(a >= b - 1e-12 for a, b in zip(outs, outs[1:]))
    assert outs[0] == pytest.approx(0.5 + 0.9 * 0.5)  # full confidence
    assert outs[-1] == pytest.approx(0.5)  # past tolerance: no history


def test_neighborhood_clamp_bounds_history():
    h, w = 32, 32
    ao = smooth_field(h, w)
    hist = np.ones((h, w))  # bright ghost everywhere
    d = smooth_depth(h, w)
    tp = GoldenTemporalParams(history_weight=0.9, neighborhood_clamp=True)
    out = GT.temporal_resolve_golden(ao, d, hist, d, CAM, tp)
    lo, hi = GT.neighborhood_bounds(ao)
    assert np.all(out <= 0.9 * hi + 0.1 * ao + 1e-12)


def test_identity_motion_matches_static_path():
    h, w = 40, 56
    ao = smooth_field(h, w)
    hist = smooth_field(h, w, seed=3)
    d = smooth_depth(h, w)
    tp = GoldenTemporalParams(neighborhood_clamp=False)
    stat = GT.temporal_resolve_golden(ao, d, hist, d, CAM, tp, motion=None)
    ident = GT.temporal_resolve_golden(ao, d, hist, d, CAM, tp,
                                       motion=np.eye(4))
    np.testing.assert_allclose(ident, stat, atol=1e-9)


def test_translation_reprojects_expected_pixel():
    """A lateral camera-space translation lands history taps exactly where
    the pinhole geometry says: an impulse planted at the predicted previous
    pixel is picked up at full confidence (constant-depth plane keeps depth
    agreement exact)."""
    h, w = 64, 96
    d01 = 0.5
    d = np.full((h, w), d01)
    ao = np.full((h, w), 0.5)
    # p_prev = p_curr + [tx, 0, 0]: choose tx for an exact +5-pixel column
    # shift at this depth: jp = j + tx / (z * tanH) * (W/2)
    z = d01 * CAM.far
    shift = 5
    tx = shift * z * CAM.tan_half_fov_h * 2.0 / w
    hist = np.full((h, w), 0.5)
    iy, jx = h // 2, w // 2
    hist[iy, jx + shift] = 1.0  # impulse at the predicted prev pixel
    tp = GoldenTemporalParams(history_weight=0.9, depth_tolerance=0.2,
                              neighborhood_clamp=False,
                              max_displacement=None)
    out = GT.temporal_resolve_golden(ao, d, hist, d, CAM, tp,
                                     motion=translation(tx=tx))
    # the impulse is gathered at (iy, jx) and nowhere else
    expect = 0.9 * 1.0 + 0.1 * 0.5
    assert out[iy, jx] == pytest.approx(expect, abs=1e-9)
    # every other pixel stays at the flat 0.5 (in-bounds history is also
    # 0.5; out-of-bounds history falls back to the current 0.5)
    mask = np.ones((h, w), bool)
    mask[iy, jx] = False
    assert np.allclose(out[mask], 0.5, atol=1e-9)


def test_vertical_translation_sign():
    # +ty in eye space is 'up': history for a pixel comes from SMALLER
    # row indices... derive: yp = y + ty, v' = v + ty/(z tanV),
    # ip = (1-v')/2*h - .5 = i - ty/(z tanV) * h/2  (up-shift: smaller ip)
    h, w = 64, 64
    d01 = 0.4
    z = d01 * CAM.far
    tan_v = CAM.tan_half_fov_h * h / w
    shift = 3
    ty = shift * z * tan_v * 2.0 / h
    d = np.full((h, w), d01)
    ao = np.full((h, w), 0.5)
    hist = np.full((h, w), 0.5)
    iy, jx = h // 2, w // 2
    hist[iy - shift, jx] = 1.0
    tp = GoldenTemporalParams(history_weight=0.9, neighborhood_clamp=False)
    assert shift <= tp.max_displacement  # stays inside the default window
    out = GT.temporal_resolve_golden(ao, d, hist, d, CAM, tp,
                                     motion=translation(ty=ty))
    assert out[iy, jx] == pytest.approx(0.9 + 0.1 * 0.5, abs=1e-9)


def test_behind_camera_rejected():
    h, w = 32, 32
    d = np.full((h, w), 0.2)
    ao = np.full((h, w), 0.7)
    hist = np.zeros((h, w))
    tp = GoldenTemporalParams(neighborhood_clamp=False)
    # push every point behind the previous camera
    out = GT.temporal_resolve_golden(
        ao, d, hist, d, CAM, tp, motion=translation(tz=-0.3 * CAM.far))
    np.testing.assert_array_equal(out, ao)


# ---------------------------------------------------------------------------
# JAX implementation parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("clamp", [True, False])
def test_impl_matches_golden_static(clamp):
    from tpuao.ops.temporal import temporal_resolve

    h, w = 96, 128
    ao = smooth_field(h, w)
    hist = smooth_field(h, w, seed=5)
    d = smooth_depth(h, w)
    pd = d * (1.0 + 0.04 * np.sin(np.arange(w) / 5.0))  # partial confidence
    tp = GoldenTemporalParams(history_weight=0.85, depth_tolerance=0.1,
                              neighborhood_clamp=clamp)
    jtp = TemporalParams(history_weight=0.85, depth_tolerance=0.1,
                         neighborhood_clamp=clamp)
    want = GT.temporal_resolve_golden(ao, d, hist, pd, CAM, tp)
    got = np.asarray(temporal_resolve(
        ao.astype(np.float32), d.astype(np.float32),
        hist.astype(np.float32), pd.astype(np.float32), JCAM, jtp))
    assert np.abs(got - want).max() <= 1e-3
    assert np.abs(got - want).max() <= 5e-5  # measured headroom


@pytest.mark.parametrize("max_displacement", [4, None])
@pytest.mark.parametrize("motion", [
    translation(tx=0.8, ty=-0.5, tz=1.3),
    # gentle rotation about the view axis + translation
    np.array([[0.9998, -0.02, 0.0, 0.4],
              [0.02, 0.9998, 0.0, -0.2],
              [0.0, 0.0, 1.0, 0.8],
              [0.0, 0.0, 0.0, 1.0]]),
])
def test_impl_matches_golden_motion(motion, max_displacement):
    from tpuao.golden.temporal import reproject_coords
    from tpuao.ops.temporal import temporal_resolve

    h, w = 96, 128
    ao = smooth_field(h, w)
    hist = smooth_field(h, w, seed=9)
    d = smooth_depth(h, w)
    pd = smooth_depth(h, w, seed=2)
    tp = GoldenTemporalParams(history_weight=0.9, depth_tolerance=0.3,
                              neighborhood_clamp=False,
                              max_displacement=max_displacement)
    jtp = TemporalParams(history_weight=0.9, depth_tolerance=0.3,
                         neighborhood_clamp=False,
                         max_displacement=max_displacement)
    want = GT.temporal_resolve_golden(ao, d, hist, pd, CAM, tp, motion)
    got = np.asarray(temporal_resolve(
        ao.astype(np.float32), d.astype(np.float32),
        hist.astype(np.float32), pd.astype(np.float32), JCAM, jtp,
        motion=motion.astype(np.float32)))
    # mask the validity boundaries: pixels whose continuous prev coordinate
    # sits within 1e-3 texels of the frame edge (or the displacement
    # window edge) can flip the binary validity mask between f32 and f64
    # (the only discontinuities in the resolve; everything else is
    # Lipschitz in the coordinates)
    ip, jp, _, _ = reproject_coords(d, CAM, motion)
    eps = 1e-3
    safe = ((np.abs(ip + 0.5) > eps) & (np.abs(ip - (h - 0.5)) > eps)
            & (np.abs(jp + 0.5) > eps) & (np.abs(jp - (w - 0.5)) > eps))
    if max_displacement is not None:
        ii, jj = np.mgrid[0:h, 0:w]
        safe &= (np.abs(np.abs(ip - ii) - max_displacement) > eps)
        safe &= (np.abs(np.abs(jp - jj) - max_displacement) > eps)
    err = np.abs(got - want)[safe].max()
    assert err <= 1e-3
    assert err <= 1e-4  # measured headroom


def test_windowed_equals_gather_within_window():
    """The gather-free windowed resolve is EXACT vs the true-gather path
    wherever displacement fits the window (here: everywhere)."""
    from tpuao.ops.temporal import temporal_resolve

    h, w = 64, 96
    ao = smooth_field(h, w).astype(np.float32)
    hist = smooth_field(h, w, seed=9).astype(np.float32)
    d = smooth_depth(h, w).astype(np.float32)
    motion = translation(tx=0.4, ty=0.2).astype(np.float32)  # ~1 px
    kw = dict(history_weight=0.9, depth_tolerance=0.3,
              neighborhood_clamp=False)
    got_w = np.asarray(temporal_resolve(
        ao, d, hist, d, JCAM, TemporalParams(max_displacement=4, **kw),
        motion=motion))
    got_g = np.asarray(temporal_resolve(
        ao, d, hist, d, JCAM, TemporalParams(max_displacement=None, **kw),
        motion=motion))
    np.testing.assert_allclose(got_w, got_g, atol=2e-6)


def test_displacement_beyond_window_drops_history():
    from tpuao.ops.temporal import temporal_resolve

    h, w = 64, 96
    ao = np.full((h, w), 0.5, np.float32)
    hist = np.zeros((h, w), np.float32)
    d = np.full((h, w), 0.5, np.float32)
    z = 0.5 * float(JCAM.far)
    # uniform 6-px column shift > R=4: every pixel loses history
    tx = 6.0 * z * float(JCAM.tan_half_fov_h) * 2.0 / w
    out = np.asarray(temporal_resolve(
        ao, d, hist, d, JCAM,
        TemporalParams(neighborhood_clamp=False, max_displacement=4),
        motion=translation(tx=tx).astype(np.float32)))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_pipeline_temporal_static_steady_state():
    from tpuao.models.pipeline import render_frame, render_frame_temporal

    z = F.spheres_on_plane(96, 128, n_spheres=3, seed=3).astype(np.float32)
    par = AOParams()
    single = np.asarray(render_frame(z, JCAM, par))
    out0, st = render_frame_temporal(z, None, JCAM, par)
    # frame 0: null history -> exactly the single-frame result
    np.testing.assert_allclose(np.asarray(out0), single, atol=1e-6)
    # repeated identical frames: steady state (history == current)
    out1, st = render_frame_temporal(z, st, JCAM, par)
    np.testing.assert_allclose(np.asarray(out1), single, atol=1e-6)
    # state carries (resolved, linz)
    np.testing.assert_allclose(np.asarray(st[1]),
                               np.asarray(z, np.float64), atol=1e-6)


def test_pipeline_temporal_denoises():
    """Accumulation across noisy depth frames suppresses frame-to-frame AO
    flicker -- the reason the mode exists.  (Flicker, not mean error vs the
    clean scene, is the right metric: depth noise also biases the AO
    estimate, and no temporal filter can remove a bias common to every
    frame.)"""
    from tpuao.models.pipeline import render_frame, render_frame_temporal

    rng = np.random.default_rng(11)
    base = F.spheres_on_plane(96, 128, n_spheres=3, seed=4)
    tp = TemporalParams(history_weight=0.9)
    st, prev_out, prev_single = None, None, None
    flicker_t, flicker_s = [], []
    for t in range(12):
        noisy = np.clip(base + rng.normal(0, 2e-3, base.shape), 1e-3, 1.0)
        noisy = noisy.astype(np.float32)
        out, st = render_frame_temporal(noisy, st, JCAM, AOParams(), tp)
        out = np.asarray(out)
        single = np.asarray(render_frame(noisy, JCAM, AOParams()))
        if t >= 6:  # after the history warms up
            flicker_t.append(np.abs(out - prev_out).mean())
            flicker_s.append(np.abs(single - prev_single).mean())
        prev_out, prev_single = out, single
    assert np.mean(flicker_t) < 0.35 * np.mean(flicker_s)


def test_sequence_scan_matches_stepwise():
    from tpuao.models.pipeline import (
        render_frame_temporal,
        render_sequence_temporal,
    )

    t_n, h, w = 4, 96, 128
    rng = np.random.default_rng(8)
    depths = np.stack([
        np.clip(F.spheres_on_plane(h, w, n_spheres=3, seed=s)
                + rng.normal(0, 1e-3, (h, w)), 1e-3, 1.0)
        for s in (5, 5, 5, 5)
    ]).astype(np.float32)
    motions = np.stack([np.eye(4, dtype=np.float32)] * t_n)
    motions[1:, 0, 3] = 0.05  # small lateral drift each frame
    tp = TemporalParams(history_weight=0.8)
    seq = np.asarray(render_sequence_temporal(depths, JCAM, AOParams(), tp,
                                              motions=motions))
    assert seq.shape == (t_n, h, w)
    st = None
    for t in range(t_n):
        out, st = render_frame_temporal(
            depths[t], st, JCAM, AOParams(), tp,
            motion=None if t == 0 else motions[t])
        np.testing.assert_allclose(seq[t], np.asarray(out), atol=2e-6)


@pytest.mark.slow
def test_sequence_matches_golden_sequence():
    from tpuao.models.pipeline import render_sequence_temporal
    from tpuao.golden.temporal import render_sequence_golden
    from tpuao.params import GoldenAOParams

    t_n, h, w = 3, 96, 128
    depths = np.stack([
        F.spheres_on_plane(h, w, n_spheres=2, seed=s) for s in (1, 2, 3)
    ])
    motions = np.stack([np.eye(4)] * t_n)
    motions[1:, 0, 3] = 0.3
    tp = TemporalParams(history_weight=0.7)
    gtp = GoldenTemporalParams(history_weight=0.7)
    got = np.asarray(render_sequence_temporal(
        depths.astype(np.float32), JCAM, AOParams(), tp,
        motions=motions.astype(np.float32)))
    want = render_sequence_golden(depths, CAM, GoldenAOParams(), gtp,
                                  motions=motions)
    assert np.abs(got - want).max() <= 1e-3


def test_temporal_engine_view_matrices():
    from tpuao.models.pipeline import TemporalAOEngine

    z = F.spheres_on_plane(64, 64, n_spheres=2, seed=6).astype(np.float32)
    eng = TemporalAOEngine(camera=JCAM)
    v0 = np.eye(4)
    v1 = np.eye(4)
    v1[0, 3] = 0.1  # camera slides between frames
    o0 = np.asarray(eng.render(z, view=v0))
    o1 = np.asarray(eng.render(z, view=v1))
    assert o0.shape == o1.shape == (64, 64)
    assert np.all((o1 >= 0) & (o1 <= 1))
    eng.reset()
    o0b = np.asarray(eng.render(z, view=v0))
    np.testing.assert_allclose(o0b, o0, atol=1e-6)
    with pytest.raises(ValueError):
        eng.render(z, motion=np.eye(4), view=v0)


def test_temporal_params_validation():
    with pytest.raises(ValueError):
        TemporalParams(history_weight=1.5).validate()
    with pytest.raises(ValueError):
        TemporalParams(depth_tolerance=0.0).validate()
    TemporalParams().validate()  # defaults in range


def test_temporal_no_retrace_on_tunables():
    """Tunables and motion values ride as traced leaves: changing them
    must not recompile the temporal frame program."""
    import jax

    from tpuao.models.pipeline import (
        _temporal_frame_jit_for_backend,
        render_frame_temporal,
    )

    z = F.spheres_on_plane(64, 64, n_spheres=2, seed=2).astype(np.float32)
    fn = _temporal_frame_jit_for_backend(jax.default_backend(), 0)
    m0 = np.eye(4, dtype=np.float32)
    m1 = m0.copy()
    m1[0, 3] = 0.2
    _, st = render_frame_temporal(z, None, JCAM, AOParams(),
                                  TemporalParams(), motion=m0)
    n0 = fn._cache_size()
    render_frame_temporal(
        z, st, JCAM, AOParams(strength=1.7),
        TemporalParams(history_weight=0.5, depth_tolerance=0.3), motion=m1)
    assert fn._cache_size() == n0


# ---------------------------------------------------------------------------
# Fleet temporal: view-sharded independent sequences (parallel/sharding.py)
# ---------------------------------------------------------------------------


def _fleet_depths(v, t_n, h, w):
    return np.stack([
        np.stack([F.spheres_on_plane(h, w, n_spheres=2, seed=10 * s + t)
                  for t in range(t_n)])
        for s in range(v)
    ]).astype(np.float32)


def test_sharded_sequences_match_per_view():
    """(V, T, H, W) view-sharded fleet == per-view sequence scans."""
    from tpuao.models.pipeline import render_sequence_temporal
    from tpuao.parallel.sharding import (
        make_mesh,
        render_sequences_temporal_sharded,
    )

    v, t_n, h, w = 4, 3, 48, 64
    depths = _fleet_depths(v, t_n, h, w)
    tp = TemporalParams(history_weight=0.8)
    out = render_sequences_temporal_sharded(
        depths, JCAM, AOParams(), tp, mesh=make_mesh(4), impl="jnp")
    assert out.shape == (v, t_n, h, w)
    for s in range(v):
        want = np.asarray(render_sequence_temporal(
            depths[s], JCAM, AOParams(), tp, impl="jnp"))
        np.testing.assert_allclose(np.asarray(out)[s], want, atol=2e-6)
    # level-1 resolve fleet: half-res per-chip history carry
    motions = np.tile(np.eye(4, dtype=np.float32), (v, t_n, 1, 1))
    motions[:, 1:, 0, 3] = 0.02
    out1 = render_sequences_temporal_sharded(
        depths, JCAM, AOParams(), tp, motions=motions, mesh=make_mesh(4),
        impl="jnp", resolve_level=1)
    assert out1.shape == (v, t_n, h, w)
    for s in range(v):
        want = np.asarray(render_sequence_temporal(
            depths[s], JCAM, AOParams(), tp, motions=motions[s],
            impl="jnp", resolve_level=1))
        np.testing.assert_allclose(np.asarray(out1)[s], want, atol=2e-6)


@pytest.mark.slow
def test_sharded_sequences_moving_cameras_and_normals():
    """Per-view motion stacks and normals ride the same view sharding."""
    from tpuao.models.pipeline import render_sequence_temporal
    from tpuao.parallel.sharding import (
        make_mesh,
        render_sequences_temporal_sharded,
    )

    v, t_n, h, w = 8, 3, 48, 64
    depths = _fleet_depths(v, t_n, h, w)
    motions = np.tile(np.eye(4, dtype=np.float32), (v, t_n, 1, 1))
    for s in range(v):
        motions[s, 1:, 0, 3] = 0.02 * (s + 1)  # each view drifts its own way
    normals = np.zeros((v, t_n, h, w, 3), np.float32)
    normals[..., 2] = 1.0
    tp = TemporalParams(history_weight=0.7)
    par = AOParams(use_normals=True)
    out = render_sequences_temporal_sharded(
        depths, JCAM, par, tp, motions=motions, normals=normals,
        mesh=make_mesh(8), impl="jnp")
    assert out.shape == (v, t_n, h, w)
    for s in (0, 3, 7):
        want = np.asarray(render_sequence_temporal(
            depths[s], JCAM, par, tp, motions=motions[s],
            normals=normals[s], impl="jnp"))
        np.testing.assert_allclose(np.asarray(out)[s], want, atol=2e-6)


@pytest.mark.slow
def test_sharded_sequences_uneven_views():
    """5 sequences on a 4-mesh: pad+crop, values == per-view."""
    from tpuao.models.pipeline import render_sequence_temporal
    from tpuao.parallel.sharding import (
        make_mesh,
        render_sequences_temporal_sharded,
    )

    v, t_n, h, w = 5, 2, 48, 64
    depths = _fleet_depths(v, t_n, h, w)
    tp = TemporalParams()
    out = render_sequences_temporal_sharded(
        depths, JCAM, AOParams(), tp, mesh=make_mesh(4), impl="jnp")
    assert out.shape == (v, t_n, h, w)
    for s in range(v):
        want = np.asarray(render_sequence_temporal(
            depths[s], JCAM, AOParams(), tp, impl="jnp"))
        np.testing.assert_allclose(np.asarray(out)[s], want, atol=2e-6)
    # level-1 resolve fleet: half-res per-chip history carry
    motions = np.tile(np.eye(4, dtype=np.float32), (v, t_n, 1, 1))
    motions[:, 1:, 0, 3] = 0.02
    out1 = render_sequences_temporal_sharded(
        depths, JCAM, AOParams(), tp, motions=motions, mesh=make_mesh(4),
        impl="jnp", resolve_level=1)
    assert out1.shape == (v, t_n, h, w)
    for s in range(v):
        want = np.asarray(render_sequence_temporal(
            depths[s], JCAM, AOParams(), tp, motions=motions[s],
            impl="jnp", resolve_level=1))
        np.testing.assert_allclose(np.asarray(out1)[s], want, atol=2e-6)


def test_sharded_sequences_program_has_no_collectives():
    """Sequences are dependent in T but independent in V: the compiled
    fleet program must contain zero collectives (same audit as
    test_sharding.py for the single-frame mode)."""
    import jax.numpy as jnp

    from tpuao.parallel.sharding import (
        _temporal_sharded_jit,
        make_mesh,
    )

    mesh = make_mesh(8)
    depths = jnp.asarray(_fleet_depths(8, 2, 48, 64))
    fn = _temporal_sharded_jit(mesh, False, False, "jnp", 48 * 64,
                               "float32")
    hlo = fn.lower(depths, None, None, JCAM, AOParams(),
                   TemporalParams()).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "all-to-all", "reduce-scatter"):
        assert coll not in hlo, f"unexpected collective {coll} in fleet"


# ---------------------------------------------------------------------------
# Pallas windowed resolve (pallas_kernels.windowed_resolve)
# ---------------------------------------------------------------------------


def test_pallas_windowed_resolve_matches_xla():
    """The VMEM-tile kernel is bit-compatible with the XLA row-scan form
    (same tent-sum formulation; interpret mode on the CPU backend)."""
    import jax.numpy as jnp

    from tpuao.ops import temporal as T
    from tpuao.ops.pallas_kernels import windowed_resolve

    h, w, r = 96, 128, 3
    ao = smooth_field(h, w, seed=3).astype(np.float32)
    d = smooth_depth(h, w, seed=4).astype(np.float32)
    rng = np.random.default_rng(5)
    ip = (np.mgrid[0:h, 0:w][0] +
          rng.uniform(-r, r, (h, w))).astype(np.float32)
    jp = (np.mgrid[0:h, 0:w][1] +
          rng.uniform(-r, r, (h, w))).astype(np.float32)
    want = T._bilinear_windowed2(jnp.asarray(ao), jnp.asarray(d),
                                 jnp.asarray(ip), jnp.asarray(jp), r)
    got = windowed_resolve(jnp.asarray(ao), jnp.asarray(d),
                           jnp.asarray(ip), jnp.asarray(jp), r)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=1e-5)


def test_pallas_windowed_resolve_row_tiling():
    """Row tiles that do not divide H exercise the pad+crop grid path."""
    import jax.numpy as jnp

    from tpuao.ops import temporal as T
    from tpuao.ops.pallas_kernels import windowed_resolve

    h, w, r = 70, 64, 2
    ao = smooth_field(h, w, seed=6).astype(np.float32)
    d = smooth_depth(h, w, seed=7).astype(np.float32)
    ip = (np.mgrid[0:h, 0:w][0] + 0.4).astype(np.float32)
    jp = (np.mgrid[0:h, 0:w][1] - 1.3).astype(np.float32)
    want = T._bilinear_windowed2(jnp.asarray(ao), jnp.asarray(d),
                                 jnp.asarray(ip), jnp.asarray(jp), r)
    got = windowed_resolve(jnp.asarray(ao), jnp.asarray(d),
                           jnp.asarray(ip), jnp.asarray(jp), r,
                           row_tile=32)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=1e-5)


def test_temporal_resolve_impl_pallas_parity():
    """temporal_resolve(impl='pallas') == impl='auto' for a moving camera
    (full resolve: validity, confidence, neighborhood clamp)."""
    import jax.numpy as jnp

    from tpuao.ops.temporal import temporal_resolve

    h, w = 80, 96
    curr_ao = smooth_field(h, w, seed=8).astype(np.float32)
    curr_d = smooth_depth(h, w, seed=9).astype(np.float32)
    prev_ao = smooth_field(h, w, seed=10).astype(np.float32)
    prev_d = curr_d + 0.002
    tp = TemporalParams(history_weight=0.85, max_displacement=3)
    mot = translation(tx=0.05, ty=-0.02)
    args = [jnp.asarray(a) for a in (curr_ao, curr_d, prev_ao, prev_d)]
    want = temporal_resolve(*args, JCAM, tp,
                            motion=jnp.asarray(mot, jnp.float32))
    got = temporal_resolve(*args, JCAM, tp,
                           motion=jnp.asarray(mot, jnp.float32),
                           impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Moving-camera end-to-end (fixtures eye= + derived view-matrix motion)
# ---------------------------------------------------------------------------


def test_fixture_eye_zero_is_identity():
    a = F.spheres_on_plane(48, 64, n_spheres=3, seed=2)
    b = F.spheres_on_plane(48, 64, n_spheres=3, seed=2, eye=(0.0, 0.0, 0.0))
    np.testing.assert_array_equal(a, b)


def test_dolly_sequence_reprojection_aligns_history():
    """A static world raycast from a dollying eye: with the CORRECT
    per-frame motion matrices the reprojected history agrees with the
    current frame's AO (small resolved-vs-current residual); feeding the
    same sequence an identity motion (wrong) must misalign history and
    leave a strictly larger residual.  End-to-end over fixtures ``eye=``,
    ``utils.camera.relative_motion``, and the windowed resolve."""
    from tpuao.models.pipeline import render_frame_temporal, render_frame
    from tpuao.utils.camera import relative_motion

    h, w, t_n = 96, 128, 4
    step = 0.08
    eyes = [(step * t, 0.0, 0.0) for t in range(t_n)]
    depths = [F.spheres_on_plane(h, w, n_spheres=4, seed=5, eye=e
                                 ).astype(np.float32) for e in eyes]

    def views(e):
        v = np.eye(4)
        v[0, 3], v[1, 3], v[2, 3] = -e[0], -e[1], -e[2]
        return v

    tp = TemporalParams(history_weight=0.9, neighborhood_clamp=False)

    def run(correct_motion: bool):
        st, resid = None, []
        for t in range(t_n):
            motion = None
            if t > 0 and correct_motion:
                motion = relative_motion(views(eyes[t - 1]), views(eyes[t]))
            out, st = render_frame_temporal(
                depths[t], st, JCAM, AOParams(), tp, motion=motion)
            if t > 0:
                cur = np.asarray(render_frame(depths[t], JCAM, AOParams()))
                resid.append(np.abs(np.asarray(out) - cur).mean())
        return np.mean(resid)

    aligned = run(True)
    misaligned = run(False)
    assert aligned < 0.6 * misaligned, (aligned, misaligned)
    assert aligned < 0.01, aligned  # reprojected history ~agrees


# ---------------------------------------------------------------------------
# Level-1 (half-res) resolve mode (spec: golden temporal_resolve_l1_golden /
# render_frame_l1_temporal_golden; impl: ops/temporal.py temporal_resolve_l1
# + models/pipeline.py resolve_level=1)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("clamp", [True, False])
def test_l1_resolve_matches_golden_static(clamp):
    from tpuao.ops.temporal import temporal_resolve_l1

    h0, w0 = 96, 128
    h1, w1 = h0 // 2, w0 // 2
    ao = smooth_field(h1, w1)
    hist = smooth_field(h1, w1, seed=5)
    d = smooth_depth(h1, w1)
    pd = d * (1.0 + 0.04 * np.sin(np.arange(w1) / 5.0))
    tp = GoldenTemporalParams(history_weight=0.85, depth_tolerance=0.1,
                              neighborhood_clamp=clamp)
    jtp = TemporalParams(history_weight=0.85, depth_tolerance=0.1,
                         neighborhood_clamp=clamp)
    want = GT.temporal_resolve_l1_golden(ao, d, hist, pd, h0, w0, CAM, tp)
    got = np.asarray(temporal_resolve_l1(
        ao.astype(np.float32), d.astype(np.float32),
        hist.astype(np.float32), pd.astype(np.float32), h0, w0, JCAM, jtp))
    assert np.abs(got - want).max() <= 1e-3


@pytest.mark.parametrize("max_displacement", [4, 3, None])
def test_l1_resolve_matches_golden_motion(max_displacement):
    from tpuao.ops.temporal import temporal_resolve_l1

    h0, w0 = 96, 128
    h1, w1 = h0 // 2, w0 // 2
    motion = translation(tx=0.6, ty=-0.4, tz=1.1)
    ao = smooth_field(h1, w1)
    hist = smooth_field(h1, w1, seed=9)
    d = smooth_depth(h1, w1)
    pd = smooth_depth(h1, w1, seed=2)
    tp = GoldenTemporalParams(history_weight=0.9, depth_tolerance=0.3,
                              neighborhood_clamp=False,
                              max_displacement=max_displacement)
    jtp = TemporalParams(history_weight=0.9, depth_tolerance=0.3,
                         neighborhood_clamp=False,
                         max_displacement=max_displacement)
    want = GT.temporal_resolve_l1_golden(ao, d, hist, pd, h0, w0, CAM, tp,
                                         motion)
    got = np.asarray(temporal_resolve_l1(
        ao.astype(np.float32), d.astype(np.float32),
        hist.astype(np.float32), pd.astype(np.float32), h0, w0, JCAM, jtp,
        motion=motion.astype(np.float32)))
    # boundary masking as in test_impl_matches_golden_motion: validity is
    # the only discontinuity, in FULL-res units for the l1 mode
    ip_f, jp_f, _, _ = GT.reproject_coords_l1(d, h0, w0, CAM, motion)
    eps = 1e-3
    safe = ((np.abs(ip_f + 0.5) > eps) & (np.abs(ip_f - (h0 - 0.5)) > eps)
            & (np.abs(jp_f + 0.5) > eps) & (np.abs(jp_f - (w0 - 0.5)) > eps))
    if max_displacement is not None:
        ii = 2.0 * np.arange(h1)[:, None]
        jj = 2.0 * np.arange(w1)[None, :]
        safe &= (np.abs(np.abs(ip_f - ii) - max_displacement) > eps)
        safe &= (np.abs(np.abs(jp_f - jj) - max_displacement) > eps)
    assert np.abs(got - want)[safe].max() <= 1e-3


def test_l1_resolve_pallas_matches_xla():
    import jax

    from tpuao.ops.temporal import temporal_resolve_l1

    h0, w0 = 96, 128
    h1, w1 = h0 // 2, w0 // 2
    ao = smooth_field(h1, w1).astype(np.float32)
    hist = smooth_field(h1, w1, seed=9).astype(np.float32)
    d = smooth_depth(h1, w1).astype(np.float32)
    pd = smooth_depth(h1, w1, seed=2).astype(np.float32)
    motion = translation(tx=0.6, tz=1.1).astype(np.float32)
    jtp = TemporalParams()
    outs = {
        impl: np.asarray(jax.jit(
            lambda a, b, c, e, impl=impl: temporal_resolve_l1(
                a, b, c, e, h0, w0, JCAM, jtp, motion=motion, impl=impl)
        )(ao, d, hist, pd))
        for impl in ("auto", "pallas")
    }
    assert np.abs(outs["auto"] - outs["pallas"]).max() <= 1e-5


def test_l1_frame_matches_golden_dolly():
    """Full-frame l1 mode vs the golden l1 oracle over a real dolly
    sequence (history threading, pre-min placement, final lift, state)."""
    from tpuao.models.pipeline import render_frame_temporal
    from tpuao.utils.camera import relative_motion

    h, w, t_n = 96, 128, 3
    eyes = [(0.05 * t, 0.0, 0.04 * t) for t in range(t_n)]
    depths = [F.spheres_on_plane(h, w, n_spheres=4, seed=5, eye=e
                                 ).astype(np.float32) for e in eyes]

    def views(e):
        v = np.eye(4)
        v[0, 3], v[1, 3], v[2, 3] = -e[0], -e[1], -e[2]
        return v

    tp = GoldenTemporalParams()
    jtp = TemporalParams()
    gst, jst = None, None
    for t in range(t_n):
        motion = (relative_motion(views(eyes[t - 1]), views(eyes[t]))
                  if t > 0 else None)
        want, gst = GT.render_frame_l1_temporal_golden(
            depths[t], gst, CAM, GoldenAOParams(), tp, motion=motion)
        got, jst = render_frame_temporal(
            depths[t], jst, JCAM, AOParams(), jtp, motion=motion,
            resolve_level=1)
        assert np.abs(np.asarray(got) - want).max() <= 1e-3, t
    # state contract: half-res, (resolved, current half depth)
    assert tuple(jst[0].shape) == (h // 2, w // 2)
    assert np.abs(np.asarray(jst[0]) - gst[0]).max() <= 1e-3
    assert np.abs(np.asarray(jst[1]) - gst[1]).max() <= 1e-3


def test_l1_close_to_fullres_resolve():
    """The half-res mode is an approximation of the spec resolve -- pin
    its quality envelope on a real dolly (mean within 3e-3, max within
    0.08 of the full-res spec output)."""
    from tpuao.models.pipeline import render_frame_temporal
    from tpuao.utils.camera import relative_motion

    h, w, t_n = 96, 128, 4
    eyes = [(0.08 * t, 0.0, 0.0) for t in range(t_n)]
    depths = [F.spheres_on_plane(h, w, n_spheres=4, seed=5, eye=e
                                 ).astype(np.float32) for e in eyes]

    def views(e):
        v = np.eye(4)
        v[0, 3], v[1, 3], v[2, 3] = -e[0], -e[1], -e[2]
        return v

    jtp = TemporalParams()
    st0, st1 = None, None
    for t in range(t_n):
        motion = (relative_motion(views(eyes[t - 1]), views(eyes[t]))
                  if t > 0 else None)
        full, st0 = render_frame_temporal(depths[t], st0, JCAM, AOParams(),
                                          jtp, motion=motion)
        half, st1 = render_frame_temporal(depths[t], st1, JCAM, AOParams(),
                                          jtp, motion=motion,
                                          resolve_level=1)
    diff = np.abs(np.asarray(full) - np.asarray(half))
    assert diff.mean() <= 3e-3, diff.mean()
    assert diff.max() <= 0.08, diff.max()


def test_l1_sequence_scan_matches_stepwise():
    from tpuao.models.pipeline import (render_frame_temporal,
                                       render_sequence_temporal)

    t_n, h, w = 3, 96, 128
    depths = np.stack([np.asarray(F.spheres_on_plane(h, w, n_spheres=3,
                                                     seed=t + 1),
                                  dtype=np.float32) for t in range(t_n)])
    motions = np.broadcast_to(np.eye(4, dtype=np.float32),
                              (t_n, 4, 4)).copy()
    motions[:, 0, 3] = 0.02
    tp = TemporalParams()
    seq = np.asarray(render_sequence_temporal(
        depths, JCAM, AOParams(), tp, motions=motions, resolve_level=1))
    st = None
    for t in range(t_n):
        out, st = render_frame_temporal(
            depths[t], st, JCAM, AOParams(), tp,
            motion=motions[t] if t else None, resolve_level=1)
        assert np.abs(seq[t] - np.asarray(out)).max() <= 1e-5, t


def test_l1_state_shape_guard():
    from tpuao.models.pipeline import render_frame_temporal
    from tpuao.ops.temporal import initial_state

    z = np.asarray(F.spheres_on_plane(64, 96, n_spheres=2, seed=3),
                   dtype=np.float32)
    with pytest.raises(ValueError, match="resolve_level"):
        render_frame_temporal(z, initial_state(64, 96), JCAM, AOParams(),
                              TemporalParams(), resolve_level=1)
    with pytest.raises(ValueError, match="resolve_level"):
        render_frame_temporal(z, initial_state(32, 48), JCAM, AOParams(),
                              TemporalParams(), resolve_level=0)
    with pytest.raises(ValueError, match="resolve_level"):
        render_frame_temporal(z, None, JCAM, AOParams(), TemporalParams(),
                              resolve_level=2)


def test_l1_odd_dims_and_no_blur():
    """Odd frame dims (ceil-half state) and the enable_blur=False nearest
    lift both match the golden l1 oracle."""
    from tpuao.models.pipeline import render_frame_temporal

    for h, w, par in ((95, 130, AOParams()),
                      (96, 128, AOParams(enable_blur=False)),
                      (64, 96, AOParams(hierarchy_depth=1))):
        z = np.asarray(F.spheres_on_plane(h, w, n_spheres=3, seed=4),
                       dtype=np.float32)
        motion = translation(tx=0.3, tz=0.5)
        gp = GoldenAOParams(enable_blur=par.enable_blur,
                            hierarchy_depth=par.hierarchy_depth)
        st_g = None
        want, _ = GT.render_frame_l1_temporal_golden(
            z, st_g, CAM, gp, GoldenTemporalParams(), motion=motion)
        got, st = render_frame_temporal(z, None, JCAM, par,
                                        TemporalParams(), motion=motion,
                                        resolve_level=1)
        assert np.abs(np.asarray(got) - want).max() <= 1e-3, (h, w)
        assert tuple(st[0].shape) == (-(-h // 2), -(-w // 2)), (h, w)


def test_use_windowed_kernel_routing(monkeypatch):
    """The auto default routes the windowed resample to the Pallas kernel
    ON TPU only, size-gated: planes whose padded 2-field f32 output
    exceeds ~90 MB (full-res 8K) fall back to the XLA scan because XLA
    stack-allocates the kernel's whole output in scoped VMEM and the
    compile fails past the limit (docs/PERF.md 'Temporal resolve round
    2', r5).  Explicit impls are never backend- or size-gated."""
    import jax

    from tpuao.ops import temporal as T

    # explicit selections, any backend, any size
    assert T._use_windowed_kernel("pallas", 4320, 7680)
    assert not T._use_windowed_kernel("jnp", 96, 128)

    # auto off-TPU: always the XLA form (interpret Pallas is orders slower)
    assert jax.default_backend() != "tpu"  # conftest pins CPU
    assert not T._use_windowed_kernel("auto", 1080, 1920)

    # auto on-TPU (simulated): kernel up to the size gate, scan past it
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert T._use_windowed_kernel("auto", 1080, 1920)      # 16.6 MB out
    assert T._use_windowed_kernel("auto", 2160, 3840)      # 66 MB out
    assert not T._use_windowed_kernel("auto", 4320, 7680)  # 265 MB out


# ---------------------------------------------------------------------------
# Per-pixel motion-vector path (object motion; golden/temporal.py module
# conventions: mv[i, j] = (di, dj), current -> previous, pixel units)
# ---------------------------------------------------------------------------


def smooth_mv(h, w, r=3.0, seed=7):
    """Smooth per-pixel motion bounded by ~0.9*r pixels per axis."""
    di = (smooth_field(h, w, seed=seed) - 0.5) * 1.8 * r
    dj = (smooth_field(h, w, seed=seed + 1) - 0.5) * 1.8 * r
    return np.stack([di, dj], axis=-1)


def test_mv_zero_equals_static_golden():
    """A zero motion-vector buffer is texel-for-texel the static path:
    identity sample, expected = curr_depth, full validity."""
    h, w = 40, 56
    ao = smooth_field(h, w)
    d = smooth_depth(h, w)
    hist = smooth_field(h, w, seed=3)
    pd = d * 1.01
    tp = GoldenTemporalParams(history_weight=0.9, depth_tolerance=0.2)
    want = GT.temporal_resolve_golden(ao, d, hist, pd, CAM, tp, None)
    got = GT.temporal_resolve_golden(ao, d, hist, pd, CAM, tp,
                                     np.zeros((h, w, 2)))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_mv_zero_equals_static_ops():
    from tpuao.ops.temporal import temporal_resolve

    h, w = 40, 56
    ao = smooth_field(h, w).astype(np.float32)
    d = smooth_depth(h, w).astype(np.float32)
    hist = smooth_field(h, w, seed=3).astype(np.float32)
    pd = (d * 1.01).astype(np.float32)
    tp = TemporalParams(history_weight=0.9, depth_tolerance=0.2)
    want = np.asarray(temporal_resolve(ao, d, hist, pd, JCAM, tp, None,
                                       impl="jnp"))
    got = np.asarray(temporal_resolve(ao, d, hist, pd, JCAM, tp,
                                      np.zeros((h, w, 2), np.float32),
                                      impl="jnp"))
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("max_displacement", [4, None])
def test_mv_impl_matches_golden(max_displacement):
    from tpuao.ops.temporal import temporal_resolve

    h, w = 96, 128
    ao = smooth_field(h, w)
    hist = smooth_field(h, w, seed=9)
    d = smooth_depth(h, w)
    pd = smooth_depth(h, w, seed=2)
    mv = smooth_mv(h, w, r=3.0)
    tp = GoldenTemporalParams(history_weight=0.9, depth_tolerance=0.3,
                              neighborhood_clamp=False,
                              max_displacement=max_displacement)
    jtp = TemporalParams(history_weight=0.9, depth_tolerance=0.3,
                         neighborhood_clamp=False,
                         max_displacement=max_displacement)
    want = GT.temporal_resolve_golden(ao, d, hist, pd, CAM, tp, mv)
    got = np.asarray(temporal_resolve(
        ao.astype(np.float32), d.astype(np.float32),
        hist.astype(np.float32), pd.astype(np.float32), JCAM, jtp,
        motion=mv.astype(np.float32), impl="jnp"))
    # same validity-boundary masking as test_impl_matches_golden_motion
    ip, jp = GT.mv_coords(mv)
    eps = 1e-3
    safe = ((np.abs(ip + 0.5) > eps) & (np.abs(ip - (h - 0.5)) > eps)
            & (np.abs(jp + 0.5) > eps) & (np.abs(jp - (w - 0.5)) > eps))
    err = np.abs(got - want)[safe].max()
    assert err <= 1e-3
    assert err <= 1e-4  # measured headroom


def test_mv_channel_first_matches_channel_last():
    from tpuao.ops.temporal import temporal_resolve

    h, w = 48, 64
    ao = smooth_field(h, w).astype(np.float32)
    d = smooth_depth(h, w).astype(np.float32)
    hist = smooth_field(h, w, seed=4).astype(np.float32)
    pd = smooth_depth(h, w, seed=5).astype(np.float32)
    mv = smooth_mv(h, w).astype(np.float32)
    tp = TemporalParams(history_weight=0.85)
    a = np.asarray(temporal_resolve(ao, d, hist, pd, JCAM, tp, mv,
                                    impl="jnp"))
    b = np.asarray(temporal_resolve(ao, d, hist, pd, JCAM, tp,
                                    np.moveaxis(mv, -1, 0), impl="jnp"))
    np.testing.assert_array_equal(a, b)


def test_mv_matches_camera_equivalent_pan():
    """For an image-plane camera translation (tz=0) the reprojected eye
    depth equals the current depth, so a motion-vector buffer derived from
    the camera reprojection must resolve identically to the camera path."""
    h, w = 64, 96
    ao = smooth_field(h, w)
    d = smooth_depth(h, w)
    hist = smooth_field(h, w, seed=6)
    pd = smooth_depth(h, w, seed=7)
    mot = translation(tx=0.6, ty=-0.4)  # tz=0: z' == z
    ip, jp, _, _ = GT.reproject_coords(d, CAM, mot)
    ii = np.arange(h, dtype=np.float64)[:, None]
    jj = np.arange(w, dtype=np.float64)[None, :]
    mv = np.stack([ip - ii, jp - jj], axis=-1)
    tp = GoldenTemporalParams(history_weight=0.9, depth_tolerance=0.25)
    want = GT.temporal_resolve_golden(ao, d, hist, pd, CAM, tp, mot)
    got = GT.temporal_resolve_golden(ao, d, hist, pd, CAM, tp, mv)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_mv_pallas_parity():
    """The windowed kernel takes generic (ip, jp) planes -- the MV path
    must route through it identically (interpret mode on CPU)."""
    import jax.numpy as jnp

    from tpuao.ops.temporal import temporal_resolve

    h, w = 80, 96
    curr_ao = smooth_field(h, w, seed=8).astype(np.float32)
    curr_d = smooth_depth(h, w, seed=9).astype(np.float32)
    prev_ao = smooth_field(h, w, seed=10).astype(np.float32)
    prev_d = curr_d + 0.002
    mv = smooth_mv(h, w, r=2.5).astype(np.float32)
    tp = TemporalParams(history_weight=0.85, max_displacement=3)
    args = [jnp.asarray(a) for a in (curr_ao, curr_d, prev_ao, prev_d)]
    want = temporal_resolve(*args, JCAM, tp, motion=jnp.asarray(mv),
                            impl="jnp")
    got = temporal_resolve(*args, JCAM, tp, motion=jnp.asarray(mv),
                           impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_mv_l1_matches_golden():
    from tpuao.ops.temporal import temporal_resolve_l1

    h0, w0 = 96, 128
    h1, w1 = h0 // 2, w0 // 2
    ao1 = smooth_field(h1, w1)
    d1 = smooth_depth(h1, w1)
    hist1 = smooth_field(h1, w1, seed=11)
    pd1 = smooth_depth(h1, w1, seed=12)
    mv = smooth_mv(h0, w0, r=3.0)
    tp = GoldenTemporalParams(history_weight=0.9, depth_tolerance=0.3,
                              neighborhood_clamp=False)
    jtp = TemporalParams(history_weight=0.9, depth_tolerance=0.3,
                         neighborhood_clamp=False)
    want = GT.temporal_resolve_l1_golden(ao1, d1, hist1, pd1, h0, w0,
                                         CAM, tp, mv)
    got = np.asarray(temporal_resolve_l1(
        ao1.astype(np.float32), d1.astype(np.float32),
        hist1.astype(np.float32), pd1.astype(np.float32), h0, w0,
        JCAM, jtp, motion=mv.astype(np.float32), impl="jnp"))
    # boundary masking on the full-res validity coordinates
    mv1 = mv[::2][:, ::2]
    ip_f = mv1[..., 0] + 2.0 * np.arange(h1, dtype=np.float64)[:, None]
    jp_f = mv1[..., 1] + 2.0 * np.arange(w1, dtype=np.float64)[None, :]
    eps = 1e-3
    safe = ((np.abs(ip_f + 0.5) > eps) & (np.abs(ip_f - (h0 - 0.5)) > eps)
            & (np.abs(jp_f + 0.5) > eps) & (np.abs(jp_f - (w0 - 0.5)) > eps))
    err = np.abs(got - want)[safe].max()
    assert err <= 1e-3


def test_mv_frame_and_sequence_drivers():
    """render_frame_temporal chains with per-frame MV buffers ==
    render_sequence_temporal over the (T, H, W, 2) motion stack."""
    from tpuao.models.pipeline import (
        render_frame_temporal,
        render_sequence_temporal,
    )

    t_n, h, w = 3, 48, 64
    rng = np.random.default_rng(3)
    depths = np.stack([smooth_depth(h, w, seed=s) for s in range(t_n)])
    depths = depths.astype(np.float32)
    mvs = np.stack([smooth_mv(h, w, r=2.0, seed=20 + s)
                    for s in range(t_n)]).astype(np.float32)
    tp = TemporalParams(history_weight=0.8)
    seq = np.asarray(render_sequence_temporal(
        depths, JCAM, AOParams(), tp, motions=mvs, impl="jnp"))
    state = None
    for t in range(t_n):
        out, state = render_frame_temporal(
            depths[t], state, JCAM, AOParams(), tp,
            motion=mvs[t], impl="jnp")
        np.testing.assert_allclose(seq[t], np.asarray(out), atol=2e-6)
    del rng


def test_mv_bad_shapes_raise():
    from tpuao.models.pipeline import render_sequence_temporal
    from tpuao.ops.temporal import temporal_resolve

    h, w = 32, 40
    a = np.zeros((h, w), np.float32)
    tp = TemporalParams()
    with pytest.raises(ValueError, match="motion vectors"):
        temporal_resolve(a, a, a, a, JCAM, tp,
                         motion=np.zeros((h, w, 3), np.float32))
    with pytest.raises(ValueError, match="motions must be"):
        render_sequence_temporal(np.zeros((2, h, w), np.float32),
                                 JCAM, AOParams(), tp,
                                 motions=np.zeros((2, h, w, 3), np.float32))


@pytest.mark.slow
def test_mv_fleet_sharded_matches_per_view():
    """(V, T, H, W, 2) motion-vector fleets shard like matrix fleets."""
    from tpuao.models.pipeline import render_sequence_temporal
    from tpuao.parallel.sharding import (
        make_mesh,
        render_sequences_temporal_sharded,
    )

    v, t_n, h, w = 4, 2, 48, 64
    depths = _fleet_depths(v, t_n, h, w)
    mvs = np.stack([
        np.stack([smooth_mv(h, w, r=2.0, seed=40 + 10 * s + t)
                  for t in range(t_n)])
        for s in range(v)]).astype(np.float32)
    tp = TemporalParams(history_weight=0.8)
    out = render_sequences_temporal_sharded(
        depths, JCAM, AOParams(), tp, motions=mvs, mesh=make_mesh(4),
        impl="jnp")
    assert out.shape == (v, t_n, h, w)
    for s in range(v):
        want = np.asarray(render_sequence_temporal(
            depths[s], JCAM, AOParams(), tp, motions=mvs[s], impl="jnp"))
        np.testing.assert_allclose(np.asarray(out)[s], want, atol=2e-6)
