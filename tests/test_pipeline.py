"""Full-pipeline tests: jnp pipeline vs golden, jit/vmap behavior, engine API
(SURVEY.md SS5.3-5.4), and the no-recompile-on-tunable-change contract
(SURVEY.md SS4.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpuao
from tpuao.golden import reference as G
from tpuao.models.pipeline import (
    AmbientOcclusionEngine,
    render_frame,
    single_scale_ao,
)
from tpuao.params import (
    AOParams,
    CameraParams,
    GoldenAOParams,
    GoldenCameraParams,
)
from tpuao.utils import fixtures as F

TOL = 1e-4  # full-chain f32 vs f64; budget is 1e-3 ([BJ])


def _scene(h=128, w=192, **kw):
    return F.spheres_on_plane(h, w, n_spheres=4, seed=3, **kw)


def test_full_pipeline_matches_golden():
    z = _scene()
    cam_j = CameraParams(depth_mode="linear")
    cam_g = GoldenCameraParams(depth_mode="linear")
    got = np.asarray(render_frame(z, cam_j, AOParams(), impl="jnp"))
    want = G.render_frame_golden(z, cam_g, GoldenAOParams())
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=TOL)


def test_full_pipeline_hardware_depth_matches_golden():
    z = _scene()
    cam_g = GoldenCameraParams(depth_mode="hardware")
    d = F.to_hardware_depth(z, cam_g)
    got = np.asarray(render_frame(d, CameraParams(), AOParams(), impl="jnp"))
    want = G.render_frame_golden(d, cam_g, GoldenAOParams())
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.slow
def test_pipeline_normals_matches_golden():
    z, n = _scene(with_normals=True)
    cam_j = CameraParams(depth_mode="linear")
    cam_g = GoldenCameraParams(depth_mode="linear")
    got = np.asarray(
        render_frame(z, cam_j, AOParams(use_normals=True), normals=n,
                     impl="jnp"))
    want = G.render_frame_golden(z, cam_g, GoldenAOParams(use_normals=True),
                                 normals=n)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_pipeline_odd_resolution():
    z = _scene(100, 150)
    got = np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                  AOParams(), impl="jnp"))
    want = G.render_frame_golden(z, GoldenCameraParams(depth_mode="linear"),
                                 GoldenAOParams())
    assert got.shape == (100, 150)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_single_scale_ao_config1():
    z = _scene()
    ao = np.asarray(single_scale_ao(z, CameraParams(depth_mode="linear")))
    assert ao.shape == (64, 96)
    want = G.render_ao_level(
        G.downsample2x(z), 1, 192, GoldenCameraParams(depth_mode="linear"),
        GoldenAOParams())
    np.testing.assert_allclose(ao, want, atol=TOL)


@pytest.mark.slow
def test_vmap_equals_stack():
    zs = np.stack([_scene(64, 64), F.corner(64, 64), F.flat_plane(64, 64)])
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    f = lambda z: render_frame(z, cam, par, impl="jnp")
    batched = np.asarray(
        jax.vmap(lambda z: tpuao.models.pipeline.ao_pipeline(
            z, cam, par, impl="jnp")[0])(jnp.asarray(zs, jnp.float32)))
    single = np.stack([np.asarray(f(z)) for z in zs])
    np.testing.assert_allclose(batched, single, atol=1e-6)


@pytest.mark.slow
def test_no_recompile_on_tunable_change():
    z = jnp.asarray(_scene(64, 64), jnp.float32)
    cam = CameraParams(depth_mode="linear")
    traces = 0

    def pipeline(depth, camera, params):
        nonlocal traces
        traces += 1
        return tpuao.models.pipeline.ao_pipeline(depth, camera, params,
                                                 impl="jnp")[0]

    jf = jax.jit(pipeline)
    jf(z, cam, AOParams()).block_until_ready()
    assert traces == 1
    jf(z, cam, AOParams(strength=2.0, rejection_falloff=5.0,
                        blur_tolerance=-2.0)).block_until_ready()
    assert traces == 1  # tunables are traced scalars: same program
    jf(z, cam, AOParams(hierarchy_depth=2)).block_until_ready()
    assert traces == 2  # static structure change recompiles


def test_engine_api():
    z = _scene(64, 64)
    eng = AmbientOcclusionEngine(CameraParams(depth_mode="linear"),
                                 impl="jnp")
    ao = np.asarray(eng.render(z))
    assert ao.shape == (64, 64)
    # OnValidate analog
    with pytest.raises(ValueError):
        eng.strength = 99.0
    eng.strength = 2.0
    ao2 = np.asarray(eng.render(z))
    assert ao2.mean() <= ao.mean() + 1e-6
    # composite + debug view
    color = np.ones((64, 64, 3), np.float32)
    lit = np.asarray(eng.render(z, color=color))
    np.testing.assert_allclose(lit[..., 0], ao2, atol=1e-6)
    eng.debug = True
    dbg = np.asarray(eng.render(z, color=color))
    np.testing.assert_allclose(dbg[..., 1], ao2, atol=1e-6)


def test_composite_integer_color():
    """Integer color frames must be AO-modulated, not blacked out by
    casting AO in [0,1) to the integer dtype before the multiply."""
    from tpuao.ops.composite import composite

    z = _scene(64, 64)
    ao = np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                 AOParams(), impl="jnp"))
    color = np.full((64, 64, 3), 200, np.uint8)
    lit = np.asarray(composite(jnp.asarray(color), jnp.asarray(ao)))
    assert lit.dtype == np.uint8
    np.testing.assert_allclose(
        lit[..., 0].astype(np.float64),
        np.round(200.0 * ao), atol=1.0)
    assert lit[..., 0].mean() > 100  # not blacked out


@pytest.mark.slow
def test_engine_multichip_entries():
    """The engine's render_views / render_spatial / render_sections carry
    its camera/params/out_dtype into the parallel modes."""
    from tpuao.parallel.sharding import make_mesh
    from tpuao.parallel.spatial import make_row_mesh
    from tpuao.params import AOParams

    cam = CameraParams(depth_mode="linear")
    par = AOParams(hierarchy_depth=2, strength=2.0)
    eng = AmbientOcclusionEngine(cam, par, impl="jnp")

    zs = np.stack([_scene(64, 128) for _ in range(2)])
    out_v = np.asarray(eng.render_views(zs, mesh=make_mesh(2)))
    want = np.stack([np.asarray(eng.render(z)) for z in zs])
    np.testing.assert_allclose(out_v, want, atol=1e-6)

    z = _scene(256, 128)
    out_s = np.asarray(eng.render_spatial(z, mesh=make_row_mesh(2)))
    assert out_s.shape == z.shape  # padded-frame edge semantics at edges

    out_k = np.asarray(eng.render_sections(z, n_sections=2))
    np.testing.assert_allclose(out_k, np.asarray(eng.render(z)), atol=2e-6)


def test_engine_debug_grayscale_and_out_dtype():
    """Debug mode must not read a 2-D grayscale frame's width as a channel
    count, and must honor out_dtype and debug_outputs."""
    z = _scene(64, 64)
    eng = AmbientOcclusionEngine(CameraParams(depth_mode="linear"),
                                 impl="jnp", debug=True, out_dtype="uint8")
    gray = np.ones((64, 64), np.float32)
    view = np.asarray(eng.render(z, color=gray))
    assert view.shape == (64, 64, 1) and view.dtype == np.uint8
    color = np.ones((64, 64, 3), np.float32)
    view3, dbg = eng.render(z, color=color, debug_outputs=True)
    assert np.asarray(view3).shape == (64, 64, 3)
    assert set(dbg["ao_levels"]) == {1, 2, 3, 4}


def test_single_scale_odd_input_ceil_crop():
    """Odd inputs keep their last real half-res scanline (ceil, matching
    pick-one downsampling), not floor."""
    z = _scene(65, 97)
    ao = np.asarray(single_scale_ao(z, CameraParams(depth_mode="linear")))
    assert ao.shape == (33, 49)


@pytest.mark.slow
def test_k_blur_zero_tolerance_no_nan():
    """blur_tolerance = log10(1/step_size) makes the un-floored k_blur
    exactly 0; the corner-aligned taps then hit 0/0 (regression: whole
    frame NaN).  Valid in-range setting -> finite frame."""
    z = _scene(64, 96)
    bt = float(np.log10(1.0 / 16.0))  # step_size 16 at the coarsest level
    par = AOParams(blur_tolerance=bt).validate()
    ao = np.asarray(render_frame(z, CameraParams(depth_mode="linear"), par,
                                 impl="jnp"))
    assert np.isfinite(ao).all()
    assert 0.0 <= ao.min() and ao.max() <= 1.0


def test_validate_rejects_numpy_scalars():
    with pytest.raises(ValueError):
        AOParams(strength=np.float32(50.0)).validate()
    AOParams(strength=np.float32(2.0)).validate()  # in-range passes


def test_camera_validate():
    """Degenerate projections fail loudly (zmagic = (far-near)/near and
    1/tan_half_fov_h blow up); defaults and traced values pass."""
    CameraParams().validate()
    CameraParams(depth_mode="linear").validate()
    for bad in (dict(near=0.0), dict(near=-1.0), dict(far=0.05),
                dict(tan_half_fov_h=0.0), dict(tan_half_fov_h=-2.0),
                dict(depth_mode="exp")):
        with pytest.raises(ValueError):
            CameraParams(**bad).validate()
    # traced scalars pass through (tunables ride as jit leaves)
    import jax

    jax.jit(lambda c: c.validate().near)(CameraParams(near=0.2))


def test_debug_outputs():
    z = _scene(64, 64)
    ao, dbg = render_frame(z, CameraParams(depth_mode="linear"), AOParams(),
                           debug_outputs=True, impl="jnp")
    assert set(dbg["ao_levels"]) == {1, 2, 3, 4}
    assert dbg["linear_z"].shape == (64, 64)
    assert dbg["combined_0"].shape == (64, 64)


def test_blendout_wiring_identical():
    # The PreMin and BlendOut upsample variants compose to the SAME chain
    # (the min migrates across the step boundary); the reference's two
    # kernels are alternative fusions of one computation.  Verify on a
    # worst-case noise field where the min binds aggressively.
    rng = np.random.default_rng(0)
    z = rng.uniform(0.1, 0.9, (128, 192))
    par = GoldenAOParams()
    cam = GoldenCameraParams(depth_mode="linear")
    pyr = G.build_pyramid(z, 4)
    aos = {l: G.render_ao_level(pyr[l], l, 192, cam, par)
           for l in range(1, 5)}
    premin = aos[4]
    for l in range(4, 0, -1):
        premin = G.blur_upsample_step(
            premin, pyr[l], pyr[l - 1], par, 192,
            lo_ao2=aos[l] if l != 4 else None)
    blend = aos[4]
    for l in range(4, 0, -1):
        blend = G.blur_upsample_step(
            blend, pyr[l], pyr[l - 1], par, 192,
            hi_ao_blend=aos.get(l - 1))
    np.testing.assert_array_equal(premin, blend)
    # sanity: the min does bind (both differ from the no-min chain)
    plain = aos[4]
    for l in range(4, 0, -1):
        plain = G.blur_upsample_step(plain, pyr[l], pyr[l - 1], par, 192)
    assert np.abs(plain - premin).max() > 0.1


@pytest.mark.slow
def test_param_fuzz_matches_golden():
    # random tunables across their full ranges: jnp pipeline must track the
    # golden spec everywhere, not just at defaults (SURVEY.md SS5.4)
    from tpuao.params import PARAM_RANGES, to_golden

    rng = np.random.default_rng(99)
    z = _scene(96, 128)
    cam_j = CameraParams(depth_mode="linear")
    for trial in range(6):
        kw = {name: float(rng.uniform(lo, hi))
              for name, (lo, hi) in PARAM_RANGES.items()}
        par = AOParams(
            hierarchy_depth=int(rng.integers(1, 5)),
            exhaustive=bool(rng.integers(0, 2)),
            **kw).validate()
        gp, gc = to_golden(par, cam_j)
        got = np.asarray(render_frame(z, cam_j, par, impl="jnp"))
        want = G.render_frame_golden(z, gc, gp)
        assert np.all((got >= 0) & (got <= 1))
        np.testing.assert_allclose(got, want, atol=5e-4,
                                   err_msg=str(par))


@pytest.mark.slow
def test_shape_param_fuzz_matches_golden():
    """Randomized differential matrix: random ODD shapes x hierarchy
    depth x normals x tunable extremes, jnp vs golden (extends the
    fixed-shape fuzz above with the pad/crop axis)."""
    from tpuao.params import PARAM_RANGES, to_golden

    rng = np.random.default_rng(7)
    cam_j = CameraParams(depth_mode="linear")
    for trial in range(5):
        h = int(rng.integers(49, 200))
        w = int(rng.integers(49, 260))
        use_n = bool(rng.integers(0, 2))
        z, n = F.spheres_on_plane(h, w, n_spheres=3, seed=trial,
                                  with_normals=True)
        kw = {name: float(rng.uniform(lo, hi))
              for name, (lo, hi) in PARAM_RANGES.items()}
        par = AOParams(hierarchy_depth=int(rng.integers(1, 5)),
                       exhaustive=bool(rng.integers(0, 2)),
                       use_normals=use_n, **kw).validate()
        gp, gc = to_golden(par, cam_j)
        got = np.asarray(render_frame(z, cam_j, par,
                                      normals=n if use_n else None,
                                      impl="jnp"))
        want = G.render_frame_golden(z, gc, gp,
                                     normals=n if use_n else None)
        assert got.shape == (h, w), (h, w)
        assert np.all((got >= 0) & (got <= 1))
        np.testing.assert_allclose(
            got, want, atol=5e-4, err_msg=f"{h}x{w} {par}")


@pytest.mark.slow
def test_pipeline_on_image_depth(tmp_path):
    # SURVEY.md SS5.3: procedural depth from an image file
    from tpuao.utils.io import load_depth_image, save_ao_image

    rng = np.random.default_rng(5)
    img = (rng.uniform(0.2, 0.9, (80, 120)) * 255).astype(np.uint8)
    from PIL import Image

    p = str(tmp_path / "d.png")
    Image.fromarray(img).save(p)
    z = load_depth_image(p)
    ao = np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                 AOParams(), impl="jnp"))
    assert ao.shape == z.shape
    save_ao_image(ao, str(tmp_path / "ao.png"))


@pytest.mark.slow
def test_low_precision_depth_inputs():
    # f16/bf16 depth buffers are accepted and cast up to f32
    import jax.numpy as jnp

    z = _scene(64, 64).astype(np.float32)
    ref = np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                  AOParams(), impl="jnp"))
    for dt in (jnp.bfloat16, jnp.float16):
        ao = np.asarray(render_frame(jnp.asarray(z, dt),
                                     CameraParams(depth_mode="linear"),
                                     AOParams(), impl="jnp"))
        assert ao.dtype == np.float32
        assert np.abs(ao - ref).max() < 0.05  # input quantization only


def test_enable_blur_false():
    """Values, not just shape: the no-blur path must equal a nearest 2x
    upsample of the level-1 golden AO, for even AND odd target sizes
    (the even path crops in plane space, odd post-crops)."""
    from tpuao.params import to_golden

    cam = CameraParams(depth_mode="linear")
    par = AOParams(enable_blur=False, hierarchy_depth=1)
    gp, gc = to_golden(par, cam)
    for h, w in ((64, 64), (51, 77)):
        z = _scene(h, w)
        ao = np.asarray(render_frame(z, cam, par, impl="jnp"))
        assert ao.shape == (h, w)
        from tpuao.params import padded_shape
        hp, wp = padded_shape(h, w)
        zpad = np.pad(z, [(0, hp - h), (0, wp - w)], mode="edge")
        lvl1 = G.render_ao_level(G.downsample2x(zpad), 1, wp, gc, gp)
        want = np.repeat(np.repeat(lvl1, 2, 0), 2, 1)[:h, :w]
        np.testing.assert_allclose(ao, want, atol=1e-5,
                                   err_msg=f"{h}x{w}")


@pytest.mark.slow
def test_batched_frames_all_impls():
    """A leading batch of frames works for every impl (ADVICE r1: the
    Pallas/fused paths used to crash on 3-D input)."""
    zs = np.stack([_scene(64, 128), _scene(64, 128)]).astype(np.float32)
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    want = np.stack(
        [np.asarray(render_frame(z, cam, par, impl="jnp")) for z in zs])
    for impl in ("jnp", "pallas", "fused"):
        got = np.asarray(render_frame(zs, cam, par, impl=impl))
        assert got.shape == zs.shape, (impl, got.shape)
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=impl)


def test_single_scale_ao_jit_cached():
    """Repeat single_scale_ao calls reuse one compiled program (ADVICE r1:
    a per-call closure used to retrace on every invocation)."""
    from tpuao.models.pipeline import _single_scale_jit

    z = jnp.asarray(_scene(64, 128), jnp.float32)
    cam = CameraParams(depth_mode="linear")
    single_scale_ao(z, cam)
    n0 = _single_scale_jit._cache_size()
    for s in (0.5, 1.0, 2.0):
        single_scale_ao(z, cam, AOParams(strength=s))
    assert _single_scale_jit._cache_size() == n0


@pytest.mark.slow
def test_full_res_720p_matches_golden():
    """VERDICT r1 item 5 / SURVEY.md SS5.3: a full 720p frame through the
    real pipeline vs the golden, in pytest (CPU) rather than only in the
    TPU bench.  720p pads 720->768, exercising the pad+crop path no small
    pytest shape hits."""
    z = F.spheres_on_plane(720, 1280, n_spheres=6, seed=11)
    cam_j = CameraParams(depth_mode="linear")
    cam_g = GoldenCameraParams(depth_mode="linear")
    got = np.asarray(render_frame(jnp.asarray(z, jnp.float32), cam_j,
                                  AOParams(), impl="jnp"), np.float64)
    want = G.render_frame_golden(z, cam_g, GoldenAOParams())
    assert got.shape == (720, 1280)
    assert np.abs(got - want).max() <= 1e-3  # [BJ] budget; expect ~1e-5


@pytest.mark.slow
def test_out_dtype_formats():
    """R8 render-texture analog (SURVEY SS3.0 RT inventory): uint8 output
    is exactly round(ao_f32 * 255); bfloat16 is the f32 result cast."""
    import jax.numpy as jnp

    z = F.spheres_on_plane(96, 128, n_spheres=3, seed=2)
    cam = CameraParams(depth_mode="linear")
    f32 = np.asarray(render_frame(z, cam, AOParams()))
    u8 = np.asarray(render_frame(z, cam, AOParams(), out_dtype="uint8"))
    assert u8.dtype == np.uint8
    want = (np.clip(f32, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(u8, want)
    bf = render_frame(z, cam, AOParams(), out_dtype="bfloat16")
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(bf, np.float32), f32, atol=4e-3)
    with pytest.raises(ValueError, match="out_dtype"):
        render_frame(z, cam, AOParams(), out_dtype="int32")


def test_engine_out_dtype():
    z = F.spheres_on_plane(96, 128, n_spheres=3, seed=2)
    from tpuao.models.pipeline import AmbientOcclusionEngine

    eng = AmbientOcclusionEngine(CameraParams(depth_mode="linear"),
                                 out_dtype="uint8")
    out = np.asarray(eng.render(z))
    assert out.dtype == np.uint8 and out.shape == (96, 128)


@pytest.mark.slow
def test_banded_render_variant():
    """Row-banded render variant (investigated for 8K; kept tested, not
    wired into auto -- see pipeline render loop NOTE): agrees with the
    whole-level program to <=1 ULP (FMA-contraction differences)."""
    from tpuao.ops import render as R
    from tpuao.ops.prepare import linearize_depth, build_pyramid
    import jax.numpy as jnp

    cam = CameraParams(depth_mode="linear")
    z, n = F.spheres_on_plane(192, 256, n_spheres=4, seed=5,
                              with_normals=True)
    ds1 = build_pyramid(linearize_depth(jnp.asarray(z, jnp.float32), cam),
                        1)[1]
    par = AOParams()
    want = np.asarray(R.render_ao_level(ds1, 1, 256, cam, par))
    for band in (32, 40, 96):  # includes a non-dividing band size
        got = np.asarray(R.render_ao_level_banded(ds1, 1, 256, cam, par,
                                                  band_rows=band))
        np.testing.assert_allclose(got, want, atol=1e-6)
    # slopes variant
    pn = AOParams(use_normals=True)
    gx, gy = R.slope_planes(jnp.asarray(n, jnp.float32),
                            cam.tan_half_fov_h, 256)
    sl = (gx[0::2][:, 0::2], gy[0::2][:, 0::2])
    want_n = np.asarray(R.render_ao_level(ds1, 1, 256, cam, pn,
                                          slopes_ds=sl))
    got_n = np.asarray(R.render_ao_level_banded(ds1, 1, 256, cam, pn,
                                                slopes_ds=sl, band_rows=40))
    np.testing.assert_allclose(got_n, want_n, atol=1e-6)


def test_normals_channel_first_abi_matches_channel_last():
    """(3, H, W) channel-first normals (the preferred large-frame device
    ABI: major-dim channel slices are free views, minor-dim-3 slices are
    relayout copies on TPU) produce the identical frame."""
    from tpuao.models.pipeline import render_frame
    from tpuao.ops.render import slope_planes
    from tpuao.params import AOParams, CameraParams
    from tpuao.utils import fixtures as F

    cam = CameraParams(depth_mode="linear")
    z, nrm = F.spheres_on_plane(96, 128, cam, n_spheres=3, seed=6,
                                with_normals=True)
    z = z.astype(np.float32)
    cl = nrm.astype(np.float32)               # (H, W, 3)
    cf = np.ascontiguousarray(np.moveaxis(cl, -1, 0))  # (3, H, W)
    gx_cl, gy_cl = slope_planes(jnp.asarray(cl), 1.0, 128)
    gx_cf, gy_cf = slope_planes(jnp.asarray(cf), 1.0, 128)
    np.testing.assert_array_equal(np.asarray(gx_cl), np.asarray(gx_cf))
    np.testing.assert_array_equal(np.asarray(gy_cl), np.asarray(gy_cf))
    par = AOParams(use_normals=True)
    a = np.asarray(render_frame(z, cam, par, normals=cl))
    b = np.asarray(render_frame(z, cam, par, normals=cf))
    np.testing.assert_array_equal(a, b)
