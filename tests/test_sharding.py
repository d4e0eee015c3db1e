"""Multi-view sharding tests on the 8-device CPU mesh (SURVEY.md SS5.5)."""

import numpy as np
import jax
import pytest

from tpuao.models.pipeline import render_frame
from tpuao.parallel.sharding import (
    VIEW_AXIS,
    make_mesh,
    render_views,
    render_views_sharded,
)
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F


@pytest.fixture(scope="module")
def views():
    return np.stack(
        [F.spheres_on_plane(64, 128, n_spheres=3, seed=s) for s in range(8)]
    ).astype(np.float32)


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.slow
def test_sharded_matches_per_frame(views):
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    mesh = make_mesh(8)
    out = render_views_sharded(views, cam, par, mesh=mesh, impl="jnp")
    assert out.shape == views.shape
    assert out.sharding.spec[0] == VIEW_AXIS
    single = np.stack(
        [np.asarray(render_frame(v, cam, par, impl="jnp")) for v in views]
    )
    np.testing.assert_allclose(np.asarray(out), single, atol=1e-6)


def test_sharded_program_has_no_collectives(views):
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(mesh, P(VIEW_AXIS, None, None))
    zd = jax.device_put(views, spec)
    fn = jax.jit(lambda d: render_views(d, cam, par, impl="jnp"),
                 out_shardings=spec)
    hlo = fn.lower(zd).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "all-to-all", "reduce-scatter"):
        assert coll not in hlo, f"unexpected collective {coll} in hot path"


@pytest.mark.slow
def test_mesh_subset(views):
    cam = CameraParams(depth_mode="linear")
    out = render_views_sharded(views[:4], cam, AOParams(),
                               mesh=make_mesh(4), impl="jnp")
    assert out.shape == (4, 64, 128)


@pytest.mark.slow
def test_uneven_views_padded_and_cropped(views):
    """9 views on an 8-device mesh (VERDICT r2 item 8): the batch is
    padded to the mesh multiple by replicating the last view and the pad
    views are dropped after the render, keeping the view sharding."""
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    nine = np.concatenate([views, views[:1]], axis=0)
    out = render_views_sharded(nine, cam, par, mesh=make_mesh(8),
                               impl="jnp")
    assert out.shape == nine.shape
    # (the RENDER ran sharded on the padded batch; the cropped uneven
    # result itself may be replicated -- see render_views_sharded caveat)
    single = np.stack(
        [np.asarray(render_frame(v, cam, par, impl="jnp")) for v in nine])
    np.testing.assert_allclose(np.asarray(out), single, atol=1e-6)
    # 3 views on the 8-chip mesh also just works
    out3 = render_views_sharded(views[:3], cam, par, mesh=make_mesh(8),
                                impl="jnp")
    np.testing.assert_allclose(np.asarray(out3), single[:3], atol=1e-6)


@pytest.mark.slow
def test_per_view_camera_rig(views):
    """per_view=True: each view renders with its OWN camera and tunables
    (the reference's one-component-per-camera rig, inexpressible with a
    shared scalar batch)."""
    import math

    n = 4
    fovs = [50.0, 60.0, 70.0, 80.0]
    strengths = [0.5, 1.0, 2.0, 4.0]
    cam_rig = CameraParams(
        depth_mode="linear",
        near=np.full(n, 0.1, np.float32),
        far=np.full(n, 100.0, np.float32),
        tan_half_fov_h=np.array(
            [math.tan(math.radians(f) / 2) for f in fovs], np.float32))
    par_rig = AOParams(strength=np.asarray(strengths, np.float32),
                       noise_filter_tolerance=np.full(n, -3.0, np.float32),
                       blur_tolerance=np.full(n, -5.0, np.float32),
                       upsample_tolerance=np.full(n, -7.0, np.float32),
                       rejection_falloff=np.full(n, 2.5, np.float32))
    out = render_views_sharded(views[:n], cam_rig, par_rig,
                               mesh=make_mesh(4), impl="jnp",
                               per_view=True)
    assert out.shape == (n, 64, 128)
    for i in range(n):
        cam_i = CameraParams(depth_mode="linear",
                             tan_half_fov_h=float(cam_rig.tan_half_fov_h[i]))
        par_i = AOParams(strength=strengths[i])
        want = np.asarray(render_frame(views[i], cam_i, par_i, impl="jnp"))
        np.testing.assert_allclose(np.asarray(out[i]), want, atol=1e-6,
                                   err_msg=f"view {i}")

    # >1 view per chip AND an uneven count: 6 views on 4 chips (pads to
    # 8, rig leaves padded alongside, cropped back)
    six = np.concatenate([views[:n], views[:2]], axis=0)
    cam6 = CameraParams(
        depth_mode="linear",
        near=np.full(6, 0.1, np.float32), far=np.full(6, 100.0, np.float32),
        tan_half_fov_h=np.asarray(
            [float(cam_rig.tan_half_fov_h[i % n]) for i in range(6)],
            np.float32))
    par6 = AOParams(
        strength=np.asarray([strengths[i % n] for i in range(6)],
                            np.float32),
        noise_filter_tolerance=np.full(6, -3.0, np.float32),
        blur_tolerance=np.full(6, -5.0, np.float32),
        upsample_tolerance=np.full(6, -7.0, np.float32),
        rejection_falloff=np.full(6, 2.5, np.float32))
    out6 = render_views_sharded(six, cam6, par6, mesh=make_mesh(4),
                                impl="jnp", per_view=True)
    for i in range(6):
        cam_i = CameraParams(depth_mode="linear",
                             tan_half_fov_h=float(cam6.tan_half_fov_h[i]))
        par_i = AOParams(strength=float(par6.strength[i]))
        want = np.asarray(render_frame(six[i], cam_i, par_i, impl="jnp"))
        np.testing.assert_allclose(np.asarray(out6[i]), want, atol=1e-6,
                                   err_msg=f"view {i}")

    # malformed rig leaves are a clear error
    with pytest.raises(ValueError, match="per_view"):
        render_views_sharded(views[:n], CameraParams(depth_mode="linear"),
                             AOParams(), mesh=make_mesh(4), impl="jnp",
                             per_view=True)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_views_exceed_devices(views):
    """16 views on the 8-device mesh: each chip lax.map's the unbatched
    program over its 2-view shard (VERDICT r1 item 3)."""
    cam = CameraParams(depth_mode="linear")
    par = AOParams()
    both = np.concatenate([views, views[::-1]], axis=0)  # 16 views
    out = render_views_sharded(both, cam, par, mesh=make_mesh(8), impl="jnp")
    assert out.shape == both.shape
    assert out.sharding.spec[0] == VIEW_AXIS
    single = np.stack(
        [np.asarray(render_frame(v, cam, par, impl="jnp")) for v in both])
    np.testing.assert_allclose(np.asarray(out), single, atol=1e-6)


@pytest.mark.slow
def test_sharded_views_exceed_devices_normals(views):
    cam = CameraParams(depth_mode="linear")
    par = AOParams(use_normals=True)
    zs, ns = zip(*[F.spheres_on_plane(64, 128, n_spheres=3, seed=s,
                                      with_normals=True) for s in range(16)])
    zs = np.stack(zs).astype(np.float32)
    ns = np.stack(ns).astype(np.float32)
    out = render_views_sharded(zs, cam, par, normals=ns, mesh=make_mesh(8),
                               impl="jnp")
    assert out.shape == zs.shape
    single = np.stack(
        [np.asarray(render_frame(z, cam, par, normals=n, impl="jnp"))
         for z, n in zip(zs, ns)])
    np.testing.assert_allclose(np.asarray(out), single, atol=1e-6)


@pytest.mark.slow
def test_sharded_no_retrace_on_tunable_change():
    """Parallel modes share the engine's no-recompile contract: tunable
    changes and repeat calls reuse the cached compiled program
    (previously every call rebuilt closures and retraced)."""
    import tpuao.parallel.sharding as S
    from tpuao.utils import fixtures as F

    z = np.stack([F.spheres_on_plane(64, 128, n_spheres=2, seed=s)
                  for s in (0, 1)]).astype(np.float32)
    mesh = S.make_mesh(2)
    cam = CameraParams(depth_mode="linear")
    S.render_views_sharded(z, cam, AOParams(), mesh=mesh, impl="jnp")
    # exact positional arity matters: lru_cache keys omitted defaults
    # differently from explicitly-passed ones
    jit_obj = S._sharded_jit(mesh, False, "jnp", 64 * 128, 0, "float32",
                             False, False)
    n0 = jit_obj._cache_size()
    assert n0 >= 1
    for s in (1.5, 3.0):
        S.render_views_sharded(z, cam, AOParams(strength=s), mesh=mesh,
                               impl="jnp")
    assert jit_obj._cache_size() == n0
