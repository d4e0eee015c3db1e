"""Per-op JAX implementations vs the golden NumPy spec (SURVEY.md SS5.2).

Golden runs in float64, ops in float32; per-op agreement must be well inside
the 1e-3 pipeline budget ([BJ] metric) -- we assert 1e-5 per op.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuao.golden import reference as G
from tpuao.ops import prepare as P
from tpuao.ops import render as R
from tpuao.ops import upsample as U
from tpuao.params import (
    AOParams,
    CameraParams,
    GoldenAOParams,
    GoldenCameraParams,
    upsample_constants,
)
from tpuao.utils import fixtures as F

TOL = 1e-5
H, W = 96, 128


def _depth(rng, h=H, w=W):
    z = F.spheres_on_plane(h, w, n_spheres=4, seed=3)
    return z + rng.uniform(-1e-3, 1e-3, size=z.shape)  # break exact ties


def test_linearize_matches(rng):
    cam_j = CameraParams()
    cam_g = GoldenCameraParams()
    d = rng.uniform(0.0, 1.0, size=(H, W))
    got = np.asarray(P.linearize_depth(jnp.asarray(d, jnp.float32), cam_j))
    want = G.linearize_depth(d, cam_g)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_pyramid_matches(rng):
    z = _depth(rng)
    pyr_j = P.build_pyramid(jnp.asarray(z, jnp.float32), 4)
    pyr_g = G.build_pyramid(z, 4)
    for a, b in zip(pyr_j, pyr_g):
        np.testing.assert_allclose(np.asarray(a), b, atol=TOL)


def test_pad_parity4_matches(rng):
    z = _depth(rng, 32, 48)
    got = np.asarray(P.pad_parity4(jnp.asarray(z, jnp.float32), 16))
    want = G.pad_parity4(z, 16)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_deinterleave_roundtrip(rng):
    z = jnp.asarray(_depth(rng, 64, 64), jnp.float32)
    s = P.deinterleave_4x4(z)
    assert s.shape == (16, 16, 16)
    back = P.interleave_4x4(s)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(z))
    # slice s = 4*i + j holds pixels (row%4==i, col%4==j)
    np.testing.assert_array_equal(np.asarray(s[4 * 1 + 2]),
                                  np.asarray(z)[1::4, 2::4])


def test_deinterleave_batched(rng):
    z = jnp.asarray(rng.uniform(size=(3, 32, 32)), jnp.float32)
    s = P.deinterleave_4x4(z)
    assert s.shape == (3, 16, 8, 8)
    back = P.interleave_4x4(s)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(z))


def test_render_level_matches_golden(rng):
    z = _depth(rng)
    for level in (1, 2):
        ds_g = z
        for _ in range(level):
            ds_g = G.downsample2x(ds_g)
        for exhaustive in (True, False):
            par_j = AOParams(exhaustive=exhaustive)
            par_g = GoldenAOParams(exhaustive=exhaustive)
            got = np.asarray(
                jax.jit(R.render_ao_level, static_argnums=(1, 2))(
                    jnp.asarray(ds_g, jnp.float32), level, W,
                    CameraParams(), par_j)
            )
            want = G.render_ao_level(ds_g, level, W, GoldenCameraParams(),
                                     par_g)
            np.testing.assert_allclose(got, want, atol=TOL)


def test_render_level_normals_matches_golden(rng):
    z, n = F.spheres_on_plane(H, W, n_spheres=4, seed=9, with_normals=True)
    ds = G.downsample2x(z)
    nds = n[0::2, 0::2, :]
    par_j = AOParams(use_normals=True)
    par_g = GoldenAOParams(use_normals=True)
    got = np.asarray(
        jax.jit(R.render_ao_level, static_argnums=(1, 2))(
            jnp.asarray(ds, jnp.float32), 1, W, CameraParams(),
            par_j, jnp.asarray(nds, jnp.float32))
    )
    want = G.render_ao_level(ds, 1, W, GoldenCameraParams(), par_g, nds)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_noise_filter_matches(rng):
    d = rng.uniform(0.2, 0.8, size=(24, 32))
    a = rng.uniform(0.0, 1.0, size=(24, 32))
    got = np.asarray(
        U.noise_filter(jnp.asarray(a, jnp.float32),
                       jnp.asarray(d, jnp.float32), 1000.0)
    )
    want = G.noise_filter(a, d, 1000.0)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_bilateral_upsample_matches(rng):
    lo_d = rng.uniform(0.2, 0.8, size=(16, 24))
    hi_d = np.repeat(np.repeat(lo_d, 2, 0), 2, 1)
    hi_d += rng.uniform(-0.01, 0.01, size=hi_d.shape)
    lo = rng.uniform(0.0, 1.0, size=(16, 24))
    got = np.asarray(
        U.bilateral_upsample2x(
            jnp.asarray(lo, jnp.float32), jnp.asarray(lo_d, jnp.float32),
            jnp.asarray(hi_d, jnp.float32), 0.99, 1e-7)
    )
    want = G.bilateral_upsample2x(lo, lo_d, hi_d, 0.99, 1e-7)
    np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


def test_blur_upsample_step_matches(rng):
    lo_d = rng.uniform(0.2, 0.8, size=(16, 24))
    hi_d = np.repeat(np.repeat(lo_d, 2, 0), 2, 1)
    lo1 = rng.uniform(size=(16, 24))
    lo2 = rng.uniform(size=(16, 24))
    par_j, par_g = AOParams(), GoldenAOParams()
    got = np.asarray(
        U.blur_upsample_step(
            jnp.asarray(lo1, jnp.float32), jnp.asarray(lo_d, jnp.float32),
            jnp.asarray(hi_d, jnp.float32), par_j, 192,
            lo_ao2=jnp.asarray(lo2, jnp.float32))
    )
    want = G.blur_upsample_step(lo1, lo_d, hi_d, par_g, 192, lo_ao2=lo2)
    np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


def test_blur_upsample_step_hi_planes_identical(rng):
    """Feeding precomputed hi-depth parity planes must be bit-identical
    to the in-step slicing (the plane-pyramid experiment's contract)."""
    lo_d = rng.uniform(0.2, 0.8, size=(16, 24))
    hi_d = rng.uniform(0.2, 0.8, size=(32, 48))
    lo1 = rng.uniform(size=(16, 24))
    par = AOParams()
    args = (jnp.asarray(lo1, jnp.float32), jnp.asarray(lo_d, jnp.float32),
            jnp.asarray(hi_d, jnp.float32), par, 192)
    base = np.asarray(U.blur_upsample_step(*args))
    hj = jnp.asarray(hi_d, jnp.float32)
    planes = tuple(hj[p::2, :][:, q::2] for p in (0, 1) for q in (0, 1))
    fed = np.asarray(U.blur_upsample_step(*args, hi_planes=planes))
    np.testing.assert_array_equal(base, fed)


@pytest.mark.slow
def test_chain_step_banded_bit_exact(rng):
    """The unrolled row-band chain step (tested variant, not wired --
    see its docstring) is bit-equal to the whole-field form, including
    uneven last bands and the hi_ao_blend variant."""
    from tpuao.params import upsample_constants

    lo_d = rng.uniform(0.2, 0.8, size=(22, 24))
    hi_d = np.repeat(np.repeat(lo_d, 2, 0), 2, 1) \
        + rng.normal(scale=1e-3, size=(44, 48))
    lo1 = rng.uniform(size=(22, 24))
    hi_blend = rng.uniform(size=(44, 48))
    par = AOParams()
    for blend in (None, hi_blend):
        bl = None if blend is None else jnp.asarray(blend, jnp.float32)
        want = np.asarray(U.blur_upsample_step(
            jnp.asarray(lo1, jnp.float32), jnp.asarray(lo_d, jnp.float32),
            jnp.asarray(hi_d, jnp.float32), par, 192, hi_ao_blend=bl))
        _, k_blur, k_up, nfs = upsample_constants(par, 192, 24)
        ap = jnp.pad(jnp.asarray(lo1, jnp.float32), [(0, 1), (0, 1)],
                     mode="edge")
        dp = jnp.pad(jnp.asarray(lo_d, jnp.float32), [(0, 1), (0, 1)],
                     mode="edge")
        for band_rows in (8, 16, 22):  # uneven last band, single band
            got = np.asarray(U._chain_step_banded(
                ap, dp, jnp.asarray(hi_d, jnp.float32), k_blur, k_up, nfs,
                bl, band_rows=band_rows))
            np.testing.assert_array_equal(got, want)


def test_upsample_constants_traced_vs_float():
    par_j, par_g = AOParams(), GoldenAOParams()
    a = upsample_constants(par_g, 1920, 120)
    b = upsample_constants(par_j, 1920, 120)
    for x, y in zip(a, b):
        np.testing.assert_allclose(float(np.asarray(y)), x, rtol=1e-6)


def test_interleave2x2_variants_agree(rng):
    from tpuao.ops.upsample import interleave2x2, interleave2x2_padded

    ps = [jnp.asarray(rng.uniform(size=(16, 24)), jnp.float32)
          for _ in range(4)]
    a = np.asarray(interleave2x2(*ps))
    b = np.asarray(interleave2x2_padded(*ps))
    np.testing.assert_array_equal(a, b)
    # spot-check the parity mapping: out[2i+p, 2j+q] == plane_{pq}[i, j]
    assert a[3, 4] == np.asarray(ps[2])[1, 2]  # p=1,q=0
    assert a[2, 5] == np.asarray(ps[1])[1, 2]  # p=0,q=1
