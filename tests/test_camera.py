"""Projection-matrix camera extraction tests (utils/camera.py): the
reference's ZMagic-from-projectionMatrix path (SURVEY.md SS3.1)."""

import numpy as np
import pytest

from tpuao.ops.prepare import linearize_depth
from tpuao.utils.camera import (camera_from_projection, hardware_depth,
                                perspective_projection)


@pytest.mark.parametrize("reversed_z", [True, False])
def test_roundtrip(reversed_z):
    p = perspective_projection(0.3, 250.0, 0.7, aspect=2.0,
                               reversed_z=reversed_z)
    cam = camera_from_projection(p)
    assert cam.reversed_z is reversed_z
    assert cam.near == pytest.approx(0.3)
    assert cam.far == pytest.approx(250.0)
    assert cam.tan_half_fov_h == pytest.approx(0.7)


def test_linearize_inverts_matrix_depth():
    """hardware depth produced by the matrix, linearized with the extracted
    CameraParams, must give back z_eye/far — the whole point of the API."""
    import jax.numpy as jnp

    for reversed_z in (True, False):
        p = perspective_projection(0.1, 100.0, 0.6, reversed_z=reversed_z)
        cam = camera_from_projection(p)
        z_eye = np.linspace(0.1, 100.0, 257)
        d_hw = hardware_depth(z_eye, p)
        assert d_hw.min() >= -1e-12 and d_hw.max() <= 1 + 1e-12
        linz = np.asarray(linearize_depth(jnp.asarray(d_hw, jnp.float32),
                                          cam))
        # standard-Z loses precision near the far plane in f32 (1 - d
        # cancellation -- the reason reversed-Z is the default everywhere)
        atol = 1e-6 if reversed_z else 1e-4
        np.testing.assert_allclose(linz, z_eye / 100.0, atol=atol)


def test_transposed_matrix_accepted():
    p = perspective_projection(0.5, 50.0, 0.9)
    cam = camera_from_projection(p.T)
    assert cam.far == pytest.approx(50.0)


def test_b_equals_one_not_ambiguous():
    """near*far == far-near makes B == 1.0, so BOTH P[2,3] and P[3,2] are
    1.0 — the two orientation readings agree and extraction must succeed
    (regression: this used to raise 'unrecognized convention')."""
    p = perspective_projection(0.5, 1.0, 0.7)  # B = 0.5*1.0/0.5 = 1.0
    assert p[2, 3] == 1.0 and p[3, 2] == 1.0
    cam = camera_from_projection(p)
    assert cam.near == pytest.approx(0.5)
    assert cam.far == pytest.approx(1.0)
    z = np.linspace(0.5, 1.0, 7)
    np.testing.assert_allclose(hardware_depth(z, p),
                               hardware_depth(z, p.T))


def test_hardware_depth_transposed_matrix():
    """hardware_depth must read B from the right slot for transposed
    matrices (regression: it used to return A + 1/z)."""
    p = perspective_projection(0.3, 250.0, 0.7)
    z = np.linspace(0.3, 250.0, 11)
    np.testing.assert_allclose(hardware_depth(z, p.T), hardware_depth(z, p))


def test_rejects_non_perspective():
    with pytest.raises(ValueError, match="4x4"):
        camera_from_projection(np.eye(3))
    with pytest.raises(ValueError, match="P\\[0,0\\]"):
        camera_from_projection(np.zeros((4, 4)))
    with pytest.raises(ValueError, match="convention"):
        camera_from_projection(np.eye(4))  # no unit w row
    ortho = np.eye(4)
    ortho[3, 2] = 1.0  # w row present but B == 0
    with pytest.raises(ValueError, match="finite-far"):
        camera_from_projection(ortho)
    with pytest.raises(ValueError):
        perspective_projection(2.0, 1.0, 0.5)  # near > far


# ---------------------------------------------------------------------------
# CameraParams.from_projection (VERDICT r3 item 6): the engine-facing
# constructor -- Unity (D3D [0,1] clip) and GL ([-1,1] NDC) conventions,
# both handednesses, both matrix orientations, golden cross-validation.
# ---------------------------------------------------------------------------

import math

from tpuao.params import CameraParams


def _rh_mat(a, b, fovx_deg=70.0, aspect=16 / 9):
    """Right-handed (-Z look) column-vector perspective matrix."""
    x = 1.0 / math.tan(math.radians(fovx_deg) / 2)
    p = np.zeros((4, 4))
    p[0, 0] = x
    p[1, 1] = x * aspect
    p[2, 2] = a
    p[2, 3] = b
    p[3, 2] = -1.0
    return p


def _unity_reversed(n, f):
    return _rh_mat(n / (f - n), n * f / (f - n))


def _unity_forward(n, f):
    return _rh_mat(-f / (f - n), -f * n / (f - n))


def _gl(n, f):
    return _rh_mat(-(f + n) / (f - n), -2 * f * n / (f - n))


@pytest.mark.parametrize("mk,conv,rev", [
    (_unity_reversed, "unity", True),
    (_unity_forward, "unity", False),
    (_gl, "gl", False),
])
@pytest.mark.parametrize("transpose", [False, True])
def test_from_projection_conventions(mk, conv, rev, transpose):
    n, f = 0.3, 250.0
    p = mk(n, f)
    cam = CameraParams.from_projection(p.T if transpose else p,
                                       convention=conv)
    assert cam.reversed_z is rev
    assert float(cam.near) == pytest.approx(n)
    assert float(cam.far) == pytest.approx(f)
    assert float(cam.tan_half_fov_h) == pytest.approx(
        math.tan(math.radians(70.0) / 2))


def test_from_projection_agrees_with_utils_camera():
    """The left-handed utils/camera.py convention (w row +1) must extract
    to the SAME camera through CameraParams.from_projection."""
    p = perspective_projection(0.5, 80.0, 0.9, reversed_z=True)
    a = camera_from_projection(p)
    b = CameraParams.from_projection(p, convention="unity")
    assert float(a.near) == pytest.approx(float(b.near))
    assert float(a.far) == pytest.approx(float(b.far))
    assert float(a.tan_half_fov_h) == pytest.approx(
        float(b.tan_half_fov_h))
    assert a.reversed_z == b.reversed_z


def test_from_projection_linearizer_roundtrip():
    """Hardware depth generated by the matrix, linearized with the
    extracted camera, must reproduce z_eye/far (the SURVEY SS3.1
    monotonicity + range validation, end to end)."""
    import jax.numpy as jnp

    n, f = 0.25, 120.0
    p = _unity_reversed(n, f)
    cam = CameraParams.from_projection(p)
    z_eye = np.linspace(n, f, 257)
    d_hw = (p[2, 2] * (-z_eye) + p[2, 3]) / (p[3, 2] * (-z_eye))
    linz = np.asarray(linearize_depth(jnp.asarray(d_hw, jnp.float32), cam))
    np.testing.assert_allclose(linz, z_eye / f, atol=1e-6)


def test_from_projection_rejects_bad_matrices():
    with pytest.raises(ValueError, match="16 values"):
        CameraParams.from_projection(np.eye(3))
    with pytest.raises(ValueError, match="perspective"):
        CameraParams.from_projection(np.eye(4))  # orthographic
    with pytest.raises(ValueError, match="infinite"):
        CameraParams.from_projection(_rh_mat(0.0, 0.3))  # infinite far
    with pytest.raises(ValueError, match="convention"):
        CameraParams.from_projection(_unity_reversed(1, 10), convention="dx")
    # oblique depth row: not representable by the linearizer
    p = _unity_reversed(0.3, 100.0)
    p[2, 0] = 0.2
    cam = CameraParams.from_projection(p)  # x-shear doesn't touch depth: ok
    assert float(cam.near) == pytest.approx(0.3)


def test_from_projection_flat16_accepted():
    p = _unity_reversed(0.3, 250.0)
    cam = CameraParams.from_projection(p.ravel())
    assert float(cam.far) == pytest.approx(250.0)
