"""Differentiable-AO tests (models/autodiff.py).

The reference has no gradient story at all (fixed-function GPU effect);
this is a new TPU-native capability: jax.grad flows through the entire
frame program, enabling target-matching calibration of the tunables.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuao.models.autodiff import ao_grads, ao_loss, fit_tunables
from tpuao.models.pipeline import ao_pipeline
from tpuao.ops.render import _pow_gradsafe
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F

CAM = CameraParams(depth_mode="linear")


def _scene(h=128, w=192):
    return jnp.asarray(F.spheres_on_plane(h, w, n_spheres=4, seed=3),
                       jnp.float32)


def test_pow_gradsafe_forward_and_zero_input():
    x = jnp.array([0.0, 0.25, 1.0], jnp.float32)
    # forward bit-identical to jnp.power
    np.testing.assert_array_equal(_pow_gradsafe(x, 0.7), jnp.power(x, 0.7))
    # gradients finite at x == 0 for s < 1 (raw power would be inf) and
    # for d/ds (raw would be 0 * log(0) = nan)
    gx = jax.grad(lambda v: jnp.sum(_pow_gradsafe(v, 0.7)))(x)
    gs = jax.grad(lambda s: jnp.sum(_pow_gradsafe(x, s)))(0.7)
    assert np.all(np.isfinite(gx)) and np.isfinite(gs)


@pytest.mark.slow
def test_grads_wrt_tunables_finite_and_nonzero():
    z = _scene()
    target = ao_pipeline(z, CAM, AOParams(strength=1.4), None)[0]
    loss, gp = ao_grads(AOParams(), z, target, CAM)
    assert float(loss) > 0
    leaves = {n: float(getattr(gp, n))
              for n in ("strength", "rejection_falloff",
                        "noise_filter_tolerance", "blur_tolerance",
                        "upsample_tolerance")}
    assert all(np.isfinite(v) for v in leaves.values()), leaves
    # strength mismatch must show up in its gradient
    assert abs(leaves["strength"]) > 1e-6


@pytest.mark.slow
def test_grads_wrt_depth_finite():
    z = _scene()
    target = jnp.ones_like(ao_pipeline(z, CAM, AOParams(), None)[0]) * 0.5
    loss, gp, gd = ao_grads(AOParams(), z, target, CAM, wrt_depth=True)
    gd = np.asarray(gd)
    assert gd.shape == z.shape
    assert np.all(np.isfinite(gd)) and np.abs(gd).max() > 0


@pytest.mark.slow
def test_fit_recovers_strength():
    z = _scene()
    p_true = AOParams(strength=1.6)
    target = ao_pipeline(z, CAM, p_true, None)[0]
    fitted, losses = fit_tunables(
        z, target, CAM, params0=AOParams(strength=0.8),
        fit=("strength",), steps=80, lr=0.05)
    losses = np.asarray(losses)
    assert losses[-1] < 1e-5, losses[-1]
    assert abs(float(fitted.strength) - 1.6) < 0.05
    # frozen tunables stayed put
    assert float(fitted.rejection_falloff) == pytest.approx(2.5)


def test_fit_rejects_unknown_tunable():
    z = _scene(64, 64)
    with pytest.raises(ValueError, match="not differentiable"):
        fit_tunables(z, jnp.ones((64, 64)), CAM, fit=("hierarchy_depth",),
                     steps=1)
