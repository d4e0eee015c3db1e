"""Differentiable AO: gradients through the full pipeline (TPU-native bonus).

The reference is a fixed-function GPU effect; its tunables are hand-set in
the Unity inspector (SURVEY.md SS2 L3).  Because this framework's frame
program is a pure traced function and every tunable is a pytree leaf
(params.py design note), ``jax.grad`` flows end-to-end through prepare ->
render -> blur/upsample -> composite with no extra machinery.  That turns
hand-tuning into optimization:

  * ``ao_loss``       -- mean-squared error of the rendered AO vs a target.
  * ``ao_grads``      -- gradients of that loss w.r.t. the traced tunables
                         (and optionally the depth buffer itself).
  * ``fit_tunables``  -- gradient-descent calibration of chosen tunables to
                         match a target AO image (e.g. match a hand-tuned
                         reference frame, or another renderer's output).

Gradient caveats handled in the ops layer: the strength power uses a
clamped-subgradient ``custom_jvp`` (ops/render.py::_pow_gradsafe) so a
fully-occluded pixel (vis=0) cannot produce inf/nan; everything else in the
pipeline (clips, mins, bilateral weights) has well-defined subgradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams, PARAM_RANGES

# Tunables that are pytree leaves and therefore differentiable.
TRACED_TUNABLES = tuple(PARAM_RANGES)


def ao_loss(params, depth, target_ao, camera, normals=None,
            impl: str = "auto"):
    """Mean-squared error of the pipeline's AO against ``target_ao``."""
    ao, _ = ao_pipeline(depth, camera, params, normals, impl=impl)
    d = ao - target_ao.astype(jnp.float32)
    return jnp.mean(d * d)


def ao_grads(params, depth, target_ao, camera=None, normals=None,
             wrt_depth: bool = False, impl: str = "auto"):
    """Gradients of ``ao_loss``.

    Returns ``(loss, grad_params)`` -- ``grad_params`` is an ``AOParams``
    whose traced leaves hold d(loss)/d(tunable) -- or
    ``(loss, grad_params, grad_depth)`` with ``wrt_depth=True``.
    """
    camera = camera or CameraParams()
    if wrt_depth:
        loss, (gp, gd) = jax.value_and_grad(ao_loss, argnums=(0, 1))(
            params, depth, target_ao, camera, normals, impl)
        return loss, gp, gd
    loss, gp = jax.value_and_grad(ao_loss)(
        params, depth, target_ao, camera, normals, impl)
    return loss, gp


def _mask_like(params: AOParams, fit: tuple[str, ...]) -> AOParams:
    return params.replace(
        **{n: (1.0 if n in fit else 0.0) for n in TRACED_TUNABLES})


def _project(params: AOParams) -> AOParams:
    """Clamp traced tunables into their inspector ranges (PARAM_RANGES)."""
    upd = {}
    for n, (lo, hi) in PARAM_RANGES.items():
        upd[n] = jnp.clip(getattr(params, n), lo, hi)
    return params.replace(**upd)


def fit_tunables(depth, target_ao, camera=None, params0=None, normals=None,
                 fit: tuple[str, ...] = ("strength", "rejection_falloff"),
                 steps: int = 60, lr: float = 0.1, impl: str = "auto"):
    """Calibrate ``fit`` tunables so the rendered AO matches ``target_ao``.

    Projected Adam on the MSE loss: non-fitted tunables are frozen via a
    gradient mask, and every step clamps back into PARAM_RANGES (the same
    bounds the reference's inspector sliders enforce).  The whole loop is
    one jitted ``lax.scan`` -- a single XLA program, no per-step dispatch.

    Returns ``(fitted AOParams, losses[steps])``.
    """
    import optax

    camera = camera or CameraParams()
    params0 = params0 or AOParams()
    unknown = set(fit) - set(TRACED_TUNABLES)
    if unknown:
        raise ValueError(f"not differentiable tunables: {sorted(unknown)}")
    # Promote traced leaves to f32 arrays so the scan carry is uniform.
    params0 = params0.replace(
        **{n: jnp.float32(getattr(params0, n)) for n in TRACED_TUNABLES})
    mask = _mask_like(params0, fit)
    opt = optax.adam(lr)
    depth = jnp.asarray(depth, jnp.float32)
    target_ao = jnp.asarray(target_ao, jnp.float32)

    def step(carry, _):
        params, opt_state = carry
        loss, g = jax.value_and_grad(ao_loss)(
            params, depth, target_ao, camera, normals, impl)
        g = jax.tree_util.tree_map(lambda a, m: a * m, g, mask)
        updates, opt_state = opt.update(g, opt_state, params)
        params = _project(optax.apply_updates(params, updates))
        return (params, opt_state), loss

    @jax.jit
    def run(params):
        (params, _), losses = jax.lax.scan(
            step, (params, opt.init(params)), None, length=steps)
        return params, losses

    return run(params0)
