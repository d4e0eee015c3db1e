"""Composite / debug stage (SURVEY.md SS3.4).

Reference: a fullscreen raster pass multiplies the final AO texture into the
camera target (DstColor*Zero-style blend); a debug mode blits the raw AO
buffer instead.  Here both are trivial fused elementwise ops; debug views of
intermediate pyramids are returned by the pipeline's ``debug_outputs`` flag
(SURVEY.md SS6 'Metrics / observability').
"""

from __future__ import annotations

import jax.numpy as jnp


def composite(color, ao):
    """Multiply single-channel AO into an (H, W[, C]) color frame.

    Float color frames multiply in their own precision (f64 stays f64 —
    the golden spec's path); integer frames upcast to f32 for the
    multiply and round back — casting AO in [0, 1) to an integer dtype
    first would truncate it to 0 and black the frame.
    """
    if color.ndim == ao.ndim + 1:
        ao = ao[..., None]
    dt = jnp.dtype(color.dtype)
    if jnp.issubdtype(dt, jnp.integer):
        out = color.astype(jnp.float32) * ao.astype(jnp.float32)
        return jnp.round(out).astype(dt)
    return color * ao.astype(dt)


def debug_view(ao, channels: int = 3):
    """Debug blit: broadcast AO to an (H, W, C) grayscale image."""
    return jnp.broadcast_to(ao[..., None], ao.shape + (channels,))
