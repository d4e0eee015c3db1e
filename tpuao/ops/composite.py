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

    The multiply runs in f32 and the result is cast back to the color
    dtype (rounded for integer frames) — casting AO in [0, 1) to an
    integer dtype first would truncate it to 0 and black the frame; the
    golden spec multiplies in float.
    """
    if color.ndim == ao.ndim + 1:
        ao = ao[..., None]
    out = color.astype(jnp.float32) * ao.astype(jnp.float32)
    dt = jnp.dtype(color.dtype)
    if jnp.issubdtype(dt, jnp.integer):
        return jnp.round(out).astype(dt)
    return out.astype(dt)


def debug_view(ao, channels: int = 3):
    """Debug blit: broadcast AO to an (H, W, C) grayscale image."""
    return jnp.broadcast_to(ao[..., None], ao.shape + (channels,))
