"""AoPrepare stage, TPU-native (SURVEY.md SS3.1).

Reference behavior (expected ``Assets/MiniEngineAO/Shader/DownSample1.compute``
/ ``DownSample2.compute`` -- mount empty, SURVEY.md SS0): hardware depth ->
LinearZ, pick-one downsample pyramid DS2x..DS16x, and a 4x4 deinterleave of
each level into 16 slices ("atlas") so each slice's 16-sample neighborhood
fits GPU group-shared memory.

TPU-first redesign: the deinterleave exists *only* to serve the GPU shared-
memory model.  On TPU, a VMEM-resident block already gives the whole
neighborhood, and the stride-4 disc taps become static shifted slices of the
depth block (free VPU lane/sublane shifts) -- so the hot path renders
directly on the strided layout and never materializes slices.  The
deinterleave/interleave relayouts are still provided (API parity + tests);
``pad_parity4`` reproduces the per-slice clamp-to-edge sampling semantics on
the strided layout bit-exactly (see golden/reference.py docstring).

Everything here is plain jnp: XLA fuses linearize+downsample into trivially
memory-bound code; no Pallas needed for this stage at <=1080p (SURVEY.md SS8
step 4 orders Pallas by win size).
"""

from __future__ import annotations

import jax.numpy as jnp


def linearize_depth(depth, camera):
    """Hardware depth -> normalized linear eye depth z/far (SURVEY.md SS3.1).

    LinearZ(d) = 1 / (zmagic * d + 1), zmagic = (far - near)/near.
    """
    depth = depth.astype(jnp.float32)
    if camera.depth_mode == "linear":
        return depth
    zmagic = (camera.far - camera.near) / camera.near
    d = depth if camera.reversed_z else 1.0 - depth
    return 1.0 / (zmagic * d + 1.0)


def downsample2x(z):
    """Pick-one 2x downsample ((0,0) corner of each 2x2).

    Written as two sequential 1-D strided slices: XLA's TPU lowering of a
    single 2-D strided slice is pathologically slow (~5 ms at 1080p on v5e,
    measured), while per-axis strided slices are free.
    """
    return z[..., 0::2, :][..., :, 0::2]


def build_pyramid(linear_z, depth_levels: int):
    """[LinearZ, DS2x, ..., DS(2^depth_levels)x]."""
    pyr = [linear_z]
    for _ in range(depth_levels):
        pyr.append(downsample2x(pyr[-1]))
    return pyr


def deinterleave_4x4(x):
    """(H, W) -> (16, H/4, W/4): slice s = 4*i + j holds the pixels with
    row % 4 == i and col % 4 == j.  Reference 'atlas' layout (SURVEY.md SS3.1).
    """
    h, w = x.shape[-2:]
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    lead = x.shape[:-2]
    n = len(lead)
    x4 = x.reshape(*lead, h // 4, 4, w // 4, 4)  # (..., H4, i, W4, j)
    perm = tuple(range(n)) + (n + 1, n + 3, n + 0, n + 2)  # (..., i, j, H4, W4)
    x4 = x4.transpose(perm)
    return x4.reshape(*lead, 16, h // 4, w // 4)


def interleave_4x4(slices):
    """Inverse of deinterleave_4x4: (16, H/4, W/4) -> (H, W)."""
    lead = slices.shape[:-3]
    n = len(lead)
    hh, ww = slices.shape[-2:]
    x4 = slices.reshape(*lead, 4, 4, hh, ww)  # (..., i, j, H4, W4)
    perm = tuple(range(n)) + (n + 2, n + 0, n + 3, n + 1)  # (..., H4, i, W4, j)
    x4 = x4.transpose(perm)
    return x4.reshape(*lead, hh * 4, ww * 4)


def pad_parity4(x, pad: int):
    """Mod-4-parity-preserving edge pad (per-slice clamp semantics on the
    strided layout; spec in golden/reference.py).  Pads last two dims."""
    assert pad % 4 == 0
    reps = pad // 4
    tile_r = (1,) * (x.ndim - 2) + (reps, 1)
    tile_c = (1,) * (x.ndim - 2) + (1, reps)
    top = jnp.tile(x[..., :4, :], tile_r)
    bot = jnp.tile(x[..., -4:, :], tile_r)
    x = jnp.concatenate([top, x, bot], axis=-2)
    left = jnp.tile(x[..., :, :4], tile_c)
    right = jnp.tile(x[..., :, -4:], tile_c)
    return jnp.concatenate([left, x, right], axis=-1)
