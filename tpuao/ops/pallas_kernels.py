"""Pallas TPU kernels for the hot pipeline stages.

The reference's native components are HLSL compute shaders; their TPU-native
equivalent is Pallas (SURVEY.md SS3 header).  This module implements the
AoRender estimator (SURVEY.md SS3.2) as a fused VMEM-tile kernel:

* GPU model: an 8x8 thread group caches a 16x16 depth tile (8x8 core +
  4-texel apron) in group-shared memory, one deinterleaved slice per
  dispatch-z.
* TPU model: one grid step holds an (R+32, W+32) depth window resident in
  VMEM -- rows tiled over the grid, the 4x4 deinterleave replaced by
  stride-4 static slices of the window (see ops/prepare.py) -- and the whole
  34-pair accumulation runs as VPU vector ops with zero gathers and a single
  HBM read/write per texel.

Row tiling uses an explicit pre-windowed input (g, R+2H, W+2H) built by
cheap jnp stacking (overlapping BlockSpecs are not expressible; duplicating
the 32 halo rows costs ~25% of one level read, ~microseconds), so each grid
step gets its halo without inter-block communication.

Traced tunables (rejection_falloff, strength, camera FOV) enter through an
SMEM scalar table, so parameter changes never recompile (SURVEY.md SS4.3).

Math is bit-compatible with tpuao.ops.render / the golden spec; tested to
<=1e-3 ([BJ] budget; in practice ~1e-6).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuao.ops.prepare import pad_parity4
from tpuao.ops.render import _pair_constants
from tpuao.params import sphere_radius_coef

HALO = 16


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _out_sds(shape, dtype, *inputs):
    """``ShapeDtypeStruct`` for a ``pallas_call`` out_shape that composes
    under ``jax.shard_map(check_vma=True)``: the output is declared
    varying over the union of the inputs' manual mesh axes (jax >= 0.9
    rejects a ``vma=None`` out_shape inside shard_map -- observed when the
    temporal fleet routed the windowed resolve to this kernel on TPU).
    Outside shard_map every vma is empty and this is the plain struct."""
    vma = frozenset()
    for x in inputs:
        vma |= getattr(jax.typeof(x), "vma", frozenset())
    if not vma:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _row_windows(zp, g: int, tile: int):
    """(g*tile + 2*HALO, W) -> (g, tile + 2*HALO, W) overlapping windows."""
    return jnp.stack(
        [zp[i * tile: i * tile + tile + 2 * HALO, :] for i in range(g)]
    )


def _render_kernel(pairs, R, w, use_normals, scal_ref, z_ref, *rest):
    (o_ref,) = rest[-1:]
    falloff = scal_ref[0, 0]
    strength = scal_ref[0, 1]
    inv_rc = scal_ref[0, 2]  # 1 / radius_coef
    z = z_ref[0]
    zc = z[HALO: HALO + R, HALO: HALO + w]
    inv_zc = 1.0 / zc
    if use_normals:
        # normals travel as plain (R, w) center tiles -- the tangent test
        # reads no neighbors, so they carry no halo (unlike depth)
        nx_ref, ny_ref, nz_ref = rest[0], rest[1], rest[2]
        n_x = nx_ref[0]
        n_y = ny_ref[0]
        n_z = jnp.maximum(nz_ref[0], 0.05)
        texel_scale = scal_ref[0, 3]
        radius_coef = 1.0 / inv_rc
        grad = texel_scale / n_z

    vis = jnp.zeros((R, w), jnp.float32)
    prev_t = None
    a_i = None
    for (dx, dy, t, w_pair) in pairs:
        inv_r = (1.0 / t) * inv_rc
        if t != prev_t:
            a_i = inv_zc * inv_r  # shared by all taps of this disc entry
            prev_t = t
        b_i = 1.0 - inv_r
        zs1 = z[HALO + dy: HALO + dy + R, HALO + dx: HALO + dx + w]
        zs2 = z[HALO - dy: HALO - dy + R, HALO - dx: HALO - dx + w]
        if use_normals:
            # soft-clamped tangent correction (see golden _tangent_offset)
            x = (n_x * dx + n_y * dy) * grad
            m2 = (0.5 * t) ** 2 * (radius_coef * radius_coef)
            rel = x * m2 / (m2 + x * x)
            d1 = zs1 * a_i + (b_i - rel * inv_r)
            d2 = zs2 * a_i + (b_i + rel * inv_r)
        else:
            d1 = zs1 * a_i + b_i
            d2 = zs2 * a_i + b_i
        p1 = jnp.clip(falloff * d1, 0.0, 1.0)
        p2 = jnp.clip(falloff * d2, 0.0, 1.0)
        pair_vis = jnp.maximum(jnp.clip(d1, 0.0, 1.0), p2) + jnp.maximum(
            jnp.clip(d2, 0.0, 1.0), p1
        )
        vis = vis + (0.5 * w_pair) * pair_vis

    vis = jnp.clip(vis, 0.0, 1.0)
    # vis ** strength with traced exponent; the 1e-30 log floor alone would
    # give 1e-30**s (> 1e-3 at s=0.1, over the [BJ] budget) at vis==0, so
    # select exact 0 there like jnp.power does
    o_ref[0] = jnp.where(
        vis > 0.0, jnp.exp(strength * jnp.log(jnp.maximum(vis, 1e-30))), 0.0)


def _upsample_kernel(R, lw, premin, scal_ref, *refs):
    """Fused AoBlurUpsample step (SURVEY.md SS3.3) on one lo-res row tile.

    refs: [lo_ao2_win,] lo_ao_win, lo_d_win, hi_d_planes, out_planes
    lo windows are (1, R+3, lw+3) edge-padded tiles (ext rows [iR-1,
    iR+R+2)); hi-res arrays travel as 4 parity planes (4, R, lw) -- Mosaic
    has no lane-interleave shape cast, so the 2x interleave happens in one
    cheap XLA transpose outside the kernel.
    """
    if premin:
        ao2_ref, ao_ref, lod_ref, hid_ref, out_ref = refs
    else:
        ao_ref, lod_ref, hid_ref, out_ref = refs
    k_blur = scal_ref[0, 0]
    k_up = scal_ref[0, 1]
    nfs = scal_ref[0, 2]

    lo_a = ao_ref[0]
    if premin:
        lo_a = jnp.minimum(lo_a, ao2_ref[0])
    lo_d = lod_ref[0]

    # --- noise filter on the edge-extended domain: ext rows [iR, iR+R] ---
    nrows, ncols = R + 1, lw + 1
    dc_c = lo_d[1: 1 + nrows, 1: 1 + ncols]  # filter centers
    acc = jnp.zeros((nrows, ncols), jnp.float32)
    wacc = jnp.zeros((nrows, ncols), jnp.float32)
    for dy, dx, g in ((-1, -1, 1.), (-1, 0, 2.), (-1, 1, 1.),
                      (0, -1, 2.), (0, 0, 4.), (0, 1, 2.),
                      (1, -1, 1.), (1, 0, 2.), (1, 1, 1.)):
        a_n = lo_a[1 + dy: 1 + dy + nrows, 1 + dx: 1 + dx + ncols]
        d_n = lo_d[1 + dy: 1 + dy + nrows, 1 + dx: 1 + dx + ncols]
        dd = d_n - dc_c
        wt = g / (1.0 + nfs * dd * dd)
        acc += wt * a_n
        wacc += wt
    filtered = acc / wacc

    # --- bilateral 2x: per-parity planes, only non-zero bilinear taps ---
    for p in (0, 1):
        for q in (0, 1):
            hd = hid_ref[2 * p + q]  # (R, lw) hi depth at parity (p, q)
            up_acc = jnp.zeros((R, lw), jnp.float32)
            up_w = jnp.zeros((R, lw), jnp.float32)
            for dr in (0, 1):
                wr = 1.0 - p * 0.5 if dr == 0 else p * 0.5
                if wr == 0.0:
                    continue
                for dc in (0, 1):
                    wc = 1.0 - q * 0.5 if dc == 0 else q * 0.5
                    if wc == 0.0:
                        continue
                    a = filtered[dr: dr + R, dc: dc + lw]
                    d = lo_d[1 + dr: 1 + dr + R, 1 + dc: 1 + dc + lw]
                    dd = d - hd
                    wt = (wr * wc) / (dd * dd / k_blur + k_up)
                    up_acc += wt * a
                    up_w += wt
            out_ref[2 * p + q] = up_acc / jnp.maximum(up_w, 1e-30)


def blur_upsample_step(lo_ao, lo_d, hi_d, params, full_width: int,
                       lo_ao2=None, hi_ao_blend=None, row_tile: int = 64):
    """Fused Pallas AoBlurUpsample step; drop-in for ops.upsample version."""
    from tpuao.params import upsample_constants

    lo_ao = lo_ao.astype(jnp.float32)
    lo_d = lo_d.astype(jnp.float32)
    hi_d = hi_d.astype(jnp.float32)
    lh, lw = lo_d.shape[-2:]
    _, k_blur, k_up, nfs = upsample_constants(params, full_width, lw)

    R = min(row_tile, lh)
    g = -(-lh // R)
    pad_rows = g * R - lh

    def prep_lo(x):
        x = jnp.pad(x, [(1, 2 + pad_rows), (1, 2)], mode="edge")
        return jnp.stack(
            [x[i * R: i * R + R + 3, :] for i in range(g)])

    lo_ins = ([prep_lo(lo_ao2)] if lo_ao2 is not None else []) + [
        prep_lo(lo_ao), prep_lo(lo_d)]

    # hi depth -> 4 parity planes (4, lh, lw), row-padded to g*R
    hid_planes = jnp.stack(
        [hi_d[p::2, :][:, q::2] for p in (0, 1) for q in (0, 1)])
    if pad_rows:
        hid_planes = jnp.concatenate(
            [hid_planes, jnp.tile(hid_planes[:, -1:, :], (1, pad_rows, 1))],
            axis=1)

    scalars = jnp.stack([
        jnp.asarray(k_blur, jnp.float32),
        jnp.asarray(k_up, jnp.float32),
        jnp.asarray(nfs, jnp.float32),
    ]).reshape(1, 3)

    premin = lo_ao2 is not None
    lo_spec = pl.BlockSpec((1, R + 3, lw + 3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((4, R, lw), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_upsample_kernel, R, lw, premin),
        grid=(g,),
        in_specs=[pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [lo_spec] * len(lo_ins) + [plane_spec],
        out_specs=plane_spec,
        out_shape=_out_sds((4, g * R, lw), jnp.float32,
                            scalars, *lo_ins, hid_planes),
        interpret=_use_interpret(),
    )(scalars, *lo_ins, hid_planes)
    planes = out[:, :lh, :]
    # interleave parity planes -> (2lh, 2lw): (2,2,lh,lw) -> (lh,2,lw,2)
    from tpuao.ops.upsample import interleave2x2

    out = interleave2x2(planes[0], planes[1], planes[2], planes[3])
    if hi_ao_blend is not None:
        out = jnp.minimum(out, hi_ao_blend)
    return out


def _fused_l1_kernel_zc(pairs, R, lw, lh, scal_ref, z0_ref, z1_ref,
                        d0_ref, d1_ref, c0_ref, c1_ref, hid_ref, out_ref,
                        ao_scratch):
    """Zero-copy variant of _fused_l1_kernel: instead of host-side stacked
    windows (which lower as one XLA slice kernel per tile per input), each
    halo'd window is assembled in-kernel from two *adjacent plain blocks* of
    the same padded array (the array is passed twice with index maps i and
    i+1).  Requires R >= 38 so a window spans at most two blocks."""
    H2 = 20
    nrows = R + 3

    z = jnp.concatenate([z0_ref[:], z1_ref[:]], axis=0)[3: 3 + nrows + 32]
    lo_d = jnp.concatenate([d0_ref[:], d1_ref[:]], axis=0)[: nrows]
    c1w = jnp.concatenate([c0_ref[:], c1_ref[:]], axis=0)[: nrows]
    _fused_l1_body(pairs, R, lw, lh, H2, scal_ref, z, lo_d, c1w, hid_ref,
                   out_ref, ao_scratch)


def _fused_l1_body(pairs, R, lw, lh, H2, scal_ref, z, lo_d, c1w, hid_ref,
                   out_ref, ao_scratch):
    falloff = scal_ref[0, 0]
    strength = scal_ref[0, 1]
    inv_rc = scal_ref[0, 2]
    k_blur = scal_ref[0, 4]
    k_up = scal_ref[0, 5]
    nfs = scal_ref[0, 6]
    i = pl.program_id(0)
    nrows = R + 3
    zc = z[16: 16 + nrows, H2: H2 + lw]
    inv_zc = 1.0 / zc
    vis = jnp.zeros((nrows, lw), jnp.float32)
    prev_t = None
    a_i = None
    for (dx, dy, t, w_pair) in pairs:
        inv_r = (1.0 / t) * inv_rc
        if t != prev_t:
            a_i = inv_zc * inv_r
            prev_t = t
        b_i = 1.0 - inv_r
        d1 = z[16 + dy: 16 + dy + nrows, H2 + dx: H2 + dx + lw] * a_i + b_i
        d2 = z[16 - dy: 16 - dy + nrows, H2 - dx: H2 - dx + lw] * a_i + b_i
        p1 = jnp.clip(falloff * d1, 0.0, 1.0)
        p2 = jnp.clip(falloff * d2, 0.0, 1.0)
        vis = vis + (0.5 * w_pair) * (
            jnp.maximum(jnp.clip(d1, 0.0, 1.0), p2)
            + jnp.maximum(jnp.clip(d2, 0.0, 1.0), p1))
    vis = jnp.clip(vis, 0.0, 1.0)
    # exact 0 at vis==0 (the log floor alone gives 1e-30**s, over budget
    # at small strength)
    ao = jnp.where(
        vis > 0.0, jnp.exp(strength * jnp.log(jnp.maximum(vis, 1e-30))), 0.0)

    slot_global = (
        jax.lax.broadcasted_iota(jnp.int32, (nrows, lw), 0) + i * R - 1)
    ao_scratch[:] = ao
    top_row = ao_scratch[pl.ds(jnp.clip(1 - i * R, 0, nrows - 1), 1), :]
    bot_row = ao_scratch[pl.ds(jnp.clip(lh - i * R, 0, nrows - 1), 1), :]
    ao = jnp.where(slot_global < 0, top_row, ao)
    ao = jnp.where(slot_global > lh - 1, bot_row, ao)
    ao = jnp.concatenate(
        [ao[:, :1], ao, ao[:, lw - 1:], ao[:, lw - 1:]], axis=1)

    lo_a = jnp.minimum(ao, c1w)
    fr_, fc_ = R + 1, lw + 1
    dc_c = lo_d[1: 1 + fr_, 1: 1 + fc_]
    acc = jnp.zeros((fr_, fc_), jnp.float32)
    wacc = jnp.zeros((fr_, fc_), jnp.float32)
    for dy, dx, gw in ((-1, -1, 1.), (-1, 0, 2.), (-1, 1, 1.),
                       (0, -1, 2.), (0, 0, 4.), (0, 1, 2.),
                       (1, -1, 1.), (1, 0, 2.), (1, 1, 1.)):
        a_n = lo_a[1 + dy: 1 + dy + fr_, 1 + dx: 1 + dx + fc_]
        d_n = lo_d[1 + dy: 1 + dy + fr_, 1 + dx: 1 + dx + fc_]
        dd = d_n - dc_c
        wt = gw / (1.0 + nfs * dd * dd)
        acc += wt * a_n
        wacc += wt
    filtered = acc / wacc

    for p in (0, 1):
        for q in (0, 1):
            hd = hid_ref[2 * p + q]
            up_acc = jnp.zeros((R, lw), jnp.float32)
            up_w = jnp.zeros((R, lw), jnp.float32)
            for dr in (0, 1):
                wr = 1.0 - p * 0.5 if dr == 0 else p * 0.5
                if wr == 0.0:
                    continue
                for dc in (0, 1):
                    wc = 1.0 - q * 0.5 if dc == 0 else q * 0.5
                    if wc == 0.0:
                        continue
                    a = filtered[dr: dr + R, dc: dc + lw]
                    d = lo_d[1 + dr: 1 + dr + R, 1 + dc: 1 + dc + lw]
                    dd = d - hd
                    wt = (wr * wc) / (dd * dd / k_blur + k_up)
                    up_acc += wt * a
                    up_w += wt
            out_ref[2 * p + q] = up_acc / jnp.maximum(up_w, 1e-30)


def fused_render_upsample_step_zc(ds, c1, hi_d, level: int, full_width: int,
                                  camera, params, row_tile: int = 64):
    """Zero-copy-prologue fused step: no stacked windows; halo'd tiles are
    assembled in-kernel from adjacent blocks of plainly padded arrays."""
    from tpuao.params import upsample_constants

    ds = ds.astype(jnp.float32)
    c1 = c1.astype(jnp.float32)
    hi_d = hi_d.astype(jnp.float32)
    lh, lw = ds.shape
    pairs = _pair_constants(params)
    radius_coef = sphere_radius_coef(
        level, full_width, camera.tan_half_fov_h, params.screenspace_diameter
    )
    _, k_blur, k_up, nfs = upsample_constants(params, full_width, lw)

    R = max(min(row_tile, lh), 40)  # window must fit in two blocks
    g = -(-lh // R)
    pad_rows = g * R - lh
    H2 = 20

    # z: parity-pad 20, then bottom-pad so the array is exactly (g+1)*R rows
    zp = pad_parity4(ds, H2)  # rows: lh + 40, row 0 = ds row -20
    need = (g + 1) * R - zp.shape[0]
    if need > 0:
        zp = jnp.concatenate([zp, jnp.tile(zp[-1:, :], (need, 1))], 0)

    def prep_plain(x):  # edge pad (1 top, rest bottom) to (g+1)*R rows
        x = jnp.pad(x, [(1, 2), (1, 2)], mode="edge")
        need = (g + 1) * R - x.shape[0]
        if need > 0:
            x = jnp.concatenate([x, jnp.tile(x[-1:, :], (need, 1))], 0)
        return x

    dpad = prep_plain(ds)
    cpad = prep_plain(c1)

    hid_planes = jnp.stack(
        [hi_d[p::2, :][:, q::2] for p in (0, 1) for q in (0, 1)])
    if pad_rows:
        hid_planes = jnp.concatenate(
            [hid_planes, jnp.tile(hid_planes[:, -1:, :], (1, pad_rows, 1))],
            axis=1)

    scalars = jnp.stack([
        jnp.asarray(params.rejection_falloff, jnp.float32),
        jnp.asarray(params.strength, jnp.float32),
        1.0 / jnp.asarray(radius_coef, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(k_blur, jnp.float32),
        jnp.asarray(k_up, jnp.float32),
        jnp.asarray(nfs, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
    ]).reshape(1, 8)

    def blk(arr_w, idx_off):
        return pl.BlockSpec(
            (R, arr_w), lambda i, o=idx_off: (i + o, 0),
            memory_space=pltpu.VMEM)

    plane_spec = pl.BlockSpec((4, R, lw), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_l1_kernel_zc, pairs, R, lw, lh),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            blk(lw + 2 * H2, 0), blk(lw + 2 * H2, 1),
            blk(lw + 3, 0), blk(lw + 3, 1),
            blk(lw + 3, 0), blk(lw + 3, 1),
            plane_spec,
        ],
        out_specs=plane_spec,
        out_shape=_out_sds((4, g * R, lw), jnp.float32,
                            scalars, zp, dpad, cpad, hid_planes),
        scratch_shapes=[pltpu.VMEM((R + 3, lw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(scalars, zp, zp, dpad, dpad, cpad, cpad, hid_planes)
    planes = out[:, :lh, :]
    from tpuao.ops.upsample import interleave2x2

    return interleave2x2(planes[0], planes[1], planes[2], planes[3])


def _fused_l1_kernel(pairs, R, lw, lh, scal_ref, zwin_ref, dwin_ref,
                     c1win_ref, hid_ref, out_ref, ao_scratch):
    """Fused final chain section: AoRender(level) + premin + noise filter +
    bilateral 2x upsample in one VMEM pass (SURVEY.md SS4.2's two hottest
    dispatches fused; the [BJ] 'fused prepare+render+upsample' direction).

    Per grid step (lo-res row tile R):
      zwin  (1, R+3+2H, lw+2H'):  parity-padded depth for the render stencil,
            rows cover rendered ext rows [iR-1, iR+R+2)
      dwin  (1, R+3, lw+3): edge-padded depth for filter/upsample taps
      c1win (1, R+3, lw+3): edge-padded combined-from-below AO
      hid   (4, R, lw): hi-res depth parity planes
      out   (4, R, lw): final AO parity planes

    The spec defines chain edge handling as edge replication of the AO
    *array*; interior tiles render their ext rows for real, and the frame's
    first/last rows are fixed up with masked row substitution so the kernel
    is bit-compatible with the unfused path everywhere.
    """
    H2 = 20  # parity pad of zwin (16 render halo + 4 alignment margin)
    _fused_l1_body(pairs, R, lw, lh, H2, scal_ref, zwin_ref[0], dwin_ref[0],
                   c1win_ref[0], hid_ref, out_ref, ao_scratch)


def fused_render_upsample_step(ds, c1, hi_d, level: int, full_width: int,
                               camera, params, row_tile: int = 64):
    """Fused AoRender(level) + pre-min + AoBlurUpsample step.

    ``ds``: depth at the step's lo level; ``c1``: combined AO from below
    (same shape); ``hi_d``: depth at the hi level.  Returns the hi-res AO.
    Bit-compatible with render_ao_level + blur_upsample_step composition.
    """
    from tpuao.params import upsample_constants

    ds = ds.astype(jnp.float32)
    c1 = c1.astype(jnp.float32)
    hi_d = hi_d.astype(jnp.float32)
    lh, lw = ds.shape
    pairs = _pair_constants(params)
    radius_coef = sphere_radius_coef(
        level, full_width, camera.tan_half_fov_h, params.screenspace_diameter
    )
    _, k_blur, k_up, nfs = upsample_constants(params, full_width, lw)

    R = min(row_tile, lh)
    g = -(-lh // R)
    pad_rows = g * R - lh
    H2 = 20

    # zwin: parity-padded depth; window i rows = zp[iR+H2-1-16 ... ] such
    # that rendered slot s (ext row iR-1+s) centers at zp row iR-1+s+H2.
    zp = pad_parity4(ds, H2)
    if pad_rows + 2 > 0:  # rendered ext rows reach iR+R+1 <= lh+pad_rows+1
        zp = jnp.concatenate(
            [zp, jnp.tile(zp[-1:, :], (pad_rows + 4, 1))], 0)
    zwin = jnp.stack(
        [zp[i * R + H2 - 1 - 16: i * R + H2 - 1 - 16 + (R + 3) + 32, :]
         for i in range(g)])

    def prep_lo(x):
        x = jnp.pad(x, [(1, 2 + pad_rows), (1, 2)], mode="edge")
        return jnp.stack([x[i * R: i * R + R + 3, :] for i in range(g)])

    dwin = prep_lo(ds)
    c1win = prep_lo(c1)

    hid_planes = jnp.stack(
        [hi_d[p::2, :][:, q::2] for p in (0, 1) for q in (0, 1)])
    if pad_rows:
        hid_planes = jnp.concatenate(
            [hid_planes, jnp.tile(hid_planes[:, -1:, :], (1, pad_rows, 1))],
            axis=1)

    scalars = jnp.stack([
        jnp.asarray(params.rejection_falloff, jnp.float32),
        jnp.asarray(params.strength, jnp.float32),
        1.0 / jnp.asarray(radius_coef, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(k_blur, jnp.float32),
        jnp.asarray(k_up, jnp.float32),
        jnp.asarray(nfs, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
    ]).reshape(1, 8)

    zw_h = (R + 3) + 32
    lo_spec = pl.BlockSpec((1, R + 3, lw + 3), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((4, R, lw), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_l1_kernel, pairs, R, lw, lh),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, zw_h, lw + 2 * H2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            lo_spec,
            lo_spec,
            plane_spec,
        ],
        out_specs=plane_spec,
        out_shape=_out_sds((4, g * R, lw), jnp.float32,
                            scalars, zwin, dwin, c1win, hid_planes),
        scratch_shapes=[pltpu.VMEM((R + 3, lw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(scalars, zwin, dwin, c1win, hid_planes)
    planes = out[:, :lh, :]
    from tpuao.ops.upsample import interleave2x2

    return interleave2x2(planes[0], planes[1], planes[2], planes[3])


def _render_kernel_dma(pairs, R, w, g, scal_ref, zp_hbm, o_ref, zbuf, sems):
    """Double-buffered variant ([BJ] config 4 'double-buffered HBM tiles'):
    the padded depth stays in HBM; each grid step DMAs its (R+2H, W) window
    into one of two VMEM slots while the previous window computes.  Scratch
    persists across the sequential TPU grid, which is what makes the
    cross-step pipeline possible."""
    i = pl.program_id(0)
    cur = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def dma(step, slot):
        return pltpu.make_async_copy(
            zp_hbm.at[pl.ds(step * R, R + 2 * HALO), :],
            zbuf.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, cur).start()

    @pl.when(i + 1 < g)
    def _():
        dma(i + 1, nxt).start()

    dma(i, cur).wait()

    falloff = scal_ref[0, 0]
    strength = scal_ref[0, 1]
    inv_rc = scal_ref[0, 2]
    z = zbuf[cur]
    zc = z[HALO: HALO + R, HALO: HALO + w]
    inv_zc = 1.0 / zc
    vis = jnp.zeros((R, w), jnp.float32)
    prev_t = None
    a_i = None
    for (dx, dy, t, w_pair) in pairs:
        inv_r = (1.0 / t) * inv_rc
        if t != prev_t:
            a_i = inv_zc * inv_r
            prev_t = t
        b_i = 1.0 - inv_r
        d1 = z[HALO + dy: HALO + dy + R, HALO + dx: HALO + dx + w] * a_i + b_i
        d2 = z[HALO - dy: HALO - dy + R, HALO - dx: HALO - dx + w] * a_i + b_i
        p1 = jnp.clip(falloff * d1, 0.0, 1.0)
        p2 = jnp.clip(falloff * d2, 0.0, 1.0)
        vis = vis + (0.5 * w_pair) * (
            jnp.maximum(jnp.clip(d1, 0.0, 1.0), p2)
            + jnp.maximum(jnp.clip(d2, 0.0, 1.0), p1))
    vis = jnp.clip(vis, 0.0, 1.0)
    o_ref[0] = jnp.where(
        vis > 0.0, jnp.exp(strength * jnp.log(jnp.maximum(vis, 1e-30))), 0.0)


def render_ao_level_dma(ds, level: int, full_width: int, camera, params,
                        row_tile: int = 128):
    """Depth-only render with the double-buffered HBM-tile pipeline.

    Unlike ``render_ao_level`` it never materializes overlapping row
    windows on the host side -- the halo'd window is DMA'd per grid step --
    so HBM traffic is a single read of the (padded) level plus the output
    write.  Intended for the large levels of 4K+ frames.
    """
    ds = ds.astype(jnp.float32)
    h, w = ds.shape
    pairs = _pair_constants(params)
    radius_coef = sphere_radius_coef(
        level, full_width, camera.tan_half_fov_h, params.screenspace_diameter
    )
    R = min(row_tile, h)
    g = -(-h // R)
    zp = pad_parity4(ds, HALO)
    pad_rows = g * R - h
    if pad_rows:
        zp = jnp.concatenate([zp, jnp.tile(zp[-1:, :], (pad_rows, 1))], 0)
    # DMA slices must be lane-tile (128) aligned in the minor dimension
    wpad = -(-(w + 2 * HALO) // 128) * 128
    extra = wpad - (w + 2 * HALO)
    if extra:
        zp = jnp.concatenate(
            [zp, jnp.tile(zp[:, -1:], (1, extra))], axis=1)

    scalars = jnp.stack(
        [jnp.asarray(params.rejection_falloff, jnp.float32),
         jnp.asarray(params.strength, jnp.float32),
         1.0 / jnp.asarray(radius_coef, jnp.float32),
         jnp.asarray(0.0, jnp.float32)]
    ).reshape(1, 4)
    out = pl.pallas_call(
        functools.partial(_render_kernel_dma, pairs, R, w, g),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_sds((g, R, w), jnp.float32, scalars, zp),
        scratch_shapes=[
            pltpu.VMEM((2, R + 2 * HALO, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(scalars, zp)
    return out.reshape(g * R, w)[:h]


def render_ao_level(ds, level: int, full_width: int, camera, params,
                    normals_ds=None, row_tile: int = 64):
    """Pallas AO estimator; drop-in for tpuao.ops.render.render_ao_level."""
    ds = ds.astype(jnp.float32)
    if ds.ndim == 3:  # leading batch: vmap the 2-D kernel
        fn = functools.partial(render_ao_level, level=level,
                               full_width=full_width, camera=camera,
                               params=params, row_tile=row_tile)
        if normals_ds is None:
            return jax.vmap(lambda d: fn(d))(ds)
        return jax.vmap(lambda d, n: fn(d, normals_ds=n))(ds, normals_ds)

    h, w = ds.shape
    use_n = normals_ds is not None and params.use_normals
    pairs = _pair_constants(params)
    radius_coef = sphere_radius_coef(
        level, full_width, camera.tan_half_fov_h, params.screenspace_diameter
    )
    texel_scale = 2.0 * camera.tan_half_fov_h / (full_width // (1 << level))

    R = min(row_tile, h)
    g = -(-h // R)
    zp = pad_parity4(ds, HALO)
    pad_rows = g * R - h
    if pad_rows:
        zp = jnp.concatenate([zp, jnp.tile(zp[-1:, :], (pad_rows, 1))], 0)
    wins = [_row_windows(zp, g, R)]
    nwins = []
    if use_n:
        from tpuao.ops.render import normals_channel_last

        normals_ds = jnp.moveaxis(normals_channel_last(normals_ds), -1, -3)
        for c in range(3):
            npc = normals_ds[..., c, :, :].astype(jnp.float32)
            if pad_rows:
                npc = jnp.concatenate(
                    [npc, jnp.tile(npc[-1:, :], (pad_rows, 1))], 0)
            nwins.append(npc.reshape(g, R, w))

    scalars = jnp.stack(
        [jnp.asarray(params.rejection_falloff, jnp.float32),
         jnp.asarray(params.strength, jnp.float32),
         1.0 / jnp.asarray(radius_coef, jnp.float32),
         jnp.asarray(texel_scale, jnp.float32)]
    ).reshape(1, 4)

    wpad = w + 2 * HALO
    win_spec = pl.BlockSpec((1, R + 2 * HALO, wpad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, R, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_render_kernel, pairs, R, w, use_n)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((1, 4), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [win_spec] * len(wins) + [tile_spec] * len(nwins),
        out_specs=pl.BlockSpec((1, R, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_sds((g, R, w), jnp.float32,
                            scalars, *wins, *nwins),
        interpret=_use_interpret(),
    )(scalars, *wins, *nwins)
    return out.reshape(g * R, w)[:h]


# ---------------------------------------------------------------------------
# Temporal windowed history resample (spec: golden/temporal.py)
# ---------------------------------------------------------------------------

def _windowed_resolve_kernel(r, R, w, refs_ref, di_ref, dj_ref, o_ref):
    """Tent-weighted (2R+2)^2 shifted-window sum over a VMEM-resident
    history tile (the gather-free bilinear of ops/temporal.py, one row
    tile per grid step).  Row offsets ride a ``fori_loop`` whose body
    loads ONE row band from the VMEM ref and unrolls the 2R+2 column
    taps as static slices of that band.

    Form history (all measured on the live v5e this round):

    * v1 (r4): whole window pre-loaded as a value, all taps unrolled,
      row_tile=256 -- Mosaic's register allocator needed 263 MB of spill
      slots (>2x the 128 MB VMEM): hard compile error that presented as
      the r4 'hung remote compile' (the ~2 MB per-tap temporaries were
      all scheduled live at once).
    * v2: ``fori_loop`` over the row offset with a dynamic band load --
      Mosaic rejects it: a dynamic VMEM slice start in the sublane dim
      must be provably a multiple of 8, and tent offsets never are.
    * v3 (this form): static unroll again, but the default ``row_tile``
      drops to 16 so every tap temporary is (16, w) -- the whole live
      set fits VMEM/registers without spilling."""
    p = r + 1
    s = refs_ref[0]          # (2, R + 2p, w + 2p) padded history stack
    di = di_ref[0]           # (R, w) row displacement rel. to each pixel
    dj = dj_ref[0]
    acc_a = jnp.zeros((R, w), jnp.float32)
    acc_d = jnp.zeros((R, w), jnp.float32)
    for oy in range(-r, r + 2):
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(di - oy))
        for ox in range(-r, r + 2):
            t = ty * jnp.maximum(0.0, 1.0 - jnp.abs(dj - ox))
            acc_a = acc_a + t * s[0, p + oy: p + oy + R, p + ox: p + ox + w]
            acc_d = acc_d + t * s[1, p + oy: p + oy + R, p + ox: p + ox + w]
    o_ref[0, 0] = acc_a
    o_ref[0, 1] = acc_d


def windowed_resolve(prev_ao, prev_d, ip, jp, r: int, row_tile: int = 16):
    """Pallas form of ops/temporal.py::_bilinear_windowed2 (bit-compatible;
    returns ``(hist_ao, hist_depth)``).  One grid step holds a
    (2, row_tile+2p, W+2p) history window resident in VMEM and runs the
    full tap loop on it -- a single HBM read of the history per texel,
    where the XLA row-scan form re-streams the accumulator carry every
    scan step."""
    h, w = prev_ao.shape[-2:]
    p = r + 1
    R = min(row_tile, h)
    g = -(-h // R)
    pad_rows = g * R - h

    stack = jnp.stack([prev_ao.astype(jnp.float32),
                       prev_d.astype(jnp.float32)])
    sp = jnp.pad(stack, [(0, 0), (p, p + pad_rows), (p, p)], mode="edge")
    wins = jnp.stack(
        [sp[:, i * R: i * R + R + 2 * p, :] for i in range(g)])

    di = ip - jnp.arange(h, dtype=jnp.float32)[:, None]
    dj = jp - jnp.arange(w, dtype=jnp.float32)[None, :]

    def tile_rows(x):
        if pad_rows:
            x = jnp.pad(x, [(0, pad_rows), (0, 0)], mode="edge")
        return x.reshape(g, R, w)

    win_spec = pl.BlockSpec((1, 2, R + 2 * p, w + 2 * p),
                            lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, R, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    tdi, tdj = tile_rows(di), tile_rows(dj)
    out = pl.pallas_call(
        functools.partial(_windowed_resolve_kernel, r, R, w),
        grid=(g,),
        in_specs=[win_spec, tile_spec, tile_spec],
        out_specs=pl.BlockSpec((1, 2, R, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_sds((g, 2, R, w), jnp.float32,
                            wins, tdi, tdj),
        # XLA stack-allocates this call's FULL (g,2,R,w) output in scoped
        # VMEM and the compile FAILS whenever it exceeds the scoped limit
        # (measured r5: 16.23 MB at 1080p vs the 16 MB default under a
        # plain jit; 265 MB at 8K vs any budget).  The per-kernel raise
        # covers every plane size whose output fits physical VMEM;
        # ops/temporal._use_windowed_kernel size-gates the rest back to
        # the XLA scan form.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(wins, tdi, tdj)
    out = out.transpose(1, 0, 2, 3).reshape(2, g * R, w)[:, :h]
    return out[0], out[1]
