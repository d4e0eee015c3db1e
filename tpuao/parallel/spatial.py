"""Spatial (row-band) sharding of ONE large frame across a chip mesh.

SURVEY.md SS6 'Long-context / sequence parallelism': the reference has no
sequences; its structural analog is scaling the *pixel* dimension.  For
frames too large for one chip (or latency-critical single frames), the image
is sharded into horizontal bands over a 1-D mesh, and each chip exchanges a
fixed halo band with its neighbors over ICI via ``jax.lax.ppermute`` -- the
only collectives in the program, each moving HALO*W floats to an adjacent
chip.  AO stencils are local (max reach ~300 full-res rows through the
4-level hierarchy), so no ring/all-gather is ever needed.

Edge semantics: the frame is treated as edge-replicated by HALO rows at the
top/bottom (chips 0 / n-1 synthesize their outer halo by replicating their
boundary row).  The result is therefore bit-equal to running the
single-device pipeline on the HALO-padded frame and cropping -- which is
what the correctness test asserts -- and differs from the unpadded
single-device pipeline only within stencil reach of the top/bottom frame
edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams

ROW_AXIS = "rows"

# Halo rows exchanged with each neighbor at the default hierarchy_depth=4
# (== stencil_halo_rows(AOParams()); kept as a named constant for tests and
# capacity planning docs).  The actual halo is derived per-params below.
HALO_ROWS = 320


def stencil_halo_rows(params) -> int:
    """Pipeline stencil reach in full-res rows, rounded up to 64.

    Derived from ``params`` instead of a fixed constant (VERDICT r2 item 4:
    a depth-2 preset should row-shard a 1080p frame 8-way instead of paying
    the depth-4 halo).  Components, in full-res rows:

    * render disc at the coarsest level d: max offset 4 slice texels *
      stride 4 = 16 level-d texels = ``16 * 2^d`` rows;
    * upsample chain (when blur is enabled): per step at level l, the 3x3
      noise filter (1 lo texel) + the corner-aligned bilateral tap (1 lo
      texel) reach 2 level-l texels = ``2 * 2^l`` rows, summed over the
      chain l = 1..d.

    The 64-multiple keeps every pyramid level's downsample grid and the
    4x4 deinterleave parity aligned with the global frame (band starts stay
    64-aligned).  d=4 gives 256 + 60 -> 320, the historical HALO_ROWS.
    """
    d = params.hierarchy_depth
    reach = 16 * (1 << d)
    if params.enable_blur:
        reach += sum(2 * (1 << l) for l in range(1, d + 1))
    return -(-reach // 64) * 64


def make_row_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    from tpuao.parallel.sharding import make_1d_mesh

    return make_1d_mesh(ROW_AXIS, n_devices, devices)


def edge_pad_rows(x, target_h: int, axis: int):
    """Edge-pad ``x`` along ``axis`` to ``target_h`` rows by replicating
    the last row (the auto_pad rule shared by the 1-D/2-D/sections modes).
    Dtype-preserving (color frames may be integer)."""
    x = jnp.asarray(x)
    h = x.shape[axis]
    if h == target_h:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, target_h - h)
    return jnp.pad(x, cfg, mode="edge")


def pad_rows_aligned(x, n_bands: int, axis: int):
    """Edge-pad rows to the next multiple of ``64 * n_bands`` (the row-
    sharding alignment rule, defined once for the 1-D and 2-D modes)."""
    mult = 64 * n_bands
    ha = -(-x.shape[axis] // mult) * mult
    return edge_pad_rows(x, ha, axis)


@functools.lru_cache(maxsize=None)
def _crop_jit(h: int, axis: int, sharding):
    idx = tuple([slice(None)] * axis + [slice(0, h)])
    return jax.jit(
        lambda o: jax.lax.with_sharding_constraint(o[idx], sharding))


def crop_rows_sharded(out, h: int, mesh: Mesh, spec, axis: int = 0):
    """Crop a sharded result back to ``h`` along ``axis`` without
    collapsing its sharding where JAX can express it: a plain ``out[:h]``
    outside jit gathers the array replicated onto every device (measured:
    PartitionSpec() on the result), defeating the point of sharding a
    frame too large for one chip.  Cropping under jit with an explicit
    sharding constraint keeps the layout WHEN ``h`` divides the mesh
    size evenly (every standard resolution on power-of-2 meshes: 1080/
    2160/4320 rows on 2..8 chips).  A non-divisible ``h`` still returns
    the correct value but replicated — JAX cannot express uneven or
    empty shards (measured: 1001 rows on 4 devices -> PartitionSpec());
    keep target heights at mesh multiples when the output must stay
    distributed.  The jitted crop is cached per (h, axis, sharding) so
    streaming misaligned frames compiles once."""
    if out.shape[axis] == h:
        return out
    return _crop_jit(h, axis, NamedSharding(mesh, spec))(out)


def halo_extend_rows(d, halo: int, n: int, axis: int):
    """Extend a row-sharded local block with its neighbors' halo rows.

    Runs inside ``shard_map`` over a mesh with a ``ROW_AXIS`` dimension of
    size ``n``: each chip ppermutes its boundary rows to its neighbors
    (the only collectives in the frame program, ICI-neighbor traffic
    only); chips 0 / n-1 synthesize the outer halo by replicating their
    boundary row.  ``axis`` is the row axis of the local block — works
    for (rows, W) frames and (views, rows, W) view blocks alike, and the
    exchange moves the whole block at once (collectives don't scale with
    views).  Shared by the 1-D spatial and 2-D grid modes.
    """
    idx = lax.axis_index(ROW_AXIS)

    def take(s):
        t = [slice(None)] * d.ndim
        t[axis] = s
        return d[tuple(t)]

    from_above = lax.ppermute(take(slice(-halo, None)), ROW_AXIS,
                              perm=[(i, i + 1) for i in range(n - 1)])
    from_below = lax.ppermute(take(slice(0, halo)), ROW_AXIS,
                              perm=[(i + 1, i) for i in range(n - 1)])
    reps = [1] * d.ndim
    reps[axis] = halo
    top_edge = jnp.tile(take(slice(0, 1)), reps)
    bot_edge = jnp.tile(take(slice(-1, None)), reps)
    top = jnp.where(idx == 0, top_edge, from_above)
    bot = jnp.where(idx == n - 1, bot_edge, from_below)
    return jnp.concatenate([top, d, bot], axis=axis)


def crop_debug_rows(dbg, halo: int, band: int, row_axis: int = -2):
    """Crop every debug-pyramid leaf to its band (halo rows removed).

    Leaves live at level scales 1/2^l of the halo-extended local frame;
    the scale is recovered from each leaf's row count (ext rows, halo and
    band are all 64-multiples, so every division below is exact)."""
    ext = band + 2 * halo

    def crop(x):
        scale = ext // x.shape[row_axis]
        idx = [slice(None)] * x.ndim
        idx[row_axis] = slice(halo // scale, (halo + band) // scale)
        return x[tuple(idx)]

    return jax.tree_util.tree_map(crop, dbg)


def render_frame_spatial(depth, camera=None, params=None,
                         mesh: Mesh | None = None, impl: str = "jnp",
                         halo_rows: int | None = None,
                         auto_pad: bool = True, normals=None, color=None,
                         out_dtype: str = "float32",
                         debug_outputs: bool = False):
    """Render one (H, W) frame sharded into row bands across ``mesh``.

    H must be divisible by 64 * mesh size; with ``auto_pad`` (default) a
    misaligned frame is edge-padded at the bottom to the next aligned
    height and the result cropped back -- e.g. real 8K (4320 rows, padded
    4352) is not 8-way alignable and becomes 4608 here.  Padding rows
    replicate the last row, matching the module's edge-replication
    convention; aligned frames pass through untouched.  Returns the
    full-res AO with the same row sharding (the crop keeps the row
    layout via a sharding constraint; the last band is simply shorter).
    ``halo_rows`` defaults to the derived stencil reach
    (``stencil_halo_rows(params)``); smaller values trade band-boundary
    exactness for smaller exchanges (compile-validation dryruns use 64).

    Full ``render_frame`` feature parity (VERDICT r2 item 3): ``normals``
    (H, W, 3) shards and halo-exchanges like depth; ``color`` (H, W[, C])
    shards rows with no halo (the composite is local); ``out_dtype``
    quantizes per chip; ``debug_outputs=True`` additionally returns the
    intermediate-pyramid dict, each leaf row-sharded and halo-cropped to
    its band (under ``auto_pad`` the debug leaves keep the padded height
    -- they are diagnostic buffers, only the primary output is cropped).
    """
    camera = camera or CameraParams()
    params = params or AOParams()
    if halo_rows is None:
        halo_rows = stencil_halo_rows(params)
    mesh = mesh or make_row_mesh()
    n = mesh.devices.size
    h, w = depth.shape
    if normals is not None:
        # canonicalize BEFORE any row padding: pad_rows_aligned on a
        # channel-first (3, H, W) buffer would edge-pad the size-3
        # channel axis (review r3)
        from tpuao.ops.render import normals_channel_last

        normals = normals_channel_last(jnp.asarray(normals, jnp.float32))
    if auto_pad and h % (64 * n):
        res = render_frame_spatial(
            pad_rows_aligned(depth, n, 0), camera, params, mesh=mesh,
            impl=impl, halo_rows=halo_rows, auto_pad=False,
            normals=None if normals is None
            else pad_rows_aligned(normals, n, 0),
            color=None if color is None else pad_rows_aligned(color, n, 0),
            out_dtype=out_dtype, debug_outputs=debug_outputs)
        out, dbg = res if debug_outputs else (res, None)
        spec = (P(ROW_AXIS, None, None) if out.ndim == 3
                else P(ROW_AXIS, None))
        out = crop_rows_sharded(out, h, mesh, spec, axis=0)
        return (out, dbg) if debug_outputs else out
    assert halo_rows % 64 == 0, halo_rows
    assert h % (64 * n) == 0, (
        f"H={h} must be a multiple of 64*mesh ({64 * n}); pad the frame")
    assert h // n >= halo_rows, (
        f"band height {h // n} < halo {halo_rows}: the single-neighbor "
        f"exchange needs bands at least one halo tall (use fewer chips)")

    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    depth = put(jnp.asarray(depth, jnp.float32), P(ROW_AXIS, None))
    if normals is not None:
        from tpuao.ops.render import normals_channel_last

        normals = put(normals_channel_last(jnp.asarray(normals,
                                                       jnp.float32)),
                      P(ROW_AXIS, None, None))
    color_ndim = 0
    if color is not None:
        color = jnp.asarray(color)
        color_ndim = color.ndim
        color = put(color, P(ROW_AXIS, *([None] * (color_ndim - 1))))
    # camera/params ride as traced jit ARGUMENTS (replicated), so tunable
    # changes and repeat calls hit the cached compiled program instead of
    # retracing -- the engine's no-recompile contract, for this mode too
    local_px = (h // n + 2 * halo_rows) * w
    return _spatial_jit(mesh, n, halo_rows, impl, local_px,
                        normals is not None, color_ndim, out_dtype,
                        debug_outputs)(depth, normals, color, camera, params)


@functools.lru_cache(maxsize=None)
def _spatial_jit(mesh: Mesh, n: int, halo: int, impl: str, local_px: int,
                 with_normals: bool = False, color_ndim: int = 0,
                 out_dtype: str = "float32", debug: bool = False):
    from tpuao.models.pipeline import _quantize
    from tpuao.ops import composite as C
    from tpuao.utils.xla_opts import tpu_compiler_options

    def per_chip(d_local, nrm, col, camera, params):  # (h/n, W)
        band = d_local.shape[0]
        ext = halo_extend_rows(d_local, halo, n, axis=0)
        nrm_ext = (halo_extend_rows(nrm, halo, n, axis=0)
                   if nrm is not None else None)
        ao_ext, dbg = ao_pipeline(ext, camera, params, nrm_ext, impl=impl)
        ao = ao_ext[halo: halo + band, :]
        out = ao if col is None else C.composite(col, ao)
        out = _quantize(out, out_dtype)
        if debug:
            return out, crop_debug_rows(dbg, halo, band)
        return out

    spec_n = P(ROW_AXIS, None, None) if with_normals else P()
    spec_c = (P(ROW_AXIS, *([None] * (color_ndim - 1))) if color_ndim
              else P())
    spec_out = (P(ROW_AXIS, None, None) if color_ndim == 3
                else P(ROW_AXIS, None))
    out_specs = ((spec_out, P(ROW_AXIS, None)) if debug else spec_out)
    fn = jax.shard_map(per_chip, mesh=mesh,
                       in_specs=(P(ROW_AXIS, None), spec_n, spec_c,
                                 P(), P()),
                       out_specs=out_specs)
    # scoped-VMEM budget by the PER-CHIP working set (band + halos) --
    # that's the frame size each chip's program actually sees
    return jax.jit(fn, compiler_options=tpu_compiler_options(local_px,
                                                             with_normals))
