"""2-D mesh execution: views x row-bands on one device grid.

Composes the two 1-D modes (``parallel/sharding.py`` data-parallel views,
``parallel/spatial.py`` row-band spatial sharding) on a single 2-D
``jax.sharding.Mesh``: the view axis is embarrassingly parallel (zero
collectives), the row axis exchanges a fixed halo with mesh neighbors via
``lax.ppermute`` -- ICI-neighbor traffic only, exactly as in the 1-D
spatial mode.  This is the deployment shape for a pod slice rendering
several large frames at once (e.g. 2 views x 4 bands on a v5e-8: each 8K
frame is split across 4 chips while 2 frames run concurrently).

The halo exchange happens once per chip for its whole local view block
(the band slices are taken across all local views before ``lax.map``), so
adding views does not add collectives.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.parallel.sharding import VIEW_AXIS
from tpuao.parallel.spatial import (
    ROW_AXIS,
    crop_rows_sharded,
    halo_extend_rows,
    pad_rows_aligned,
    stencil_halo_rows,
)


def make_grid_mesh(n_views: int, n_bands: int, devices=None) -> Mesh:
    """(views, rows) 2-D mesh over the first n_views*n_bands devices."""
    if devices is None:
        devices = jax.devices()
    need = n_views * n_bands
    if len(devices) < need:
        raise ValueError(f"grid {n_views}x{n_bands} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_views, n_bands)
    return Mesh(grid, (VIEW_AXIS, ROW_AXIS))


def render_views_spatial(depths, camera=None, params=None,
                         mesh: Mesh | None = None, impl: str = "jnp",
                         halo_rows: int | None = None,
                         auto_pad: bool = True):
    """(V, H, W) depth batch -> (V, H, W) AO on a 2-D views x rows mesh.

    Constraints (same as the 1-D modes they compose): V divisible by the
    view-mesh size; H divisible by 64 * row-mesh size (``auto_pad``
    edge-pads misaligned heights and crops back, as in
    ``render_frame_spatial``); bands at least one halo tall.  Edge
    semantics match ``render_frame_spatial``: the frame is
    edge-replicated by ``halo_rows`` at top/bottom, so per view the result
    is bit-equal to the single-device pipeline on the halo-padded frame,
    cropped.
    """
    camera = camera or CameraParams()
    params = params or AOParams()
    if halo_rows is None:
        halo_rows = stencil_halo_rows(params)
    if mesh is None:
        mesh = make_grid_mesh(1, len(jax.devices()))
    nv = mesh.shape[VIEW_AXIS]
    nr = mesh.shape[ROW_AXIS]
    v, h, w = depths.shape
    halo = halo_rows
    if auto_pad and h % (64 * nr):
        out = render_views_spatial(pad_rows_aligned(depths, nr, 1), camera,
                                   params, mesh=mesh, impl=impl,
                                   halo_rows=halo_rows, auto_pad=False)
        return crop_rows_sharded(out, h, mesh,
                                 P(VIEW_AXIS, ROW_AXIS, None), axis=1)
    assert v % nv == 0, f"views {v} not divisible by view mesh {nv}"
    assert halo % 64 == 0, halo
    assert h % (64 * nr) == 0, (
        f"H={h} must be a multiple of 64*row-mesh ({64 * nr}); pad the frame")
    assert h // nr >= halo, (
        f"band height {h // nr} < halo {halo}: use fewer row bands")

    spec = NamedSharding(mesh, P(VIEW_AXIS, ROW_AXIS, None))
    depths = jax.device_put(jnp.asarray(depths, jnp.float32), spec)
    # camera/params as traced jit arguments -> repeat calls and tunable
    # changes reuse the cached compiled program (see sharding.py)
    local_px = (h // nr + 2 * halo) * w  # per-chip band working set
    return _grid_jit(mesh, nr, halo, impl, local_px)(depths, camera, params)


@functools.lru_cache(maxsize=None)
def _grid_jit(mesh: Mesh, nr: int, halo: int, impl: str, local_px: int):
    from tpuao.utils.xla_opts import tpu_compiler_options

    def per_chip(d, camera, params):  # (v/nv, h/nr, W)
        # one block-wide halo exchange with the row neighbors (per local
        # view block, not per view: collectives don't scale with views)
        ext = halo_extend_rows(d, halo, nr, axis=1)

        def one(e):  # unbatched frame program per local view (see
            # sharding.py: measured faster than vmap batching on TPU)
            ao = ao_pipeline(e, camera, params, None, impl=impl)[0]
            return ao[halo: halo + d.shape[1], :]

        if ext.shape[0] == 1:
            return one(ext[0])[None]
        unroll = min(int(ext.shape[0]), 8)  # see sharding.py per_chip note
        return lax.scan(lambda c, e: (c, one(e)), None, ext,
                        unroll=unroll)[1]

    fn = jax.shard_map(per_chip, mesh=mesh,
                       in_specs=(P(VIEW_AXIS, ROW_AXIS, None), P(), P()),
                       out_specs=P(VIEW_AXIS, ROW_AXIS, None))
    return jax.jit(fn, compiler_options=tpu_compiler_options(local_px))
