"""Multi-view / multi-chip execution (SURVEY.md SS6 'Distributed comm
backend', [BJ] config 5).

The reference is single-GPU single-frame; its only parallel axes are thread
groups + the 16-slice deinterleave.  The TPU-native scale-out axis is the
*view/frame batch*: ``vmap`` the per-frame program over a leading axis and
shard that axis across a ``jax.sharding.Mesh`` with ``NamedSharding``.  AO is
embarrassingly parallel across views, so XLA inserts **zero collectives** in
the frame hot path -- each chip renders its views from HBM-resident inputs
(the design SURVEY.md SS6 prescribes: collectives only if outputs are
gathered).

Works identically on one real TPU chip (mesh of 1), a v5e-8 slice, or the
8-device CPU simulation used by tests and the driver's dryrun.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams

VIEW_AXIS = "views"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the view axis.

    Raises when ``n_devices`` exceeds the available devices (silent
    truncation would let a 'multi-chip' run quietly execute on a smaller
    mesh than requested, as ``make_grid_mesh`` already guards)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"mesh of {n_devices} devices requested, "
                             f"have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (VIEW_AXIS,))


def render_views(depths, camera=None, params=None, normals=None,
                 impl: str = "auto"):
    """vmap of the frame program over a leading views axis (no sharding)."""
    camera = camera or CameraParams()
    params = params or AOParams()

    def one(d, n):
        return ao_pipeline(d, camera, params, n, impl=impl)[0]

    if normals is None:
        return jax.vmap(lambda d: one(d, None))(depths)
    return jax.vmap(one)(depths, normals)


def render_views_sharded(depths, camera=None, params=None, normals=None,
                         mesh: Mesh | None = None, impl: str = "auto"):
    """[BJ] config 5: batched multi-view AO sharded across a device mesh.

    Inputs are placed with NamedSharding(P('views')) so each chip holds and
    renders only its shard; the output stays sharded the same way (callers
    can ``jax.device_get`` to gather).  Pure data parallel over ICI -- no
    collectives in the compiled program.

    The per-chip program is built with ``shard_map`` on the *unbatched*
    frame pipeline -- measured 1.8x faster per view than the vmapped batch
    (vmap batches the strided relayouts badly on TPU).  When a chip holds
    more than one view, its local shard runs through ``lax.map`` (a scan of
    the same unbatched program), so the per-view cost stays at the
    single-frame cost instead of paying the vmap batching penalty
    (VERDICT r1 item 3).
    """
    camera = camera or CameraParams()
    params = params or AOParams()
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n = depths.shape[0]
    assert n % n_dev == 0, (
        f"view count {n} not divisible by mesh size {n_dev}")

    spec_d = NamedSharding(mesh, P(VIEW_AXIS, None, None))
    depths = jax.device_put(jnp.asarray(depths, jnp.float32), spec_d)
    if normals is not None:
        spec_n = NamedSharding(mesh, P(VIEW_AXIS, None, None, None))
        normals = jax.device_put(jnp.asarray(normals, jnp.float32), spec_n)

    # camera/params ride as traced jit arguments: repeat calls and tunable
    # changes reuse the cached compiled program (no per-call retrace)
    local_px = depths.shape[-2] * depths.shape[-1]  # per-view frame size
    return _sharded_jit(mesh, normals is not None, impl, local_px)(
        depths, normals, camera, params)


def _sharded_views_args_fn(mesh: Mesh, with_normals: bool, impl: str):
    """The shard_map program taking (depths, normals, camera, params)."""

    def one(d, nrm, camera, params):
        return ao_pipeline(d, camera, params, nrm, impl=impl)[0]

    def per_chip(d, nrm, camera, params):
        if d.shape[0] == 1:
            return one(d[0], None if nrm is None else nrm[0],
                       camera, params)[None]
        # scan of the unbatched program; partial unroll removes the scan's
        # per-iteration slicing overhead (measured 0.392 -> 0.359 ms/view
        # for 8 views on one chip), capped so compile time stays bounded
        unroll = min(int(d.shape[0]), 8)
        if nrm is None:
            return jax.lax.scan(
                lambda c, dd: (c, one(dd, None, camera, params)), None, d,
                unroll=unroll)[1]
        return jax.lax.scan(
            lambda c, a: (c, one(a[0], a[1], camera, params)), None,
            (d, nrm), unroll=unroll)[1]

    return jax.shard_map(
        per_chip, mesh=mesh,
        in_specs=(P(VIEW_AXIS, None, None),
                  P(VIEW_AXIS, None, None, None) if with_normals else P(),
                  P(), P()),
        out_specs=P(VIEW_AXIS, None, None),
    )


@functools.lru_cache(maxsize=None)
def _sharded_jit(mesh: Mesh, with_normals: bool, impl: str, local_px: int):
    from tpuao.utils.xla_opts import tpu_compiler_options

    return jax.jit(_sharded_views_args_fn(mesh, with_normals, impl),
                   compiler_options=tpu_compiler_options(local_px))


def sharded_views_fn(camera, params, mesh: Mesh, with_normals: bool = False,
                     impl: str = "auto"):
    """The jittable sharded multi-view program: (depths[, normals]) -> ao.

    Each chip runs the *unbatched* frame pipeline on its local shard --
    directly for one view per chip, via a scan of the same unbatched
    program when a chip holds several views.  Used by
    ``render_views_sharded`` (through the cached-jit wrapper) and by the
    bench harness (which needs the bare function for chain timing).
    """
    sm = _sharded_views_args_fn(mesh, with_normals, impl)

    def fn(depths, normals=None):
        return sm(depths, normals, camera, params)

    return fn
