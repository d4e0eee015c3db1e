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


def make_1d_mesh(axis: str, n_devices: int | None = None,
                 devices=None) -> Mesh:
    """1-D device mesh over ``axis`` (shared by the view and row modes).

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
    return Mesh(np.asarray(devices), (axis,))


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the view axis."""
    return make_1d_mesh(VIEW_AXIS, n_devices, devices)


def scan_optional(one, xs, unroll_cap: int = 8, extra=()):
    """``lax.scan`` of ``one(*items)`` over the leading axis of ``xs``.

    ``xs`` is a tuple where ``None`` entries stand for absent inputs
    (normals/color are optional in every parallel mode); ``one`` receives
    one leading-axis slice per present entry and ``None`` for the rest,
    followed by one slice per ``extra`` pytree (always present; used for
    per-view camera/params whose LEAVES carry the leading view axis).
    A single-item axis skips the scan entirely.  Partial unroll removes
    the scan's per-iteration slicing overhead (measured 0.392 ->
    0.359 ms/view for 8 views on one chip), capped so compile time stays
    bounded.  Shared by the views-sharded and 2-D grid modes.
    """
    n = xs[0].shape[0]
    if n == 1:
        res = one(*(None if x is None else x[0] for x in xs),
                  *jax.tree_util.tree_map(lambda a: a[0], tuple(extra)))
        return jax.tree_util.tree_map(lambda a: a[None], res)
    present = tuple(x for x in xs if x is not None)

    def body(c, sl):
        arrs, ext = sl
        it = iter(arrs)
        return c, one(*[None if x is None else next(it) for x in xs],
                      *ext)

    return jax.lax.scan(body, None, (present, tuple(extra)),
                        unroll=min(int(n), unroll_cap))[1]


def pad_leading(x, pad: int):
    """Pad a leading axis by replicating the last entry ``pad`` times
    (the uneven-view-count alignment used by every sharded mode)."""
    reps = (pad,) + (1,) * (x.ndim - 1)
    return jnp.concatenate([x, jnp.tile(x[-1:], reps)], axis=0)


def render_views(depths, camera=None, params=None, normals=None,
                 impl: str = "auto"):
    """vmap of the frame program over a leading views axis (no sharding).

    Mainly a building block for collective-audit tests; for color /
    out_dtype / debug on an unsharded batch use ``render_frame`` (which
    handles leading batch axes natively), and for multi-chip execution
    ``render_views_sharded``.
    """
    camera = camera or CameraParams()
    params = params or AOParams()

    def one(d, n):
        return ao_pipeline(d, camera, params, n, impl=impl)[0]

    if normals is None:
        return jax.vmap(lambda d: one(d, None))(depths)
    return jax.vmap(one)(depths, normals)


def render_views_sharded(depths, camera=None, params=None, normals=None,
                         mesh: Mesh | None = None, impl: str = "auto",
                         color=None, out_dtype: str = "float32",
                         debug_outputs: bool = False,
                         per_view: bool = False):
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

    A view count that does not divide the mesh (e.g. 9 views on 8 chips,
    VERDICT r2 item 8) is padded to the next mesh multiple by replicating
    the last view; the RENDER runs fully sharded on the padded batch and
    the pad views are dropped afterwards, so alignment is never the
    caller's problem.  Caveat: JAX cannot express an uneven view sharding
    (9 over 8 leaves devices with empty shards; ``jit out_shardings``
    requires divisibility), so the cropped result of an uneven batch may
    come back replicated -- use mesh-multiple batches when the *output*
    must stay distributed.

    Full ``render_frame`` feature parity: ``color`` (V, H, W[, C]) shards
    over views (the composite is per-chip local); ``out_dtype`` quantizes
    per chip; ``debug_outputs=True`` additionally returns the debug dict,
    every leaf view-sharded.  Under the uneven-count pad, debug leaves
    keep the PADDED view count (they are diagnostic buffers; only the
    primary output is cropped -- same convention as the spatial/grid
    modes' padded-height debug leaves).

    ``per_view=True`` renders a heterogeneous CAMERA RIG: every traced
    leaf of ``camera`` and ``params`` must be a ``(V,)`` array (each view
    its own near/far/FOV and tunables -- the reference's one-component-
    per-camera deployment, which a shared-scalar batch cannot express).
    The leaves shard over the view axis like the frames; structure knobs
    (hierarchy_depth etc.) stay global.  Per-rig values are still traced
    scalars per view: changing them reuses the compiled program.
    """
    camera = camera or CameraParams()
    params = params or AOParams()
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n = depths.shape[0]
    if per_view:
        def fix(leaf):
            leaf = jnp.asarray(leaf, jnp.float32)
            if leaf.ndim != 1 or leaf.shape[0] != n:
                raise ValueError(
                    f"per_view=True needs every camera/params leaf "
                    f"shaped ({n},), got {leaf.shape}")
            return leaf

        camera = jax.tree_util.tree_map(fix, camera)
        params = jax.tree_util.tree_map(fix, params)
    if n % n_dev:
        pad = -(-n // n_dev) * n_dev - n
        pad_views = functools.partial(pad_leading, pad=pad)
        res = render_views_sharded(
            pad_views(jnp.asarray(depths)),
            jax.tree_util.tree_map(pad_views, camera) if per_view
            else camera,
            jax.tree_util.tree_map(pad_views, params) if per_view
            else params,
            normals=None if normals is None
            else pad_views(jnp.asarray(normals)),
            mesh=mesh, impl=impl,
            color=None if color is None else pad_views(jnp.asarray(color)),
            out_dtype=out_dtype, debug_outputs=debug_outputs,
            per_view=per_view)
        out, dbg = res if debug_outputs else (res, None)
        from tpuao.parallel.spatial import crop_rows_sharded

        spec = P(VIEW_AXIS, *([None] * (out.ndim - 1)))
        out = crop_rows_sharded(out, n, mesh, spec, axis=0)
        return (out, dbg) if debug_outputs else out

    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    depths = put(jnp.asarray(depths, jnp.float32), P(VIEW_AXIS, None, None))
    if normals is not None:
        normals = put(jnp.asarray(normals, jnp.float32),
                      P(VIEW_AXIS, None, None, None))
    color_ndim = 0
    if color is not None:
        color = jnp.asarray(color)
        color_ndim = color.ndim
        color = put(color, P(VIEW_AXIS, *([None] * (color_ndim - 1))))

    # camera/params ride as traced jit arguments: repeat calls and tunable
    # changes reuse the cached compiled program (no per-call retrace)
    local_px = depths.shape[-2] * depths.shape[-1]  # per-view frame size
    return _sharded_jit(mesh, normals is not None, impl, local_px,
                        color_ndim, out_dtype, debug_outputs, per_view)(
        depths, normals, color, camera, params)


def _sharded_views_args_fn(mesh: Mesh, with_normals: bool, impl: str,
                           color_ndim: int = 0,
                           out_dtype: str = "float32", debug: bool = False,
                           per_view: bool = False):
    """The shard_map program taking (depths, normals, color, camera,
    params)."""
    from tpuao.models.pipeline import _quantize
    from tpuao.ops import composite as C

    def one(d, nrm, col, camera, params):
        ao, dbg = ao_pipeline(d, camera, params, nrm, impl=impl)
        out = ao if col is None else C.composite(col, ao)
        out = _quantize(out, out_dtype)
        return (out, dbg) if debug else out

    def per_chip(d, nrm, col, camera, params):
        # scan of the unbatched program over the local views; with
        # per_view rigs the camera/params leaves carry the local view
        # axis and are scanned alongside the frames
        if per_view:
            return scan_optional(one, (d, nrm, col),
                                 extra=(camera, params))
        return scan_optional(
            lambda d_, n_, c_: one(d_, n_, c_, camera, params),
            (d, nrm, col))

    spec_c = (P(VIEW_AXIS, *([None] * (color_ndim - 1))) if color_ndim
              else P())
    spec_out = P(VIEW_AXIS, None, None, *(
        [None] if color_ndim == 4 else []))
    out_specs = ((spec_out, P(VIEW_AXIS, None, None)) if debug
                 else spec_out)
    spec_cfg = P(VIEW_AXIS) if per_view else P()
    return jax.shard_map(
        per_chip, mesh=mesh,
        in_specs=(P(VIEW_AXIS, None, None),
                  P(VIEW_AXIS, None, None, None) if with_normals else P(),
                  spec_c, spec_cfg, spec_cfg),
        out_specs=out_specs,
    )


@functools.lru_cache(maxsize=None)
def _sharded_jit(mesh: Mesh, with_normals: bool, impl: str, local_px: int,
                 color_ndim: int = 0, out_dtype: str = "float32",
                 debug: bool = False, per_view: bool = False):
    from tpuao.utils.xla_opts import tpu_compiler_options

    return jax.jit(_sharded_views_args_fn(mesh, with_normals, impl,
                                          color_ndim, out_dtype, debug,
                                          per_view),
                   compiler_options=tpu_compiler_options(local_px,
                                                         with_normals))


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
        return sm(depths, normals, None, camera, params)

    return fn


# ---------------------------------------------------------------------------
# Fleet temporal accumulation: V independent sequences, view-sharded
# ---------------------------------------------------------------------------


def render_sequences_temporal_sharded(depths, camera=None, params=None,
                                      tparams=None, motions=None,
                                      normals=None, mesh: Mesh | None = None,
                                      impl: str = "auto",
                                      out_dtype: str = "float32",
                                      resolve_level: int = 0):
    """V independent temporal sequences sharded over the view axis.

    The fleet-serving shape of the temporal mode (spec:
    ``golden/temporal.py``): ``depths`` is (V, T, H, W) -- V cameras each
    streaming a T-frame sequence.  Each chip runs the whole-sequence
    ``lax.scan`` program (``render_sequence_temporal``'s core: pipeline +
    reprojection resolve fused per frame, history carried on-device) over
    its local views, so the entire fleet's T*V frames execute in ONE
    launch with zero host round-trips AND zero collectives -- sequences
    are temporally dependent *within* a view but embarrassingly parallel
    *across* views, exactly the sharding/scan split.

    ``motions`` is None (static cameras), (V, T, 4, 4) per-view eye
    transforms (``motions[v, t]`` maps view v's frame t to its frame
    t-1), or per-pixel motion-vector buffers (V, T, H, W, 2) /
    (V, T, 2, H, W) (the object-motion path, spec in golden/temporal.py);
    ``normals`` is optional (V, T, H, W, 3).  An uneven view count
    pads by replicating the last sequence and crops after (the cropped
    result may come back replicated -- the same inexpressible-uneven-
    sharding caveat as ``render_views_sharded``).  Returns the
    (V, T, H, W) resolved stack, view-sharded when V divides the mesh.
    ``resolve_level``: see ``render_frame_temporal`` (0 = full-res spec,
    1 = half-res level-1 resolve; per-chip history carry is then
    half-res, halving the scan carry traffic too).
    """
    from tpuao.params import TemporalParams

    camera = camera or CameraParams()
    params = params or AOParams()
    tparams = tparams or TemporalParams()
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    depths = jnp.asarray(depths, jnp.float32)
    if depths.ndim != 4:
        raise ValueError(f"depths must be (V, T, H, W), got {depths.shape}")
    v, t = depths.shape[:2]
    if motions is not None:
        motions = jnp.asarray(motions, jnp.float32)
        h_n, w_n = depths.shape[-2:]
        ok = (motions.shape == (v, t, 4, 4)
              or motions.shape == (v, t, h_n, w_n, 2)
              or motions.shape == (v, t, 2, h_n, w_n))
        if not ok:
            raise ValueError(
                f"motions must be ({v}, {t}, 4, 4) eye transforms or "
                f"({v}, {t}, {h_n}, {w_n}, 2) / ({v}, {t}, 2, {h_n}, "
                f"{w_n}) motion-vector buffers, got {motions.shape}")
    if normals is not None:
        normals = jnp.asarray(normals, jnp.float32)

    if v % n_dev:
        pad = -(-v // n_dev) * n_dev - v
        pad_views = functools.partial(pad_leading, pad=pad)
        out = render_sequences_temporal_sharded(
            pad_views(depths), camera, params, tparams,
            motions=None if motions is None else pad_views(motions),
            normals=None if normals is None else pad_views(normals),
            mesh=mesh, impl=impl, out_dtype=out_dtype,
            resolve_level=resolve_level)
        from tpuao.parallel.spatial import crop_rows_sharded

        return crop_rows_sharded(out, v, mesh,
                                 P(VIEW_AXIS, *([None] * (out.ndim - 1))),
                                 axis=0)

    put = lambda x, nd: (None if x is None else jax.device_put(
        x, NamedSharding(mesh, P(VIEW_AXIS, *([None] * (nd - 1))))))
    depths = put(depths, 4)
    motions = put(motions, None if motions is None else motions.ndim)
    normals = put(normals, 5)
    local_px = depths.shape[-2] * depths.shape[-1]
    return _temporal_sharded_jit(
        mesh, False if motions is None else motions.ndim,
        normals is not None, impl, local_px,
        out_dtype, resolve_level)(depths, motions, normals, camera, params,
                                  tparams)


@functools.lru_cache(maxsize=None)
def _temporal_sharded_core(mesh: Mesh, with_motions: bool,
                           with_normals: bool, impl: str, out_dtype: str,
                           resolve_level: int = 0):
    """The UN-jitted fleet shard_map (scan-of-scans per chip).  Split out
    of ``_temporal_sharded_jit`` so callers that compose it under their
    own top-level jit (the bench's timing chain) can: jax forbids
    ``compiler_options`` on nested jits, so the jitted form below cannot
    be wrapped."""
    from tpuao.models.pipeline import _sequence_scan_core

    def per_chip(d, mot, nrm, camera, params, tparams):
        # scan of the whole-sequence program over the chip's local views;
        # the T-scan's null-history carry must be cast to the view axis's
        # varying type (shard_map rejects a device-invariant scan carry)
        from tpuao.models.pipeline import _temporal_state_shape
        from tpuao.ops.temporal import initial_state

        init = jax.lax.pcast(
            initial_state(*_temporal_state_shape(*d.shape[-2:],
                                                 resolve_level)),
            (VIEW_AXIS,), to="varying")
        return scan_optional(
            lambda d_, m_, n_: _sequence_scan_core(
                d_, m_, n_, camera, params, tparams, impl, out_dtype,
                init=init, resolve_level=resolve_level),
            (d, mot, nrm))

    # with_motions: False/None = no motions; True = (V, T, 4, 4) eye
    # transforms (rank 4, the back-compat spelling); an int = the motions
    # rank (5 for per-pixel motion-vector buffers (V, T, H, W, 2) or
    # (V, T, 2, H, W))
    m_rank = 4 if with_motions is True else (with_motions or 0)
    return jax.shard_map(
        per_chip, mesh=mesh,
        in_specs=(P(VIEW_AXIS, None, None, None),
                  P(VIEW_AXIS, *([None] * (m_rank - 1))) if m_rank else P(),
                  (P(VIEW_AXIS, None, None, None, None)
                   if with_normals else P()),
                  P(), P(), P()),
        out_specs=P(VIEW_AXIS, None, None, None),
    )


@functools.lru_cache(maxsize=None)
def _temporal_sharded_jit(mesh: Mesh, with_motions: bool, with_normals: bool,
                          impl: str, local_px: int, out_dtype: str,
                          resolve_level: int = 0):
    from tpuao.utils.xla_opts import tpu_compiler_options

    sm = _temporal_sharded_core(mesh, with_motions, with_normals, impl,
                                out_dtype, resolve_level)
    return jax.jit(sm, compiler_options=tpu_compiler_options(local_px,
                                                             with_normals))
