"""Per-frame pipeline driver -- the TPU analog of ``AmbientOcclusion.cs``.

The reference's host layer (SURVEY.md SS2 L2-L4, SS4) records a command
buffer once (DownSample1 -> DownSample2 -> Render x4 -> Upsample x4 ->
Composite) and replays it per frame with zero host round-trips.  Here the
same DAG is a pure function traced once by ``jax.jit`` and replayed as one
XLA program per frame -- command-buffer recording and jit tracing are the
same idea (SURVEY.md SS2 'TPU-native mapping').

  * ``render_frame``          - pure functional entry point (jit-cached).
  * ``single_scale_ao``       - config-1 fast path (1/2-res, no blur).
  * ``AmbientOcclusionEngine``- stateful component-API analog: validated
    tunable properties (OnValidate), per-shape program cache (RT pyramid
    reallocation analog), debug view mode.

Tunables ride as traced scalars: changing them re-runs the same compiled
program (SURVEY.md SS4.3).  Changing resolution or static structure
(hierarchy_depth, normals on/off, blur on/off) compiles a new program, which
is cached -- the analog of RebuildCommandBuffers on screen-size change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuao.params import AOParams, CameraParams, padded_shape
from tpuao.ops import prepare as P
from tpuao.ops import render as R
from tpuao.ops import upsample as U
from tpuao.ops import composite as C


def _select_render_impl(impl: str):
    """'jnp' | 'pallas' | 'auto' -> per-level render function.

    'auto' keeps the XLA-fused jnp render (measured on-par with the Pallas
    kernel -- the stage is VPU-compute-bound -- without the halo-window
    prologue copies); 'pallas' forces the kernel."""
    if impl == "pallas":
        from tpuao.ops import pallas_kernels as PK

        return PK.render_ao_level
    return R.render_ao_level


def _select_upsample_impl(impl: str):
    """'auto' keeps the XLA-fused jnp step (measured on-par with the fused
    Pallas kernel in-pipeline: 0.86 vs 0.87 ms full-frame at 1080p);
    'pallas' forces the kernel."""
    if impl == "pallas":
        from tpuao.ops import pallas_kernels as PK

        return PK.blur_upsample_step
    return U.blur_upsample_step


def _pad_to_64(x, hp, wp):
    h, w = x.shape[-2:]
    if hp == h and wp == w:
        return x
    cfg = [(0, 0)] * (x.ndim - 2) + [(0, hp - h), (0, wp - w)]
    return jnp.pad(x, cfg, mode="edge")


def ao_pipeline(depth, camera, params, normals=None, impl: str = "auto"):
    """depth [+normals] -> (full-res AO, debug dict).  Jit-traceable core."""
    if depth.ndim > 2 and impl in ("pallas", "fused"):
        # The Pallas kernels are written for a single (H, W) frame; batch
        # them by vmapping the whole unbatched pipeline (the jnp path
        # handles leading batch axes natively).
        if normals is None:
            return jax.vmap(
                lambda d: ao_pipeline(d, camera, params, None, impl=impl)
            )(depth)
        return jax.vmap(
            lambda d, n: ao_pipeline(d, camera, params, n, impl=impl)
        )(depth, normals)
    h0, w0 = depth.shape[-2:]
    hp, wp = padded_shape(h0, w0)
    depth = _pad_to_64(depth.astype(jnp.float32), hp, wp)
    use_n = normals is not None and params.use_normals

    d = params.hierarchy_depth
    render_level = _select_render_impl(impl)

    with jax.named_scope("ao_prepare"):
        linz = P.linearize_depth(depth, camera)
        pyr = P.build_pyramid(linz, d)
        if use_n:
            # Tangent slopes g_x, g_y computed ONCE at full res (level-0
            # scale; render folds in the exact 2^level), then pick-one
            # pyramided as two rank-2 planes -- a (3, H, W) normals pyramid
            # costs ~10x more (rank-3 strided slices lower badly on TPU;
            # measured 0.25 ms vs 0.02 ms at 1080p, VERDICT r1 item 4 /
            # benchmarks/exp/normals_prologue.py).
            spyr = R.slope_pyramid(normals.astype(jnp.float32),
                                   camera.tan_half_fov_h, hp, wp, d,
                                   h0=h0, w0=w0)
        else:
            spyr = [None] * (d + 1)
        if use_n and impl == "pallas":
            # The Pallas kernel takes raw per-level normals (opt-in path;
            # it computes slopes in-kernel from SMEM scalars); accept
            # either layout like the jnp path does.  NOTE this prologue
            # builds a rank-3 normals pyramid by strided slicing -- the
            # exact pattern the slope-pyramid fix avoids (0.25 vs 0.02 ms
            # at 1080p, VERDICT r2 weak-item 6).  Kept deliberately: the
            # kernel's contract is the GOLDEN parity entry (per-level
            # normals, slopes derived in-kernel), and the whole
            # impl="pallas" path is a measured-slower tested variant, not
            # a perf path -- switching its prologue to slope planes would
            # change the kernel ABI to optimize a path nobody ships.
            # Perf-sensitive normals users get the slope pyramid via
            # impl="auto" above.
            ncl = R.normals_channel_last(normals.astype(jnp.float32))
            npad = jnp.moveaxis(jnp.pad(
                ncl,
                [(0, 0)] * (ncl.ndim - 3)
                + [(0, hp - h0), (0, wp - w0), (0, 0)], mode="edge"),
                -1, -3)
            npyr = [npad]
            for _ in range(d):
                npyr.append(npyr[-1][..., 0::2, :][..., :, 0::2])
        else:
            npyr = [None] * (d + 1)

    # impl="fused": the per-level render is fused with its chain step in one
    # Pallas kernel (depth-only; normals fall back), so only the coarsest
    # level renders standalone.
    fused = (impl == "fused" and not use_n and params.enable_blur)
    aos = {}
    for l in range(1, d + 1):
        if fused and l != d:
            continue
        with jax.named_scope(f"ao_render_l{l}"):
            # NOTE: a row-banded render (R.render_ao_level_banded) wins 17%
            # standalone on 8K's level 1 but loses that win in-pipeline
            # (11.17 -> 11.51 ms full 8K frame) -- the band stack breaks
            # fusion with the surrounding program.  Kept as a tested
            # variant, not wired into auto (docs/PERF.md '8K').
            if use_n and impl != "pallas":
                aos[l] = render_level(pyr[l], l, wp, camera, params,
                                      slopes_ds=spyr[l])
            else:
                aos[l] = render_level(pyr[l], l, wp, camera, params,
                                      npyr[l])

    debug = {"linear_z": linz, "ao_levels": aos,
             "pyramid": {l: pyr[l] for l in range(d + 1)}}

    if not params.enable_blur:
        # nearest 2x upsample = interleave of 4 identical planes (the
        # jnp.repeat form is the measured-slow minor-dim relayout); crop
        # in plane space when the target dims are even
        a = aos[1]
        if h0 % 2 == 0 and w0 % 2 == 0:
            a = a[..., : h0 // 2, : w0 // 2]
            return U.interleave2x2(a, a, a, a), debug
        ao = U.interleave2x2(a, a, a, a)
        return ao[..., :h0, :w0], debug

    # PreMin chain; a BlendOut wiring is algebraically identical (see golden
    # render_frame_golden note + test_blendout_wiring_identical).
    combined = aos[d]
    if fused:
        from tpuao.ops import pallas_kernels as PK

        combined = U.blur_upsample_step(combined, pyr[d], pyr[d - 1],
                                        params, wp)
        debug[f"combined_{d-1}"] = combined
        for l in range(d - 1, 0, -1):
            with jax.named_scope(f"ao_fused_l{l}"):
                combined = PK.fused_render_upsample_step(
                    pyr[l], combined, pyr[l - 1], l, wp, camera, params)
            debug[f"combined_{l-1}"] = combined
    else:
        upsample_step = _select_upsample_impl(impl)
        for l in range(d, 0, -1):
            # final step: crop inside the step (plane-space when even) so
            # the padded rows/cols are never interleaved or copied
            final = l == 1 and upsample_step is U.blur_upsample_step
            with jax.named_scope(f"ao_upsample_l{l}"):
                combined = upsample_step(
                    combined, pyr[l], pyr[l - 1], params, wp,
                    lo_ao2=aos[l] if l != d else None,
                    **({"crop_hw": (h0, w0)} if final else {}),
                )
            debug[f"combined_{l-1}"] = combined
        if combined.shape[-2:] == (h0, w0):
            return combined, debug
    return combined[..., :h0, :w0], debug


def _quantize(out, out_dtype: str):
    """Output-format conversion (the reference's R8 render-texture analog).

    ``"float32"`` passthrough; ``"bfloat16"`` halves output traffic;
    ``"uint8"`` is the reference's R8 AO buffer: round(x * 255) for
    normalized float inputs.  An already-integer input (a composite into
    an integer color frame -- composite() returns the color's dtype) is
    cast without re-scaling: its values are already display codes, and
    re-applying the x*255 scale saturated every pixel to 255 (caught by
    test_parallel_parity).  XLA fuses the conversion into the producing
    kernel -- no extra pass.
    """
    if out_dtype == "float32":
        return out
    if out_dtype == "bfloat16":
        return out.astype(jnp.bfloat16)
    if out_dtype == "uint8":
        if jnp.issubdtype(jnp.dtype(out.dtype), jnp.integer):
            return jnp.clip(out, 0, 255).astype(jnp.uint8)
        return (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    raise ValueError(f"unsupported out_dtype {out_dtype!r} "
                     "(float32 | bfloat16 | uint8)")


def _render_frame_impl(depth, camera, params, normals, color,
                       debug_outputs: bool, impl: str,
                       out_dtype: str = "float32"):
    ao, debug = ao_pipeline(depth, camera, params, normals, impl=impl)
    out = ao if color is None else C.composite(color, ao)
    out = _quantize(out, out_dtype)
    if debug_outputs:
        return out, debug
    return out


from tpuao.utils.xla_opts import scoped_vmem_kib  # noqa: E402


@functools.lru_cache(maxsize=None)
def _render_frame_jit_for_backend(backend: str, kib: int):
    # the optimal scoped-VMEM budget flips between frame-size classes
    # and with the normals planes (see scoped_vmem_kib), so each budget
    # gets its own jit wrapper (kib == 0 -> no options, non-TPU backend)
    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(kib)}
            if backend == "tpu" and kib else None)
    return jax.jit(
        _render_frame_impl,
        static_argnames=("debug_outputs", "impl", "out_dtype"),
        compiler_options=opts,
    )


def _render_frame_jit(depth, camera, params, normals, color,
                      debug_outputs: bool, impl: str,
                      out_dtype: str = "float32"):
    h, w = depth.shape[-2:]
    backend = jax.default_backend()
    kib = (scoped_vmem_kib(h * w, normals is not None
                           and params.use_normals)
           if backend == "tpu" else 0)
    fn = _render_frame_jit_for_backend(backend, kib)
    return fn(depth, camera, params, normals, color,
              debug_outputs=debug_outputs, impl=impl, out_dtype=out_dtype)


def render_frame(depth, camera=None, params=None, normals=None, color=None,
                 debug_outputs: bool = False, impl: str = "auto",
                 out_dtype: str = "float32"):
    """Full AO pipeline on one frame (or a leading-batch of frames).

    Returns the AO buffer (or AO-multiplied color if ``color`` is given);
    with ``debug_outputs=True`` also returns the intermediate pyramid dict.
    ``out_dtype`` selects the output format: ``"float32"`` (default),
    ``"bfloat16"``, or ``"uint8"`` -- the reference's R8 AO render texture
    (round(ao * 255); SURVEY.md SS3.0 RT inventory).
    """
    camera = camera or CameraParams()
    params = params or AOParams()
    depth = jnp.asarray(depth)
    if normals is not None:
        normals = jnp.asarray(normals)
    if color is not None:
        color = jnp.asarray(color)
    return _render_frame_jit(depth, camera, params, normals, color,
                             debug_outputs, impl, out_dtype)


def _single_scale_impl(depth, camera, params, impl: str):
    h0, w0 = depth.shape[-2:]
    hp, wp = padded_shape(h0, w0)
    dpad = _pad_to_64(depth.astype(jnp.float32), hp, wp)
    linz = P.linearize_depth(dpad, camera)
    ds2 = P.downsample2x(linz)
    ao = _select_render_impl(impl)(ds2, 1, wp, camera, params, None)
    # ceil halves: pick-one keeps rows 0,2,... so odd inputs have
    # ceil(h/2) real half-res scanlines (floor would drop the last one)
    return ao[..., : -(-h0 // 2), : -(-w0 // 2)]


# NOTE: no compiler_options here -- jax forbids them on nested jits and
# callers (e.g. bench) wrap single_scale_ao in their own jit; the option is
# irrelevant at single-scale cost (~0.03 ms) anyway.  Module-level so repeat
# calls hit the jit cache instead of retracing per call (ADVICE r1).
_single_scale_jit = jax.jit(_single_scale_impl, static_argnames=("impl",))


def single_scale_ao(depth, camera=None, params=None, impl: str = "auto"):
    """[BJ] config 1: single-scale AO at 1/2 input resolution, no blur.

    Returns the 1/2-res AO buffer directly (the reference's Occlusion1 RT).
    """
    camera = camera or CameraParams()
    params = (params or AOParams()).replace(hierarchy_depth=1,
                                            enable_blur=False)
    return _single_scale_jit(jnp.asarray(depth), camera, params, impl=impl)


# ---------------------------------------------------------------------------
# Temporal accumulation (beyond-reference; spec: golden/temporal.py)
# ---------------------------------------------------------------------------

from tpuao.params import TemporalParams  # noqa: E402
from tpuao.ops import temporal as T  # noqa: E402


def _temporal_frame_core(depth, prev_ao, prev_depth, motion, camera, params,
                         tparams, normals, color, impl: str, out_dtype: str,
                         resolve_level: int = 0):
    """Jit-traceable core: frame pipeline + temporal resolve in ONE program.

    The pipeline's full-res linear depth is read out of the debug dict --
    under jit the unused debug entries are dead code and cost nothing, so
    this reuses the already-computed LinearZ instead of linearizing twice.
    Returns ``(output, (resolved_ao, linear_depth))``; the state tuple is
    always f32 regardless of ``out_dtype``/``color``.

    ``resolve_level=0`` is the spec resolve (full res, golden
    ``temporal_resolve_golden``); ``resolve_level=1`` applies the resolve
    to the LEVEL-1 combined AO before the final bilateral upsample lifts
    it (golden ``render_frame_l1_temporal_golden``) -- the history state
    is then half-res ``(ceil(H/2), ceil(W/2))`` and the resolve touches
    1/4 the texels with a ceil(R/2) window.  Under jit the pipeline's own
    final upsample (computed on the UNresolved field) is dead code; only
    the re-issued step on the resolved field is compiled.
    """
    h0, w0 = depth.shape[-2:]
    ao, dbg = ao_pipeline(depth, camera, params, normals, impl=impl)
    if resolve_level == 0:
        linz = dbg["linear_z"][..., :h0, :w0]
        resolved = T.temporal_resolve(ao, linz, prev_ao, prev_depth, camera,
                                      tparams, motion, impl=impl)
        out, state = resolved, (resolved, linz)
    else:
        out, state = _resolve_l1_and_lift(dbg, prev_ao, prev_depth, motion,
                                          camera, params, tparams, h0, w0,
                                          impl)
    out = out if color is None else C.composite(color, out)
    return _quantize(out, out_dtype), state


def _resolve_l1_and_lift(dbg, prev_ao1, prev_d1, motion, camera, params,
                         tparams, h0: int, w0: int, impl: str):
    """Level-1 resolve + final lift (spec: golden
    ``render_frame_l1_temporal_golden``).  Takes ``ao_pipeline``'s debug
    dict (level-1 combined AO pre-final-step, AO levels, depth pyramid);
    returns ``(full_res_ao, (resolved_l1, d1))``."""
    if impl == "fused":
        raise ValueError("resolve_level=1 needs the level-1 AO as a "
                         "separate buffer; impl='fused' renders it inside "
                         "the fused chain kernel -- use impl='auto'")
    hp, wp = padded_shape(h0, w0)
    h1, w1 = -(-h0 // 2), -(-w0 // 2)
    d = params.hierarchy_depth
    aos1 = dbg["ao_levels"][1]
    if params.enable_blur and d > 1:
        cur1 = jnp.minimum(dbg["combined_1"], aos1)
    else:
        cur1 = aos1
    cur1c = cur1[..., :h1, :w1]
    d1c = dbg["pyramid"][1][..., :h1, :w1]
    resolved = T.temporal_resolve_l1(cur1c, d1c, prev_ao1, prev_d1, h0, w0,
                                     camera, tparams, motion, impl=impl)
    rp = _pad_to_64(resolved, hp // 2, wp // 2)  # edge-pad back to l1 dims
    if params.enable_blur:
        out = U.blur_upsample_step(rp, dbg["pyramid"][1], dbg["pyramid"][0],
                                   params, wp, crop_hw=(h0, w0))
        if out.shape[-2:] != (h0, w0):
            out = out[..., :h0, :w0]
    else:
        if h0 % 2 == 0 and w0 % 2 == 0:
            a = rp[..., : h0 // 2, : w0 // 2]
            out = U.interleave2x2(a, a, a, a)
        else:
            out = U.interleave2x2(rp, rp, rp, rp)[..., :h0, :w0]
    return out, (resolved, d1c)


@functools.lru_cache(maxsize=None)
def _temporal_frame_jit_for_backend(backend: str, kib: int):
    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(kib)}
            if backend == "tpu" and kib else None)
    return jax.jit(_temporal_frame_core,
                   static_argnames=("impl", "out_dtype", "resolve_level"),
                   compiler_options=opts)


def _temporal_state_shape(h0: int, w0: int, resolve_level: int):
    """History-state dims for a given resolve level (level 1 keeps the
    half-res history)."""
    if resolve_level == 0:
        return h0, w0
    return -(-h0 // 2), -(-w0 // 2)


def render_frame_temporal(depth, state=None, camera=None, params=None,
                          tparams=None, motion=None, normals=None,
                          color=None, impl: str = "auto",
                          out_dtype: str = "float32",
                          resolve_level: int = 0):
    """One temporally-accumulated frame: pipeline + resolve, one program.

    ``state`` is the ``(ao, depth)`` history from the previous call (or
    None for a fresh sequence -- the null history makes frame 0 resolve to
    its own single-frame AO).  ``motion`` is the current->previous eye
    transform (4x4; ``tpuao.utils.camera.relative_motion``), a per-pixel
    motion-vector buffer ((H, W, 2) or (2, H, W), pixel units, current->
    previous -- the object-motion path, spec in golden/temporal.py), or
    None for a static camera (gather-free).  Returns
    ``(output, new_state)``.

    ``resolve_level`` is a static structure knob: 0 (default) resolves at
    full res (the golden spec); 1 resolves the level-1 AO before the final
    bilateral upsample -- ~4x less resolve work and a half-res history
    state, at the cost of half-res temporal smoothing (measured quality
    delta: docs/PERF.md 'temporal').
    """
    camera = camera or CameraParams()
    params = params or AOParams()
    tparams = tparams or TemporalParams()
    depth = jnp.asarray(depth)
    h0, w0 = depth.shape[-2:]
    if depth.ndim != 2:
        raise ValueError("temporal accumulation is per-sequence: depth must "
                         f"be a single (H, W) frame, got {depth.shape} "
                         "(batch independent sequences with jax.vmap)")
    if resolve_level not in (0, 1):
        raise ValueError(f"resolve_level must be 0 or 1, "
                         f"got {resolve_level!r}")
    hs, ws = _temporal_state_shape(h0, w0, resolve_level)
    if state is None:
        state = T.initial_state(hs, ws)
    elif tuple(state[0].shape[-2:]) != (hs, ws):
        raise ValueError(
            f"state shape {tuple(state[0].shape[-2:])} does not match "
            f"resolve_level={resolve_level} (expected {(hs, ws)}) -- a "
            "sequence must keep one resolve_level throughout")
    if normals is not None:
        normals = jnp.asarray(normals)
    if color is not None:
        color = jnp.asarray(color)
    if motion is not None:
        motion = jnp.asarray(motion, jnp.float32)
    backend = jax.default_backend()
    kib = (scoped_vmem_kib(h0 * w0, normals is not None
                           and params.use_normals)
           if backend == "tpu" else 0)
    fn = _temporal_frame_jit_for_backend(backend, kib)
    return fn(depth, state[0], state[1], motion, camera, params, tparams,
              normals, color, impl=impl, out_dtype=out_dtype,
              resolve_level=resolve_level)


def _sequence_scan_core(depths, motions, normals, camera, params, tparams,
                        impl: str, out_dtype: str, init=None,
                        resolve_level: int = 0):
    """``init`` overrides the null history -- used by the view-sharded
    fleet driver, where the scan carry must be ``pcast`` to the mesh
    axis's varying type (shard_map rejects an invariant carry)."""
    h0, w0 = depths.shape[-2:]
    if init is None:
        init = T.initial_state(*_temporal_state_shape(h0, w0, resolve_level))

    def step(carry, xs):
        depth, motion, nrm = xs
        out, carry = _temporal_frame_core(
            depth, carry[0], carry[1], motion, camera, params, tparams,
            nrm, None, impl, out_dtype, resolve_level)
        return carry, out

    xs = (depths, motions, normals)
    _, outs = jax.lax.scan(step, init, xs)
    return outs


@functools.lru_cache(maxsize=None)
def _sequence_scan_jit_for_backend(backend: str, kib: int):
    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(kib)}
            if backend == "tpu" and kib else None)
    return jax.jit(_sequence_scan_core,
                   static_argnames=("impl", "out_dtype", "resolve_level"),
                   compiler_options=opts)


def render_sequence_temporal(depths, camera=None, params=None, tparams=None,
                             motions=None, normals=None, impl: str = "auto",
                             out_dtype: str = "float32",
                             resolve_level: int = 0):
    """Temporally-accumulated sequence as ONE ``lax.scan`` program.

    ``depths`` is (T, H, W); ``motions`` is None (static camera),
    (T, 4, 4) where ``motions[t]`` maps frame t's eye space to frame
    t-1's (``motions[0]`` is irrelevant: the null history zeroes frame 0's
    blend), or per-pixel motion-vector buffers (T, H, W, 2) / (T, 2, H, W)
    (pixel units, current->previous -- the object-motion path, spec in
    golden/temporal.py).  The whole sequence compiles to a single XLA
    program -- zero host round-trips between frames, which matters on
    dispatch-taxed links (docs/PERF.md: this relay charges ~3.3 ms per
    extra launch).  Returns the (T, H, W) resolved stack.
    ``resolve_level``: see ``render_frame_temporal`` (0 = full-res spec,
    1 = half-res level-1).
    """
    if resolve_level not in (0, 1):
        raise ValueError(f"resolve_level must be 0 or 1, "
                         f"got {resolve_level!r}")
    camera = camera or CameraParams()
    params = params or AOParams()
    tparams = tparams or TemporalParams()
    depths = jnp.asarray(depths)
    if depths.ndim != 3:
        raise ValueError(f"depths must be (T, H, W), got {depths.shape}")
    if motions is not None:
        motions = jnp.asarray(motions, jnp.float32)
        t_n, h_n, w_n = depths.shape
        ok = (motions.shape == (t_n, 4, 4)
              or motions.shape == (t_n, h_n, w_n, 2)
              or motions.shape == (t_n, 2, h_n, w_n))
        if not ok:
            raise ValueError(
                f"motions must be ({t_n}, 4, 4) eye transforms or "
                f"({t_n}, {h_n}, {w_n}, 2) / ({t_n}, 2, {h_n}, {w_n}) "
                f"motion-vector buffers, got {motions.shape}")
    if normals is not None:
        normals = jnp.asarray(normals)
    h0, w0 = depths.shape[-2:]
    backend = jax.default_backend()
    kib = (scoped_vmem_kib(h0 * w0, normals is not None
                           and params.use_normals)
           if backend == "tpu" else 0)
    fn = _sequence_scan_jit_for_backend(backend, kib)
    return fn(depths, motions, normals, camera, params, tparams,
              impl=impl, out_dtype=out_dtype, resolve_level=resolve_level)


class AmbientOcclusionEngine:
    """Stateful driver analog of the reference MonoBehaviour (SURVEY.md SS4).

    Tunables are validated on set (OnValidate analog) and ride as traced
    scalars -- no recompilation.  Programs are cached per input shape /
    static structure by jax.jit.
    """

    def __init__(self, camera: CameraParams | None = None,
                 params: AOParams | None = None, impl: str = "auto",
                 debug: bool = False, out_dtype: str = "float32"):
        self.camera = camera or CameraParams()
        self._params = (params or AOParams()).validate()
        self.impl = impl
        self.debug = debug  # debug blit mode (SURVEY.md SS3.4)
        self.out_dtype = out_dtype  # R8 RT analog: "uint8" (SS3.0)

    # --- component API: validated tunable properties ---
    @property
    def params(self) -> AOParams:
        return self._params

    @params.setter
    def params(self, value: AOParams):
        self._params = value.validate()

    def _set(self, **kw):
        self._params = self._params.replace(**kw).validate()

    noise_filter_tolerance = property(
        lambda s: s._params.noise_filter_tolerance,
        lambda s, v: s._set(noise_filter_tolerance=v))
    blur_tolerance = property(
        lambda s: s._params.blur_tolerance,
        lambda s, v: s._set(blur_tolerance=v))
    upsample_tolerance = property(
        lambda s: s._params.upsample_tolerance,
        lambda s, v: s._set(upsample_tolerance=v))
    rejection_falloff = property(
        lambda s: s._params.rejection_falloff,
        lambda s, v: s._set(rejection_falloff=v))
    strength = property(
        lambda s: s._params.strength,
        lambda s, v: s._set(strength=v))

    # --- config persistence (Unity serialized-component analog) ---
    def save_config(self, path: str) -> str:
        from tpuao.params import save_config

        return save_config(path, self._params, self.camera)

    @classmethod
    def from_config(cls, path: str, **kw) -> "AmbientOcclusionEngine":
        from tpuao.params import load_config

        params, camera = load_config(path)
        return cls(camera, params, **kw)

    # --- per-frame entry (command-buffer replay analog) ---
    def render(self, depth, normals=None, color=None, debug_outputs=False):
        if self.debug and color is not None:
            out = render_frame(depth, self.camera, self._params, normals,
                               None, debug_outputs, self.impl)
            ao, dbg = out if debug_outputs else (out, None)
            # channel count from the color frame only when it HAS a
            # channel axis (a 2-D grayscale frame's shape[-1] is W!)
            ch = color.shape[-1] if color.ndim == ao.ndim + 1 else 1
            view = _quantize(C.debug_view(ao, ch), self.out_dtype)
            return (view, dbg) if debug_outputs else view
        return render_frame(depth, self.camera, self._params, normals,
                            color, debug_outputs, self.impl,
                            out_dtype=self.out_dtype)

    # --- multi-chip entries (the same engine state drives the parallel
    # modes; camera/params/impl/out_dtype come from the component) ---
    def render_views(self, depths, normals=None, color=None, mesh=None,
                     debug_outputs: bool = False):
        """[BJ] config 5 through the engine: view-sharded batch."""
        from tpuao.parallel.sharding import render_views_sharded

        return render_views_sharded(
            depths, self.camera, self._params, normals=normals, mesh=mesh,
            impl=self.impl, color=color, out_dtype=self.out_dtype,
            debug_outputs=debug_outputs)

    def render_spatial(self, depth, normals=None, color=None, mesh=None,
                       halo_rows: int | None = None,
                       debug_outputs: bool = False):
        """One large frame in row bands across a mesh, engine-configured."""
        from tpuao.parallel.spatial import render_frame_spatial

        return render_frame_spatial(
            depth, self.camera, self._params, mesh=mesh, impl=self.impl,
            halo_rows=halo_rows, normals=normals, color=color,
            out_dtype=self.out_dtype, debug_outputs=debug_outputs)

    def render_sections(self, depth, n_sections: int = 2, normals=None,
                        color=None, halo_rows: int | None = None):
        """Memory-bounded sequential sections on one chip (equals the
        monolithic output; docs/PERF.md for the speed caveat)."""
        from tpuao.parallel.sections import render_frame_sections

        return render_frame_sections(
            depth, self.camera, self._params, n_sections=n_sections,
            halo_rows=halo_rows, impl=self.impl, normals=normals,
            color=color, out_dtype=self.out_dtype)

    __call__ = render


class TemporalAOEngine(AmbientOcclusionEngine):
    """Stateful temporal-accumulation driver (spec: golden/temporal.py).

    Carries the ``(ao, depth)`` history across ``render`` calls and derives
    per-frame motion from camera *view* matrices when given::

        eng = TemporalAOEngine()
        out = eng.render(depth0, view=V0)   # frame 0: resolves to itself
        out = eng.render(depth1, view=V1)   # reprojected accumulation

    ``view`` is the world->eye matrix (``tpuao.utils.camera`` convention);
    omit it (or pass ``motion`` directly) for a static camera.  ``reset()``
    drops history (scene cut).  Tunables ride as traced scalars like the
    base engine's; ``neighborhood_clamp`` is static.

    ``resolve_level`` (static): 0 = full-res spec resolve, 1 = half-res
    level-1 resolve (see ``render_frame_temporal``); a change drops the
    history (the state shape differs between levels).
    """

    def __init__(self, camera: CameraParams | None = None,
                 params: AOParams | None = None,
                 tparams: TemporalParams | None = None,
                 impl: str = "auto", out_dtype: str = "float32",
                 resolve_level: int = 0):
        super().__init__(camera, params, impl=impl, out_dtype=out_dtype)
        self._tparams = (tparams or TemporalParams()).validate()
        if resolve_level not in (0, 1):
            raise ValueError(f"resolve_level must be 0 or 1, "
                             f"got {resolve_level!r}")
        self._resolve_level = resolve_level
        self._state = None
        self._prev_view = None

    @property
    def resolve_level(self) -> int:
        return self._resolve_level

    @resolve_level.setter
    def resolve_level(self, value: int):
        if value not in (0, 1):
            raise ValueError(f"resolve_level must be 0 or 1, got {value!r}")
        if value != self._resolve_level:
            self._resolve_level = value
            self.reset()  # state shape differs between levels

    @property
    def tparams(self) -> TemporalParams:
        return self._tparams

    @tparams.setter
    def tparams(self, value: TemporalParams):
        self._tparams = value.validate()

    history_weight = property(
        lambda s: s._tparams.history_weight,
        lambda s, v: setattr(s, "tparams",
                             s._tparams.replace(history_weight=v)))
    depth_tolerance = property(
        lambda s: s._tparams.depth_tolerance,
        lambda s, v: setattr(s, "tparams",
                             s._tparams.replace(depth_tolerance=v)))

    def reset(self):
        """Drop accumulated history (scene cut / sequence restart)."""
        self._state = None
        self._prev_view = None

    def render(self, depth, normals=None, color=None, motion=None,
               view=None):
        if motion is not None and view is not None:
            raise ValueError("pass motion= or view=, not both")
        if view is not None:
            from tpuao.utils.camera import relative_motion

            import numpy as np

            view = np.asarray(view, np.float64).reshape(4, 4)
            if self._prev_view is not None:
                motion = relative_motion(self._prev_view, view)
            self._prev_view = view
        out, self._state = render_frame_temporal(
            depth, self._state, self.camera, self._params, self._tparams,
            motion=motion, normals=normals, color=color, impl=self.impl,
            out_dtype=self.out_dtype, resolve_level=self._resolve_level)
        return out

    __call__ = render
