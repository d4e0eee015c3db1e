"""Parameter / config system for tpuao.

This is the TPU-native analog of the reference's component API layer
(SURVEY.md SS2 L3 and SS6 "Config / flag system"): ``keijiro/MiniEngineAO``
exposes Unity MonoBehaviour properties ``NoiseFilterTolerance``,
``BlurTolerance``, ``UpsampleTolerance``, ``RejectionFalloff``, ``Strength``
with inspector slider ranges (expected in
``Assets/MiniEngineAO/AmbientOcclusion.cs`` -- the reference mount was empty
at build time, see SURVEY.md SS0, so no file:line citation is possible; the
ranges/defaults follow upstream MiniEngine ``SSAO.cpp`` defaults as recorded
in SURVEY.md SS6).

Design notes (TPU-first):

* Tunables that only feed uniforms are **traced scalars** (pytree leaves), so
  changing them never recompiles the jitted frame program -- the analog of the
  reference updating constant buffers without re-recording command buffers
  (SURVEY.md SS4.3).
* Structure-changing knobs (``hierarchy_depth``, ``exhaustive``, blur on/off)
  are **static** pytree metadata: changing them recompiles, exactly like a
  resolution change in the reference rebuilds command buffers.
* The sample-disc tables (the reference's ``_InvThicknessTable`` /
  ``_SampleWeightTable`` constant buffers, SURVEY.md SS3.2) are precomputed
  here in NumPy at trace time.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import numpy as np

try:  # flax.struct gives us frozen pytree dataclasses with static fields.
    from flax import struct
except ImportError:  # pragma: no cover - flax is a baked-in dependency.
    struct = None


# ---------------------------------------------------------------------------
# Sample disc pattern (SURVEY.md SS3.2)
# ---------------------------------------------------------------------------
# 12 disc entries on the integer grid inside a radius-5 (in slice texels)
# sphere: 4 axial, 3 true-diagonal, 5 L-shaped.  Per-entry thickness
# T[i] = sqrt(1 - (x^2 + y^2) / 25) is the half-chord height of the unit
# sphere at that lateral offset.  Tap multiplicity is 4 for axial/diagonal
# entries and 8 for L-shaped entries (which occur in two mirrored
# orientations).  All integer grid points with 0 < x^2+y^2 < 25 are covered.
SAMPLE_OFFSETS: tuple[tuple[int, int], ...] = (
    (1, 0), (2, 0), (3, 0), (4, 0),          # axial
    (1, 1), (2, 2), (3, 3),                  # diagonal
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4),  # L-shaped
)

N_ENTRIES = len(SAMPLE_OFFSETS)

SAMPLE_THICKNESS: np.ndarray = np.array(
    [math.sqrt(1.0 - (x * x + y * y) / 25.0) for (x, y) in SAMPLE_OFFSETS],
    dtype=np.float64,
)

TAP_MULTIPLICITY: np.ndarray = np.array(
    [4 if (y == 0 or x == y) else 8 for (x, y) in SAMPLE_OFFSETS],
    dtype=np.float64,
)

# Non-exhaustive ("sparse") quality mode: the subset of entries kept when
# `AOParams.exhaustive=False`.  The reference's quality ladder zeroes a subset
# of taps before normalizing (SURVEY.md SS3.2, MED confidence with the mount
# empty); our documented choice is the even-coordinate entries, which align to
# the half-resolution grid: (2,0), (4,0), (2,2), (2,4).
SPARSE_ENTRY_INDICES: tuple[int, ...] = (1, 3, 5, 11)


def entry_pairs(entry_index: int) -> list[tuple[int, int]]:
    """Mirror-pair representatives for one disc entry, in slice texels.

    Each returned offset ``o`` stands for the tap pair ``{+o, -o}``.
    Axial entry (x,0) covers taps (+-x,0),(0,+-x)    -> 2 pairs.
    Diagonal entry (x,x) covers (+-x,+-x)            -> 2 pairs.
    L entry (x,y) covers (+-x,+-y),(+-y,-+x) and the
    mirrored orientation (+-y,+-x),(+-x,-+y)         -> 4 pairs.
    """
    x, y = SAMPLE_OFFSETS[entry_index]
    if y == 0:
        return [(x, 0), (0, x)]
    if x == y:
        return [(x, x), (x, -x)]
    return [(x, y), (y, -x), (y, x), (x, -y)]


def build_pair_table(exhaustive: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Flattened (offsets, weights) table for the AO estimator.

    Returns ``(offsets[N,2] int32, weights[N] float32)`` where offsets are in
    *slice texels* (multiply by 4 to get downsampled-buffer texels, SURVEY.md
    SS3.1-3.2) and weights sum to 1 across all pairs.  Per-entry weight is
    ``multiplicity * thickness`` normalized over active entries (the
    reference's ``_SampleWeightTable``), split evenly among the entry's pairs.
    """
    active = (
        range(N_ENTRIES) if exhaustive else SPARSE_ENTRY_INDICES
    )
    entry_w = {i: TAP_MULTIPLICITY[i] * SAMPLE_THICKNESS[i] for i in active}
    total = sum(entry_w.values())
    offsets: list[tuple[int, int]] = []
    weights: list[float] = []
    for i in active:
        pairs = entry_pairs(i)
        w_pair = entry_w[i] / total / len(pairs)
        for o in pairs:
            offsets.append(o)
            weights.append(w_pair)
    return (
        np.array(offsets, dtype=np.int32),
        np.array(weights, dtype=np.float32),
    )


# ---------------------------------------------------------------------------
# Tunables (reference component API, SURVEY.md SS2 L3 / SS6)
# ---------------------------------------------------------------------------

# Inspector slider ranges (SURVEY.md SS6; upstream defaults -3, -5, -7, 2.5).
PARAM_RANGES: dict[str, tuple[float, float]] = {
    "noise_filter_tolerance": (-8.0, 0.0),
    "blur_tolerance": (-8.0, -1.0),
    "upsample_tolerance": (-12.0, -1.0),
    "rejection_falloff": (1.0, 10.0),
    "strength": (0.1, 10.0),
}

# Temporal accumulation (golden/temporal.py spec; beyond-reference).
# history_weight < 1 keeps the accumulator a strict contraction (w = 1
# would never converge and ghosts forever); depth_tolerance is a relative
# depth mismatch, > 0 so confidence is well-defined.
TEMPORAL_PARAM_RANGES: dict[str, tuple[float, float]] = {
    "history_weight": (0.0, 0.98),
    "depth_tolerance": (0.005, 1.0),
}

if struct is not None:

    @struct.dataclass
    class AOParams:
        """AO tunables.  Float fields are traced; changing them does not
        recompile.  Fields marked ``pytree_node=False`` are static structure.
        """

        # --- traced tunables (reference MonoBehaviour properties) ---
        noise_filter_tolerance: Any = -3.0
        blur_tolerance: Any = -5.0
        upsample_tolerance: Any = -7.0
        rejection_falloff: Any = 2.5
        strength: Any = 1.0

        # --- static structure ---
        hierarchy_depth: int = struct.field(pytree_node=False, default=4)
        exhaustive: bool = struct.field(pytree_node=False, default=True)
        enable_blur: bool = struct.field(pytree_node=False, default=True)
        use_normals: bool = struct.field(pytree_node=False, default=False)
        # Screen-space sphere diameter in slice texels (upstream
        # ScreenspaceDiameter = 10; SURVEY.md SS3.2).
        screenspace_diameter: float = struct.field(
            pytree_node=False, default=10.0
        )

        def validate(self) -> "AOParams":
            import numpy as _np

            for name, (lo, hi) in PARAM_RANGES.items():
                v = getattr(self, name)
                # concrete numbers (incl. np.float32 etc.) are range-checked;
                # traced values pass through (tunables ride as jit scalars)
                if (isinstance(v, (int, float, _np.floating, _np.integer))
                        and not (lo <= float(v) <= hi)):
                    raise ValueError(
                        f"AOParams.{name}={v} outside range [{lo}, {hi}]"
                    )
            if not 1 <= self.hierarchy_depth <= 4:
                raise ValueError(
                    f"hierarchy_depth must be in [1,4], got {self.hierarchy_depth}"
                )
            return self

    @struct.dataclass
    class TemporalParams:
        """Temporal-accumulation tunables (ops/temporal.py; beyond-reference
        -- the reference is single-frame, SURVEY.md SS1).  Float fields are
        traced scalars; ``neighborhood_clamp`` is static structure.

        * ``history_weight``  - max fraction of history kept per frame
          (effective averaging window ~ 1/(1-w) frames).
        * ``depth_tolerance`` - relative reprojected-depth mismatch at which
          history confidence reaches 0 (soft linear falloff from 0).
        * ``neighborhood_clamp`` - clamp history to the 3x3 min/max envelope
          of the current frame's AO (anti-ghosting for occlusion changes
          depth agreement cannot catch).
        * ``max_displacement`` - drop history reprojecting more than this
          many pixels away; bounding the displacement is what makes the
          TPU resolve gather-free (a (2R+2)^2 tent-weighted shifted-window
          sum; golden/temporal.py).  ``None`` = unbounded motion via a
          true gather (~400x slower on TPU at 1080p, measured).
        """

        history_weight: Any = 0.9
        depth_tolerance: Any = 0.1
        neighborhood_clamp: bool = struct.field(
            pytree_node=False, default=True)
        max_displacement: int | None = struct.field(
            pytree_node=False, default=4)

        def validate(self) -> "TemporalParams":
            import numpy as _np

            for name, (lo, hi) in TEMPORAL_PARAM_RANGES.items():
                v = getattr(self, name)
                if (isinstance(v, (int, float, _np.floating, _np.integer))
                        and not (lo <= float(v) <= hi)):
                    raise ValueError(
                        f"TemporalParams.{name}={v} outside range "
                        f"[{lo}, {hi}]")
            r = self.max_displacement
            if r is not None and not (isinstance(r, int) and 1 <= r <= 64):
                raise ValueError(
                    f"TemporalParams.max_displacement={r!r} must be None "
                    "or an int in [1, 64] (window taps grow as (2R+2)^2)")
            return self

    @struct.dataclass
    class CameraParams:
        """Camera projection description.

        ``near``/``far``/``tan_half_fov_h`` are traced scalars.  Depth
        convention flags are static (they change the traced program).

        ``depth_mode``:
          * ``"hardware"`` - input is the hardware depth buffer in [0,1];
            linearized via ``1/(zmagic*d + 1)`` with
            ``zmagic=(far-near)/near`` (reversed-Z; SURVEY.md SS3.1).
          * ``"linear"`` - input is already normalized linear eye depth
            ``z_eye / far`` in (0, 1].
        """

        near: Any = 0.1
        far: Any = 100.0
        tan_half_fov_h: Any = math.tan(math.radians(60.0) / 2)
        reversed_z: bool = struct.field(pytree_node=False, default=True)
        depth_mode: str = struct.field(pytree_node=False, default="hardware")

        @classmethod
        def from_projection(cls, proj, convention: str = "unity"
                            ) -> "CameraParams":
            """Build camera params from a 4x4 projection matrix -- the
            integration surface a real engine hands over (SURVEY.md SS3.1:
            "derive from the camera projection matrix in the build and
            validate monotonicity + range"; VERDICT r3 missing-item 3).

            ``convention``:
              * ``"unity"`` -- D3D-style clip space, buffer depth =
                clip.z/clip.w in [0,1] (what Unity's
                ``GL.GetGPUProjectionMatrix`` yields on D3D/Metal/Vulkan).
                Both reversed-Z (near -> 1, the modern default) and
                forward-Z matrices are accepted; the direction is detected
                from the matrix itself.
              * ``"gl"`` -- OpenGL clip space, NDC z in [-1,1], buffer
                depth = 0.5*ndc + 0.5 (the glDepthRange(0,1) viewport
                transform), forward-Z.

            The matrix is for column vectors (``clip = P @ view``).  Both
            view-space handednesses are accepted and auto-detected from
            the sign of the perspective-divide entry: ``P[3,2] < 0`` means
            the camera looks down -Z (Unity/GL view space), ``P[3,2] > 0``
            looks down +Z (D3D left-handed, the utils/camera.py
            convention -- the two APIs agree on shared matrices).  A
            row-vector (transposed) matrix is accepted too.  Orientation is
            disambiguated by the perspective-divide entry: engine-produced
            matrices have ``|P[3,2]| == 1`` (clip.w = z_eye) -- the zero
            pattern alone cannot distinguish the orientations, and the
            wrong one can define a DIFFERENT valid-looking camera (both
            readings live in the same rational family), so this must be
            structural, not try-and-see.  If neither or both orientations
            have the unit entry, as-given is tried first and the transpose
            only on failure.

            Derivation: buffer depth is the rational map
            ``d(ze) = (a*(-ze) + b) / (c*(-ze) + e)`` (rows 2 and 3 of P),
            so the near/far planes are its exact preimages of the depth
            extremes; ``tan_half_fov_h = 1 / P[0,0]``.  The result is then
            cross-validated against the golden linearizer
            ``1/(zmagic*d + 1)`` on sampled eye depths (monotonicity +
            range per SURVEY.md SS3.1) -- a matrix whose depth map the
            pipeline cannot represent (e.g. infinite-far reversed-Z,
            oblique near clip) fails loudly here instead of rendering
            wrong AO.
            """
            P = np.asarray(proj, dtype=np.float64)
            if P.size != 16:
                raise ValueError(
                    f"projection must be 4x4 (16 values), got {P.shape}")
            P = P.reshape(4, 4)
            if convention not in ("unity", "gl"):
                raise ValueError(
                    f"convention={convention!r} must be 'unity' or 'gl'")
            cand = [P, P.T]
            unit = [abs(abs(M[3, 2]) - 1.0) < 1e-9 for M in cand]
            if unit[0] != unit[1]:
                cand = [cand[0] if unit[0] else cand[1]]
            try:
                return cls._from_projection_oriented(cand[0], convention)
            except ValueError as first:
                if len(cand) == 1:
                    raise
                try:
                    return cls._from_projection_oriented(cand[1], convention)
                except ValueError:
                    raise first from None

        @classmethod
        def _from_projection_oriented(cls, P, convention: str
                                      ) -> "CameraParams":
            if abs(P[3, 2]) < 1e-12:
                raise ValueError(
                    "not a perspective projection: P[3,2] == 0 (no 1/z "
                    "divide); orthographic cameras have no AO depth scale")
            if P[0, 0] <= 0:
                raise ValueError(
                    f"P[0,0]={P[0, 0]} must be > 0 (cot of half the "
                    "horizontal fov)")
            tanh = 1.0 / P[0, 0]
            a, b = P[2, 2], P[2, 3]
            c, e = P[3, 2], P[3, 3]
            # view-space z of a point at eye distance ze: -ze for right-
            # handed (w row negative), +ze for left-handed (w row positive)
            zsign = -1.0 if c < 0 else 1.0

            def ndc(d):  # buffer depth -> clip-space z/w
                return 2.0 * d - 1.0 if convention == "gl" else d

            def ze_of(d):  # exact preimage of buffer depth d
                nd = ndc(d)
                den = zsign * (a - nd * c)
                if abs(den) < 1e-300:
                    return math.inf
                return (nd * e - b) / den

            z_at_0, z_at_1 = ze_of(0.0), ze_of(1.0)
            if not (math.isfinite(z_at_0) and math.isfinite(z_at_1)):
                raise ValueError(
                    "projection has an infinite clip plane (e.g. infinite-"
                    "far reversed-Z); the AO linearizer needs finite "
                    "near/far -- rebuild the matrix with a finite far")
            # plain python scalars: reversed_z is a STATIC pytree field
            # (a np.bool_ would poison the jit cache key), and floats keep
            # configs JSON-serializable
            reversed_z = bool(z_at_1 < z_at_0)
            near, far = sorted((float(z_at_0), float(z_at_1)))
            cam = cls(near=near, far=far, tan_half_fov_h=float(tanh),
                      reversed_z=reversed_z,
                      depth_mode="hardware").validate()
            # cross-validate: the matrix's own depth map, pushed through the
            # golden linearizer, must reproduce z_eye/far monotonically
            zmagic = (far - near) / near
            zs = np.linspace(near, far, 33)
            d = (a * (zsign * zs) + b) / (c * (zsign * zs) + e)
            d_buf = 0.5 * d + 0.5 if convention == "gl" else d
            d_lin = d_buf if reversed_z else 1.0 - d_buf
            recon = 1.0 / (zmagic * d_lin + 1.0)  # golden linearize_depth
            err = np.abs(recon - zs / far).max()
            if err > 1e-9 * (1.0 + far / near):
                raise ValueError(
                    "projection depth map is not the standard perspective "
                    f"form the AO linearizer assumes (max dev {err:.3e}); "
                    "oblique/sheared depth rows are not supported")
            mono = np.diff(d_buf)
            if not (np.all(mono < 0) if reversed_z else np.all(mono > 0)):
                raise ValueError("projection depth map is not monotonic "
                                 "over [near, far]")
            return cam

        def validate(self) -> "CameraParams":
            """Range-check concrete projection values (mirrors
            ``AOParams.validate``): ``zmagic = (far - near) / near`` and
            ``1 / tan_half_fov_h`` blow up on degenerate planes, so a
            near<=0 / far<=near / fov outside (0, 180) camera must fail
            loudly instead of rendering NaN.  Traced values pass through.
            """
            import numpy as _np

            def conc(v):
                return isinstance(
                    v, (int, float, _np.floating, _np.integer))

            if conc(self.near) and not self.near > 0:
                raise ValueError(f"CameraParams.near={self.near} must be > 0")
            if (conc(self.near) and conc(self.far)
                    and not self.far > self.near):
                raise ValueError(
                    f"CameraParams.far={self.far} must exceed "
                    f"near={self.near}")
            if conc(self.tan_half_fov_h) and not (
                    0 < self.tan_half_fov_h < _np.inf):
                raise ValueError(
                    f"CameraParams.tan_half_fov_h={self.tan_half_fov_h} "
                    "must be finite and > 0 (fov in (0, 180) degrees)")
            if self.depth_mode not in ("hardware", "linear"):
                raise ValueError(
                    f"CameraParams.depth_mode={self.depth_mode!r} must be "
                    "'hardware' or 'linear'")
            return self

else:  # pragma: no cover
    AOParams = None
    CameraParams = None
    TemporalParams = None


# ---------------------------------------------------------------------------
# Plain (non-pytree) mirrors for the NumPy golden reference, which must not
# depend on JAX/flax (SURVEY.md SS5.1: a slow, obviously-correct spec).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GoldenAOParams:
    noise_filter_tolerance: float = -3.0
    blur_tolerance: float = -5.0
    upsample_tolerance: float = -7.0
    rejection_falloff: float = 2.5
    strength: float = 1.0
    hierarchy_depth: int = 4
    exhaustive: bool = True
    enable_blur: bool = True
    use_normals: bool = False
    screenspace_diameter: float = 10.0


@dataclasses.dataclass(frozen=True)
class GoldenTemporalParams:
    history_weight: float = 0.9
    depth_tolerance: float = 0.1
    neighborhood_clamp: bool = True
    max_displacement: int | None = 4


@dataclasses.dataclass(frozen=True)
class GoldenCameraParams:
    near: float = 0.1
    far: float = 100.0
    tan_half_fov_h: float = math.tan(math.radians(60.0) / 2)
    reversed_z: bool = True
    depth_mode: str = "hardware"


def to_golden(params, camera) -> tuple[GoldenAOParams, GoldenCameraParams]:
    """Convert (possibly traced) AOParams/CameraParams to plain floats."""
    def f(v):
        return float(np.asarray(v))

    gp = GoldenAOParams(
        noise_filter_tolerance=f(params.noise_filter_tolerance),
        blur_tolerance=f(params.blur_tolerance),
        upsample_tolerance=f(params.upsample_tolerance),
        rejection_falloff=f(params.rejection_falloff),
        strength=f(params.strength),
        hierarchy_depth=params.hierarchy_depth,
        exhaustive=params.exhaustive,
        enable_blur=params.enable_blur,
        use_normals=params.use_normals,
        screenspace_diameter=params.screenspace_diameter,
    )
    gc = GoldenCameraParams(
        near=f(camera.near),
        far=f(camera.far),
        tan_half_fov_h=f(camera.tan_half_fov_h),
        reversed_z=camera.reversed_z,
        depth_mode=camera.depth_mode,
    )
    return gp, gc


def to_golden_temporal(tparams) -> GoldenTemporalParams:
    """Convert (possibly traced) TemporalParams to plain floats."""
    return GoldenTemporalParams(
        history_weight=float(np.asarray(tparams.history_weight)),
        depth_tolerance=float(np.asarray(tparams.depth_tolerance)),
        neighborhood_clamp=tparams.neighborhood_clamp,
        max_displacement=tparams.max_displacement,
    )


# ---------------------------------------------------------------------------
# Config persistence (the reference's Unity-scene serialized fields,
# SURVEY.md SS6 "Config / flag system"): JSON round-trip for the component
# state so a tuned setup can be saved/shared like a Unity prefab.
# ---------------------------------------------------------------------------


def params_to_dict(params) -> dict:
    """AOParams/CameraParams -> plain-float dict (JSON-ready)."""
    import numpy as _np

    out = {}
    for f in dataclasses.fields(params):
        v = getattr(params, f.name)
        if isinstance(v, (bool, int, str)):
            out[f.name] = v
        else:
            out[f.name] = float(_np.asarray(v))
    return out


def params_from_dict(cls, d: dict):
    """Inverse of params_to_dict; validates AOParams ranges on load."""
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - names
    if unknown:
        raise ValueError(f"unknown {cls.__name__} fields: {sorted(unknown)}")
    obj = cls(**d)
    return obj.validate() if hasattr(obj, "validate") else obj


def save_config(path: str, params, camera) -> str:
    """Write {ao, camera} JSON (the engine's serialized component state)."""
    import json

    with open(path, "w") as f:
        json.dump({"ao": params_to_dict(params),
                   "camera": params_to_dict(camera)}, f, indent=2)
    return path


def load_config(path: str):
    """Read a save_config file -> (AOParams, CameraParams), validated."""
    import json

    with open(path) as f:
        d = json.load(f)
    return (params_from_dict(AOParams, d["ao"]),
            params_from_dict(CameraParams, d["camera"]))


# ---------------------------------------------------------------------------
# Derived per-level constants (the reference's host-side uniform math,
# SURVEY.md SS3.2 / SS4.1 "CPU: compute SampleThickness, invThickness tables")
# ---------------------------------------------------------------------------


def sphere_radius_coef(level: int, full_width: int, tan_half_fov_h,
                       screenspace_diameter: float = 10.0):
    """World-space occlusion-sphere radius per unit linear depth at `level`.

    At hierarchy level ``l`` (occlusion computed on the 1/2^l downsample), the
    sphere has screen-space *diameter* ``screenspace_diameter`` slice texels
    = ``4*screenspace_diameter`` downsampled texels.  One downsampled texel
    subtends ``2*tan_half_fov_h / W_l`` world units per unit depth, with
    ``W_l = full_width / 2^l``.  Hence

        radius(z) = (4 * diam / 2) * (2 * tanH / W_l) * z
                  = 4 * diam * tanH * 2^l / full_width * z

    This is the reference's ``ThicknessMultiplier`` math (SURVEY.md SS3.2)
    recast as an explicit geometric definition.
    """
    w_l = full_width // (1 << level)
    return 4.0 * screenspace_diameter * tan_half_fov_h / w_l


def upsample_constants(params, full_width: int, lo_width: int):
    """Host-side constants for one blur+upsample step (SURVEY.md SS3.3).

    step_size        = full_res_W / lo_res_W   (blur radius in hi-res px)
    k_blur_tolerance = (1 - 10^BlurTolerance * step_size)^2
    k_upsample_tol   = 10^UpsampleTolerance
    noise_filter_strength = 1 / (10^NoiseFilterTolerance + k_upsample_tol)

    Works for both plain floats (golden) and traced scalars (jnp): only
    ``**``/``+``/``-`` are used via the host ``10**x`` on floats or
    ``jnp.power`` on arrays -- callers pass the right kind.
    """
    import numpy as _np

    def p10(x):
        # works for python floats and numpy/jax scalars alike
        try:
            return 10.0 ** x
        except TypeError:  # pragma: no cover
            return _np.power(10.0, x)

    step_size = full_width / lo_width
    k_blur = (1.0 - p10(params.blur_tolerance) * step_size)
    # +1e-30 floors k_blur away from exact 0 (possible in-range, e.g.
    # blur_tolerance = log10(1/step_size)): the upsample weight divides
    # dd^2 by k_blur and corner-aligned taps have dd == 0 bit-exactly, so
    # k_blur == 0 would make the whole frame NaN via 0/0.  The offset is
    # below f32/f64 resolution everywhere else (shared by golden + impls).
    k_blur = k_blur * k_blur + 1e-30
    k_up = p10(params.upsample_tolerance)
    nfs = 1.0 / (p10(params.noise_filter_tolerance) + k_up)
    return step_size, k_blur, k_up, nfs


# ---------------------------------------------------------------------------
# Padding rules (SURVEY.md SS8 hard-part 4: odd resolutions)
# ---------------------------------------------------------------------------

PAD_MULTIPLE = 64  # full-res frames are padded to a multiple of 64 and cropped


def padded_shape(h: int, w: int, multiple: int = PAD_MULTIPLE) -> tuple[int, int]:
    r = lambda v: (v + multiple - 1) // multiple * multiple
    return r(h), r(w)
