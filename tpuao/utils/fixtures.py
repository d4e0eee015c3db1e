"""Synthetic depth/normal scene fixtures.

The reference validates with a Unity test scene inspected visually
(``Assets/Test/``, SURVEY.md SS3.0/SS5); this module is its automated
equivalent: a tiny CPU ray-caster producing analytic depth + normal buffers
(spheres on a ground plane) plus degenerate fixtures (flat plane, step edge,
corner) with hand-derivable AO behavior for the property tests in SS5.1.

All outputs follow the spec conventions of tpuao.golden.reference:
depth = normalized linear eye depth z_eye/far; normals in buffer view space
(x=+col, y=+row, z=toward camera).  ``to_hardware_depth`` converts to a
reversed-Z hardware buffer for exercising the linearize stage.

A native C++ version of the ray-caster lives in native/ (built on demand);
this NumPy version is the fallback and the correctness reference for it.
"""

from __future__ import annotations

import numpy as np

from tpuao.params import GoldenCameraParams


def to_hardware_depth(linear01: np.ndarray, camera: GoldenCameraParams) -> np.ndarray:
    """Invert LinearZ: z/far -> reversed-Z hardware depth d with
    1/(zmagic*d+1) == linear01."""
    zmagic = (camera.far - camera.near) / camera.near
    d = (1.0 / np.clip(linear01, 1e-9, None) - 1.0) / zmagic
    d = np.clip(d, 0.0, 1.0)
    return d if camera.reversed_z else 1.0 - d


def flat_plane(h: int, w: int, z01: float = 0.3) -> np.ndarray:
    """Constant-depth wall facing the camera: AO must be exactly 1."""
    return np.full((h, w), z01, dtype=np.float64)


def step_edge(h: int, w: int, z_near: float = 0.2, z_far: float = 0.6,
              axis: int = 1) -> np.ndarray:
    """Foreground half-plane over background: a depth discontinuity.  The
    background side near the edge must NOT darken much (haze rejection);
    occlusion concentrates nowhere on a flat step (both halves are planes)."""
    z = np.full((h, w), z_far, dtype=np.float64)
    if axis == 1:
        z[:, : w // 2] = z_near
    else:
        z[: h // 2, :] = z_near
    return z


def corner(h: int, w: int, z_base: float = 0.5, slope: float = 0.001) -> np.ndarray:
    """Concave V-groove: two planes sloping toward the camera away from the
    center column, deepest at the crease.  Pixels ON the crease see geometry
    in front on *both* sides -> AO < 1 there, while pixels on a single sloped
    wall are rescued by the pair-rejection coupling -> AO ~ 1."""
    c = np.abs(np.arange(w) - w / 2.0)
    z = np.clip(z_base - slope * c, 0.05, 1.0)
    return np.broadcast_to(z, (h, w)).astype(np.float64).copy()


def sphere_scene_params(n_spheres: int, seed: int, plane_y: float = 1.5):
    """Random sphere (centers, radii) resting on the ground plane."""
    rng = np.random.default_rng(seed)
    centers, radii = [], []
    for _ in range(n_spheres):
        r = rng.uniform(0.3, 0.9)
        cx = rng.uniform(-3.0, 3.0)
        cz = rng.uniform(4.0, 14.0)
        centers.append((cx, plane_y - r, cz))
        radii.append(r)
    return np.array(centers, np.float64).reshape(-1, 3), np.array(radii)


def spheres_on_plane(
    h: int,
    w: int,
    camera: GoldenCameraParams | None = None,
    n_spheres: int = 5,
    seed: int = 0,
    with_normals: bool = False,
    backend: str = "auto",
    eye=None,
):
    """Analytic ray-cast of random spheres resting on a ground plane.

    Camera at origin looking down +z (view direction), ground plane is
    y = +1.5 (buffer y points down, so the floor is below image center).
    Returns depth (H,W) [and normals (H,W,3) in buffer view space].

    ``eye``: optional world-space camera position (x, y, z) for a
    translation-only camera path -- the SAME world scene raycast from a
    moved eye (centers and plane shift by ``-eye``).  The matching
    world->eye view matrix is ``translation(-eye)``; consecutive eyes
    give ``relative_motion(V_prev, V_curr) == translation(e_curr -
    e_prev)`` (utils/camera.py), which is what temporal-sequence demos
    and tests feed the reprojection resolve.

    ``backend``: 'auto' uses the native C++ ray-caster (native/raycast.cpp,
    bit-identical to the NumPy path) when it builds, else NumPy; 'numpy' /
    'native' force a path.
    """
    camera = camera or GoldenCameraParams()
    tanh = float(np.asarray(camera.tan_half_fov_h))
    tanv = tanh * h / w
    far = float(np.asarray(camera.far))
    plane_y = 1.5
    centers_arr, radii_arr = sphere_scene_params(n_spheres, seed, plane_y)
    if eye is not None:
        ex, ey, ez = (float(v) for v in np.asarray(eye, np.float64))
        centers_arr = centers_arr - np.asarray([ex, ey, ez])
        plane_y = plane_y - ey

    if backend in ("auto", "native"):
        from tpuao.utils.native import raycast_spheres_native

        res = raycast_spheres_native(h, w, tanh, tanv, far, plane_y,
                                     centers_arr, radii_arr, with_normals)
        if res is not None:
            return res
        if backend == "native":
            raise RuntimeError("native ray-caster unavailable (no g++?)")

    # Ray directions per pixel (unit z component form: dir = (u, v, 1)).
    u = (np.arange(w) + 0.5) / w * 2.0 - 1.0
    v = (np.arange(h) + 0.5) / h * 2.0 - 1.0
    U, V = np.meshgrid(u * tanh, v * tanv)

    # Ground plane y = plane_y (normal toward camera = -y in world = (0,-1,0);
    # buffer convention flips z: stored normal z is +toward camera).
    denom = np.where(np.abs(V) < 1e-6, 1e-6, V)
    t_plane = plane_y / denom  # ray param so that y = V*t = plane_y
    t_plane = np.where(t_plane > 0, t_plane, np.inf)

    t_best = t_plane
    hit_id = np.where(np.isfinite(t_plane), -1, -2)  # -1 plane, -2 sky

    centers = [tuple(c) for c in centers_arr]
    radii = list(radii_arr)
    for i, ((cx, cy, cz), r) in enumerate(zip(centers, radii)):
        # |o + t*dir - c|^2 = r^2 with o=0, dir=(U,V,1) (not unit).
        a = U * U + V * V + 1.0
        b = -2.0 * (U * cx + V * cy + cz)
        c0 = cx * cx + cy * cy + cz * cz - r * r
        disc = b * b - 4 * a * c0
        t = np.where(
            disc >= 0, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), np.inf
        )
        t = np.where(t > 0, t, np.inf)
        closer = t < t_best
        t_best = np.where(closer, t, t_best)
        hit_id = np.where(closer, i, hit_id)

    z_eye = np.where(np.isfinite(t_best), t_best, far)  # dir z-component is 1
    z01 = np.clip(z_eye / far, 1e-4, 1.0)

    if not with_normals:
        return z01

    # World normals -> buffer view space (x=+col, y=+row, z=toward camera).
    nx = np.zeros((h, w))
    ny = np.zeros((h, w))
    nz = np.ones((h, w))
    # plane: world normal (0,-1,0) (up, toward camera side): buffer y = +row
    # is world +y (down), z toward camera flips sign of world z component.
    pm = hit_id == -1
    nx[pm], ny[pm], nz[pm] = 0.0, -1.0, 0.0
    for i, ((cx, cy, cz), r) in enumerate(zip(centers, radii)):
        m = hit_id == i
        if not m.any():
            continue
        px = U[m] * t_best[m]
        py = V[m] * t_best[m]
        pz = t_best[m]
        gx, gy, gz = (px - cx) / r, (py - cy) / r, (pz - cz) / r
        nx[m], ny[m], nz[m] = gx, gy, -gz  # flip z: stored z = toward camera
    # Sky: camera-facing default (0,0,1).  Guard nz >= 0 (front faces only).
    nz = np.maximum(nz, 1e-3)
    norm = np.sqrt(nx * nx + ny * ny + nz * nz)
    normals = np.stack([nx / norm, ny / norm, nz / norm], axis=-1)
    return z01, normals
