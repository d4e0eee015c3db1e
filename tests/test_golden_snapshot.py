"""Frozen golden-output regression test.

The golden NumPy pipeline IS the spec (the reference mount was empty,
SURVEY.md SS0).  The property tests pin its *behavior*; this test pins its
*values* against a frozen snapshot, so a future change that alters the spec
numerically cannot slip through by updating golden and ops together.  If a
spec change is intentional, regenerate tests/data/golden_snapshot_128x192.npz
(see git history of this file for the generator) and say so in the commit.
"""

import os

import numpy as np

from tpuao.golden import reference as G
from tpuao.params import GoldenAOParams, GoldenCameraParams
from tpuao.utils import fixtures as F

SNAP = os.path.join(os.path.dirname(__file__), "data",
                    "golden_snapshot_128x192.npz")


def test_golden_matches_frozen_snapshot():
    cam = GoldenCameraParams(depth_mode="linear")
    z, n = F.spheres_on_plane(128, 192, cam, n_spheres=4, seed=3,
                              with_normals=True, backend="numpy")
    cases = {
        "default": (GoldenAOParams(), None),
        "normals": (GoldenAOParams(use_normals=True), n),
        "sparse_d2": (GoldenAOParams(exhaustive=False, hierarchy_depth=2),
                      None),
        "tuned": (GoldenAOParams(strength=2.5, rejection_falloff=6.0,
                                 noise_filter_tolerance=-1.0,
                                 blur_tolerance=-2.0,
                                 upsample_tolerance=-10.0), None),
    }
    with np.load(SNAP) as snap:
        for name, (par, normals) in cases.items():
            got = G.render_frame_golden(z, cam, par, normals=normals)
            np.testing.assert_allclose(
                got.astype(np.float32), snap[name], atol=2e-7,
                err_msg=f"golden spec drifted for case {name!r}")
