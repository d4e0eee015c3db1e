#!/usr/bin/env python
"""Calibration demo: recover AO tunables from a target image by gradient.

    python examples/calibrate.py [HxW]

Renders a target AO with "unknown" settings, then fits strength and
rejection_falloff from the defaults with models.autodiff.fit_tunables
(projected Adam on the MSE, one jitted lax.scan).  The reference has no
analog -- its tunables are hand-set sliders.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from tpuao.models.autodiff import fit_tunables
from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils import fixtures as F


def main(argv):
    size = next((a for a in argv[1:] if "x" in a), "180x320")
    steps = (int(argv[argv.index("--steps") + 1])
             if "--steps" in argv else 80)
    h, w = (int(v) for v in size.split("x"))
    cam = CameraParams(depth_mode="linear")
    z = F.spheres_on_plane(h, w, cam, n_spheres=5, seed=11)

    hidden = AOParams(strength=1.8, rejection_falloff=4.0)
    target = ao_pipeline(z, cam, hidden, None)[0]

    fitted, losses = fit_tunables(
        z, target, cam, fit=("strength", "rejection_falloff"),
        steps=steps, lr=0.08)
    losses = np.asarray(losses)
    print(f"loss: {losses[0]:.2e} -> {losses[-1]:.2e} over {len(losses)} steps")
    print(f"strength:           {float(fitted.strength):.3f}  (true 1.8)")
    print(f"rejection_falloff:  {float(fitted.rejection_falloff):.3f}  (true 4.0)")


if __name__ == "__main__":
    main(sys.argv)
