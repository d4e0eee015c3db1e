"""tpuao -- a TPU-native scalable-ambient-obscurance rendering framework.

Brand-new JAX/XLA/Pallas rebuild of the capabilities of
``keijiro/MiniEngineAO`` (Unity port of Microsoft MiniEngine's SSAO).  See
SURVEY.md for the reference analysis and the layer mapping; the public API
surface here corresponds to the reference's component layer (SURVEY.md SS2
L2-L4):

    from tpuao import AOParams, CameraParams, render_frame
    ao = render_frame(depth, camera=CameraParams(), params=AOParams())

plus ``tpuao.models.AmbientOcclusionEngine`` (stateful driver analog of
``AmbientOcclusion.cs``), ``tpuao.parallel`` (multi-view mesh sharding) and
``tpuao.golden`` (the executable NumPy spec).
"""

from tpuao.params import (  # noqa: F401
    AOParams,
    CameraParams,
    GoldenAOParams,
    GoldenCameraParams,
    PARAM_RANGES,
    build_pair_table,
)

__version__ = "0.3.0"


def render_frame(depth, camera=None, params=None, normals=None, color=None,
                 debug_outputs=False, impl="auto", out_dtype="float32"):
    """Functional entry point: full AO pipeline on one frame (lazy import).

    Same signature as ``tpuao.models.pipeline.render_frame`` (impl and
    out_dtype included -- the package-level wrapper must not narrow it).
    """
    from tpuao.models.pipeline import render_frame as _rf

    return _rf(depth, camera=camera, params=params, normals=normals,
               color=color, debug_outputs=debug_outputs, impl=impl,
               out_dtype=out_dtype)
