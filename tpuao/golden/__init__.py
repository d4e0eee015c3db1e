"""Executable NumPy spec of the AO pipeline (SURVEY.md SS5.1)."""
from tpuao.golden.reference import (  # noqa: F401
    linearize_depth,
    downsample2x,
    build_pyramid,
    pad_parity4,
    render_ao_level,
    noise_filter,
    bilateral_upsample2x,
    blur_upsample_step,
    render_frame_golden,
    composite,
)
