"""Image <-> buffer IO (SURVEY.md SS5.3: pipeline tests on synthetic depth
plus procedural depth from image files).

Thin PIL/OpenCV-based helpers; everything returns/accepts the framework's
buffer conventions (float depth = normalized linear eye depth, AO in [0,1]).
"""

from __future__ import annotations

import numpy as np


def load_depth_image(path: str, near01: float = 0.05,
                     far01: float = 1.0) -> np.ndarray:
    """Load a grayscale image as a procedural linear-depth buffer.

    Pixel intensity maps linearly to [near01, far01] (bright = far).  This
    is a *procedural* test source (any photo becomes a depth field), not a
    depth decoder.
    """
    from PIL import Image

    img = Image.open(path).convert("L")
    a = np.asarray(img, dtype=np.float64) / 255.0
    return near01 + a * (far01 - near01)


def encode_ao_png(ao) -> bytes:
    """Encode a [0,1] buffer as 8-bit PNG bytes: (H, W) AO -> grayscale,
    (H, W, 3) composited color -> RGB.

    THE quantization convention (round-half-up to R8) -- the CLI, the
    serving endpoint, and ``save_ao_image`` all share this one encoder so
    the convention cannot diverge between surfaces."""
    import io

    from PIL import Image

    a = np.clip(np.asarray(ao, dtype=np.float64), 0.0, 1.0)
    buf = io.BytesIO()
    Image.fromarray((a * 255.0 + 0.5).astype(np.uint8)).save(buf,
                                                             format="PNG")
    return buf.getvalue()


def save_ao_image(ao, path: str) -> str:
    """Save a [0,1] AO buffer as an 8-bit grayscale PNG."""
    with open(path, "wb") as f:
        f.write(encode_ao_png(ao))
    return path


def save_composite_image(color, ao, path: str) -> str:
    """Multiply AO into an (H, W, 3) [0,1] color frame and save as PNG."""
    from PIL import Image

    c = np.clip(np.asarray(color, dtype=np.float64), 0.0, 1.0)
    a = np.clip(np.asarray(ao, dtype=np.float64), 0.0, 1.0)
    out = c * a[..., None]
    Image.fromarray((out * 255.0 + 0.5).astype(np.uint8)).save(path)
    return path
