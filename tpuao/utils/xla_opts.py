"""Default XLA compiler options for tpuao programs."""

from __future__ import annotations

import jax

# Above this many frame pixels the small scoped-VMEM budget wins (see
# tpu_compiler_options): 8K is 33 Mpix, 4K is 8.3 Mpix.
BIG_FRAME_PIXELS = 16 << 20


def tpu_compiler_options(pixels: int | None = None) -> dict | None:
    """Scoped-VMEM fusion budget, selected by frame size (measured, v5e):

    * <= 4K frames: 64 MiB lets XLA form larger fusions across the
      stencil chains — 0.89 -> 0.75 ms at 1080p in round 1; 48 MiB
      measures the same, 96/128 MiB regress, 16-24 MiB regress badly
      (1080p 0.32 -> 0.41-0.48 ms, 4K 1.45 -> 1.58 ms).
    * > BIG_FRAME_PIXELS (8K class): the opposite — 20 MiB forces
      smaller fusions whose working sets stay resident, 9.7 -> 8.1 ms
      at 8K (sweep: 16 MiB 8.22, 20 MiB 8.10, 24 MiB 8.2, 48 MiB 9.3,
      64 MiB 9.9, 96 MiB 11.4; benchmarks/exp + /tmp vmem sweeps,
      repeated across processes).

    ``pixels`` is the padded frame pixel count (None -> small-frame
    default).  Returns None off-TPU (unknown flags error elsewhere).
    """
    if jax.default_backend() != "tpu":
        return None
    kib = 20480 if (pixels is not None and pixels > BIG_FRAME_PIXELS) \
        else 65536
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
