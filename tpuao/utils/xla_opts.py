"""Default XLA compiler options for tpuao programs."""

from __future__ import annotations

import jax


def tpu_compiler_options() -> dict | None:
    """Raising the scoped-VMEM fusion budget to 64 MiB lets XLA form larger
    fusions across the stencil chains: measured 0.89 -> 0.75 ms for the full
    1080p pipeline on v5e (96/128 MiB regress; 4K unchanged).  None off-TPU
    (unknown flags error on other backends)."""
    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    return None
