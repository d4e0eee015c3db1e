"""Default XLA compiler options for tpuao programs."""

from __future__ import annotations

import jax

# Above this many frame pixels the small scoped-VMEM budget wins (see
# tpu_compiler_options): 8K is 33 Mpix, 4K is 8.3 Mpix.
BIG_FRAME_PIXELS = 16 << 20
# Above this many pixels the NORMALS program prefers a mid budget (4K
# with normals: 8.5 Mpix > this; 1080p with normals: 2.1 Mpix < this).
NORMALS_MID_PIXELS = 4 << 20


# Autotuned per-shape overrides: (frame pixels, use_normals) -> KiB.
# Filled by utils.autotune (exact-shape measurements beat the three
# hand-measured size classes below for shapes nobody swept by hand);
# consulted first by scoped_vmem_kib.
_TUNED: dict[tuple[int, bool], int] = {}


def set_tuned_vmem(pixels: int, use_normals: bool, kib: int) -> None:
    _TUNED[(int(pixels), bool(use_normals))] = int(kib)


def clear_tuned_vmem() -> None:
    _TUNED.clear()


def scoped_vmem_kib(pixels: int | None = None,
                    use_normals: bool = False) -> int:
    """Scoped-VMEM fusion budget in KiB, by frame-size class (measured,
    v5e):

    * <= 4K depth frames (and any frame with unknown size): 48 MiB. A
      large budget lets XLA form big fusions across the stencil chains
      (0.89 -> 0.75 ms at 1080p in round 1 vs the default), but the top
      end hurts: in-process sweeps give 4K 40 MiB 1.420 / 48 MiB 1.427 /
      64 MiB 1.461 / 80 MiB 1.63 / 96+ worse, and 1080p 48 = 64 (0.322)
      while 16-24 MiB regress badly (0.41-0.48 ms).
    * > BIG_FRAME_PIXELS (8K class): the opposite — 20 MiB forces
      smaller fusions whose working sets stay resident, 9.7 -> 8.1 ms
      at 8K (sweep: 16 MiB 8.22, 20 MiB 8.10, 24 MiB 8.2, 48 MiB 9.3,
      64 MiB 9.9, 96 MiB 11.4; benchmarks/exp + /tmp vmem sweeps,
      repeated across processes).
    * NORMALS programs above NORMALS_MID_PIXELS: 32 MiB — the two extra
      full-res slope planes raise the per-pixel live set, shifting the
      optimum down one notch (r3 sweep, exp/vmem_normals.py: 4K+normals
      32 MiB 2.86 / 28 2.99 / 36 2.95 / 48 3.08 / 64 3.20 / 96+ blows
      up; 1080p+normals still prefers 48: 0.517 vs 0.555 at 32).  The
      same shift applies in the big-frame class: 8K+normals prefers
      16 MiB (21.96) over the depth-only 20 MiB (23.16); 24/32/48 all
      worse.
    """
    if pixels is not None:
        tuned = _TUNED.get((int(pixels), bool(use_normals)))
        if tuned is not None:
            return tuned
    if pixels is not None and pixels > BIG_FRAME_PIXELS:
        return 16384 if use_normals else 20480
    if use_normals and pixels is not None and pixels > NORMALS_MID_PIXELS:
        return 32768
    return 49152


def tpu_compiler_options(pixels: int | None = None,
                         use_normals: bool = False) -> dict | None:
    """Compiler options for a tpuao program (see ``scoped_vmem_kib``).

    ``pixels`` is the padded frame pixel count (None -> small-frame
    default).  Returns None off-TPU (unknown flags error elsewhere).
    """
    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib":
            str(scoped_vmem_kib(pixels, use_normals))}
