"""Roofline accounting for the AO pipeline (VERDICT r1 item 6).

Turns a measured ms/frame into "percent of speed-of-light" on one v5e chip
so the bench numbers are defensible: the floor is
``max(HBM-traffic / bandwidth, VPU-flops / throughput)``.

Hardware model (TPU v5 lite, public numbers; documented assumptions):

* ``HBM_GBPS = 819``  -- HBM bandwidth per chip.
* ``VPU_F32_TFLOPS = 6.1`` -- the AO pipeline runs entirely on the VPU
  (elementwise f32; no matmuls, so the MXU's 197 bf16 TFLOP/s is
  irrelevant).  The VPU is 4 ALU sub-units of (8, 128) lanes at the
  ~1.5 GHz core clock: 4 * 1024 * 1.5e9 = 6.1 T f32 op/s.  Divides and
  transcendentals cost several ALU ops each; the flop counts below come
  from XLA's post-compile ``cost_analysis`` which already expands them.

HBM traffic model (the ``min_traffic_bytes`` floor): every materialized
buffer is written once and read once per consumer; everything inside one
stage is perfectly fused (true of the measured program: the buffer dump
shows temps ~= 0 at 1080p).  Reads of a strided subset still count the
full buffer (DMA moves whole (8,128) tiles).  This is a *floor*: real
executions re-read inputs across fusion boundaries.
"""

from __future__ import annotations

HBM_GBPS = 819.0
VPU_F32_TFLOPS = 6.1


def min_traffic_bytes(h: int, w: int, depth_levels: int = 4,
                      use_normals: bool = False, enable_blur: bool = True,
                      single_scale: bool = False,
                      dtype_bytes: int = 4) -> int:
    """Minimal HBM bytes for one frame through the pipeline.

    Stages and their unavoidable buffer traffic (SURVEY.md SS4.2 DAG):

      prepare : read depth (HW); write linz (HW); write each pyramid level.
                (Each level is produced by slicing its parent, which was
                just written -- count one read of the parent per level.)
      render  : per level, read the level + write the AO estimate.
      chain   : per step, read combined + premin AO + lo depth + hi depth,
                write the upsampled result (at hi res).
      output  : the final combined IS the output write (counted in chain).
    """
    hw = h * w
    lv = [hw // (4 ** l) for l in range(depth_levels + 1)]  # level sizes

    t = hw            # read input depth
    t += hw           # write linz
    for l in range(1, depth_levels + 1):
        t += lv[l - 1]    # read parent (downsample)
        t += lv[l]        # write level
    if use_normals:
        t += 3 * hw       # read normals
        for l in range(1, depth_levels + 1):
            t += 3 * (lv[l - 1] + lv[l])  # normal pyramid (channel planes)

    for l in range(1, depth_levels + 1):
        t += 2 * lv[l]    # render: read level, write AO_l
        if use_normals:
            t += 3 * lv[l]

    if enable_blur:
        for l in range(depth_levels, 0, -1):
            # read combined@l, AO_l (premin, all but coarsest), lo depth@l,
            # hi depth@l-1; write combined@l-1
            t += lv[l] * (3 if l == depth_levels else 4)
            t += 2 * lv[l - 1]
    elif not single_scale:
        t += lv[1] + hw   # nearest-upsample the finest AO
    # single_scale ([BJ] config 1, pipeline.single_scale_ao): the half-res
    # AO buffer IS the output -- no re-read, no full-res upsample write

    return t * dtype_bytes


def floors_ms(measured_ms: float, h: int, w: int, flops: float | None,
              transcendentals: float = 0.0, relayout: int | None = None,
              **traffic_kw) -> dict:
    """Roofline floors + achieved fraction for one config.

    ``flops``/``transcendentals`` come from the compiled executable's
    ``cost_analysis()`` (XLA's own op counts); pass None to skip the
    compute floor.  Transcendentals (exp/log of the strength power) run
    ~1 per VPU lane-cycle, so they add 1:1 to the op count.

    ``relayout``: materialized data-movement bytes the COMPILED program
    actually schedules (``relayout_bytes``).  The algebraic floor above
    assumes zero relayout, but the measured program's interleave/layout
    copies are structural under XLA (docs/PERF.md): adding their traffic
    (2x: read + write) gives an *attainable* floor, and
    ``pct_of_attainable`` reports how close the program is to what this
    compiler can actually reach (VERDICT r2 next-item 7).
    """
    mem_ms = min_traffic_bytes(h, w, **traffic_kw) / (HBM_GBPS * 1e6)
    out = {"mem_floor_ms": round(mem_ms, 4)}
    floor = mem_ms
    if flops is not None:
        flop_ms = (flops + transcendentals) / (VPU_F32_TFLOPS * 1e9)
        out["flop_floor_ms"] = round(flop_ms, 4)
        floor = max(floor, flop_ms)
    out["floor_ms"] = round(floor, 4)
    out["pct_of_roofline"] = round(100.0 * floor / measured_ms, 1)
    if relayout is not None:
        relayout_ms = 2.0 * relayout / (HBM_GBPS * 1e6)
        out["relayout_mb"] = round(relayout / 1e6, 1)
        out["attainable_floor_ms"] = round(floor + relayout_ms, 4)
        out["pct_of_attainable"] = round(
            100.0 * (floor + relayout_ms) / measured_ms, 1)
    return out


def relayout_bytes(compiled) -> int:
    """Materialized relayout bytes in a compiled program's ENTRY HLO.

    Sums the output sizes of top-level ``copy`` / ``transpose`` /
    ``concatenate`` instructions -- pure data movement the scheduler
    materializes (ops inside fusion bodies are not materialized and are
    not counted; ``bitcast``/free reshapes carry no traffic).  The same
    parse as the benchmarks/exp/pipeline_overhead.py audit, packaged for
    the bench harness.
    """
    import re

    import numpy as np

    try:
        txt = compiled.as_text()
    except Exception:  # pragma: no cover - backend without HLO text
        return 0
    m = re.search(r"^ENTRY .*?^\}", txt, re.M | re.S)
    if m:
        txt = m.group(0)
    pat = re.compile(
        r"^\s*(?:ROOT )?%?[\w.-]+ = (f32|bf16|u8|s32)\[([\d,]*)\][^ ]* "
        r"(copy|transpose|concatenate)\(", re.M)
    total = 0
    for mm in pat.finditer(txt):
        dims = [int(d) for d in mm.group(2).split(",") if d]
        if not dims:
            continue
        unit = 1 if mm.group(1) == "u8" else (2 if mm.group(1) == "bf16"
                                              else 4)
        total += int(np.prod(dims)) * unit
    return total


def hbm_mb(compiled) -> dict:
    """Peak-HBM summary (MB) from a compiled executable's buffer assignment.

    The reference's analog is its ~15-render-texture inventory (SURVEY.md
    SS3.0): a deployment sizes its HBM by ``args + outputs + temps``.
    ``temp_mb`` is also the standing regression guard for the r1 interleave
    layout bug (a 64x tile-padded temp shows up here long before OOM).
    """
    try:
        ma = compiled.memory_analysis()
    except Exception:  # pragma: no cover - backend without the analysis
        return {}
    if ma is None:  # pragma: no cover
        return {}

    def mb(name):
        return round(float(getattr(ma, name, 0) or 0) / 1e6, 1)

    out = {"args_mb": mb("argument_size_in_bytes"),
           "output_mb": mb("output_size_in_bytes"),
           "temp_mb": mb("temp_size_in_bytes")}
    out["total_mb"] = round(sum(out.values())
                            - mb("alias_size_in_bytes"), 1)
    return out


def cost_counts(compiled) -> tuple[float | None, float]:
    """(flops, transcendentals) from a jax compiled executable."""
    try:
        ca = compiled.cost_analysis()
        d = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(d.get("flops", 0.0)), float(d.get("transcendentals", 0.0))
    except Exception:  # pragma: no cover - cost analysis is best-effort
        return None, 0.0
