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

# Round-4 measured hardware constants (exp: /tmp probes, recorded in
# docs/PERF.md "Attribution"):
#
# * HBM_GBPS_ACHIEVED -- single-pass streaming bandwidth actually reached
#   by a fused elementwise+reduce chain on this chip: 599/718/749/747 GB/s
#   at 8/33/133/512 MB (91% of the 819 spec).  Floors computed against
#   the spec number understate what the program could reach by ~9%.
# * KERNEL_FIXED_MS -- marginal cost of one more materialized kernel in
#   an existing program, measured with optimization_barrier chains of
#   dependent 1 MB multiplies (k=1..16: 0.17-0.35 us/kernel; a tiny
#   STANDALONE program costs ~1.05 us/iteration).  205 materialized
#   ENTRY instructions at 1080p make this a ~0.07 ms term -- 22% of the
#   measured frame, invisible to pure-traffic models.
HBM_GBPS_ACHIEVED = 750.0
KERNEL_FIXED_MS = 0.00035


def stage_traffic_bytes(h: int, w: int, depth_levels: int = 4,
                        use_normals: bool = False, enable_blur: bool = True,
                        single_scale: bool = False,
                        dtype_bytes: int = 4) -> dict[str, int]:
    """Per-stage minimal HBM bytes (SURVEY.md SS4.2 DAG), keyed by the
    same stage names ``profiling.stage_times_ms`` reports.

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
    out: dict[str, int] = {}

    t = 2 * hw        # read input depth + write linz
    for l in range(1, depth_levels + 1):
        t += lv[l - 1] + lv[l]    # read parent, write level
    if use_normals:
        t += 3 * hw               # read normals
        for l in range(1, depth_levels + 1):
            t += 3 * (lv[l - 1] + lv[l])  # normal pyramid (channel planes)
    out["prepare"] = t

    for l in range(1, depth_levels + 1):
        out[f"render_l{l}"] = (2 + (3 if use_normals else 0)) * lv[l]

    if enable_blur:
        for l in range(depth_levels, 0, -1):
            out[f"upsample_l{l}"] = (
                lv[l] * (3 if l == depth_levels else 4) + 2 * lv[l - 1])
    elif not single_scale:
        out["upsample_nearest"] = lv[1] + hw
    # single_scale ([BJ] config 1, pipeline.single_scale_ao): the half-res
    # AO buffer IS the output -- no re-read, no full-res upsample write

    return {k: v * dtype_bytes for k, v in out.items()}


def min_traffic_bytes(h: int, w: int, **kw) -> int:
    """Minimal HBM bytes for one frame through the pipeline (the sum of
    ``stage_traffic_bytes``)."""
    return sum(stage_traffic_bytes(h, w, **kw).values())


def floors_ms(measured_ms: float, h: int, w: int, flops: float | None,
              transcendentals: float = 0.0, relayout: int | None = None,
              census: dict | None = None, **traffic_kw) -> dict:
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

    ``census`` (``entry_census(compiled)``): enables the round-4
    ATTRIBUTION record (VERDICT r3 item 3) -- every term between the
    algebraic floor and the measured time, named and measured:

      mem_achieved_ms   algebraic traffic at the MEASURED 750 GB/s
      relayout_ms       2x materialized relayout bytes (incl. reshapes)
      dma_ms            2x async slice/copy DMA bytes (pad aprons,
                        strided downsample slices)
      excess_ms         fusion-output bytes beyond the algebraic model
                        (padded full-res copies, parity planes) x2
      fixed_ms          n_kernels x 0.35 us marginal kernel cost
      scheduled_est_ms  the full-materialization estimate: 2x ALL
                        materialized output bytes at 750 GB/s + fixed.

    ``pct_of_scheduled`` = scheduled_est / measured.  >100% means the
    program BEATS the zero-VMEM-residency estimate (sub-frame buffers
    stayed on-chip / DMA overlapped); <100% means pipeline bubbles.
    The census is a property of ONE compiled program -- it shifts with
    the scoped-VMEM budget and autotune overrides -- so current values
    live in BENCH_DETAIL.json, not here.  Shape of the shipped record:
    every config >100%, big frames least (~130%: near the scheduled
    bandwidth limit), small/mid frames most (~215-235%: VMEM residency).
    """
    mem_ms = min_traffic_bytes(h, w, **traffic_kw) / (HBM_GBPS * 1e6)
    out = {"mem_floor_ms": round(mem_ms, 4)}
    floor = mem_ms
    flop_ms = None
    if flops is not None:
        flop_ms = (flops + transcendentals) / (VPU_F32_TFLOPS * 1e9)
        out["flop_floor_ms"] = round(flop_ms, 4)
        floor = max(floor, flop_ms)
    out["floor_ms"] = round(floor, 4)
    out["pct_of_roofline"] = round(100.0 * floor / measured_ms, 1)
    if census is not None and relayout is None:
        relayout = census["relayout"]
    if relayout is not None:
        relayout_ms = 2.0 * relayout / (HBM_GBPS * 1e6)
        out["relayout_mb"] = round(relayout / 1e6, 1)
        out["attainable_floor_ms"] = round(floor + relayout_ms, 4)
        out["pct_of_attainable"] = round(
            100.0 * (floor + relayout_ms) / measured_ms, 1)
    if census is not None:
        bw = HBM_GBPS_ACHIEVED * 1e6
        alg = min_traffic_bytes(h, w, **traffic_kw)
        attr = {
            "n_kernels": census["n_kernels"],
            "mem_achieved_ms": round(alg / bw, 4),
            "relayout_ms": round(2.0 * census["relayout"] / bw, 4),
            "dma_ms": round(2.0 * census["dma"] / bw, 4),
            "excess_ms": round(
                max(0.0, 2.0 * census["compute"] - alg) / bw, 4),
            "fixed_ms": round(census["n_kernels"] * KERNEL_FIXED_MS, 4),
        }
        sched = (2.0 * census["total"] / bw
                 + census["n_kernels"] * KERNEL_FIXED_MS)
        if flop_ms is not None:
            sched = max(sched, flop_ms)
        attr["scheduled_est_ms"] = round(sched, 4)
        out["attribution"] = attr
        out["pct_of_scheduled"] = round(100.0 * sched / measured_ms, 1)
    return out


_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "u8": 1, "s8": 1, "pred": 1}

# op kind -> census bucket.  Families (measured semantics, round-4 HLO
# audit at 1080p/4K/8K):
#   relayout -- pure data movement the interleave/layout machinery
#       materializes: layout-flip copies, transposes, materialized
#       reshapes (retiling under T(8,128)), concatenates.
#   dma      -- async slice/copy DMAs from pad_parity4 aprons and the
#       per-axis strided downsample slices ('-done' counted once; the
#       matching '-start' defines the same buffer).
#   compute  -- fusions (the actual pipeline stages).
# custom-call ConcatBitcast is ZERO-COPY (bitcast concat) and excluded.
_CENSUS_BUCKET = {
    "copy": "relayout", "transpose": "relayout", "reshape": "relayout",
    "concatenate": "relayout",
    "async-done": "dma", "copy-done": "dma", "slice-done": "dma",
    "fusion": "compute", "broadcast": "compute", "slice": "compute",
    "pad": "compute", "select-and-scatter": "compute",
    "reduce": "compute", "convert": "compute",
}

_SKIP_OPS = ("parameter", "constant", "get-tuple-element", "tuple",
             "bitcast", "custom-call", "async-start", "copy-start",
             "slice-start", "after-all")


def entry_census(compiled) -> dict:
    """Materialized-instruction census of a compiled program's ENTRY HLO.

    Returns ``{n_kernels, relayout, dma, compute, total}`` where the byte
    fields sum the OUTPUT sizes of materialized top-level instructions in
    each bucket (ops inside fusion bodies are not materialized; bitcasts
    and ConcatBitcast custom-calls are zero-copy and skipped).  This is
    the measured decomposition behind the attribution terms in
    ``floors_ms`` (VERDICT r3 item 3).
    """
    import re

    out = {"n_kernels": 0, "relayout": 0, "dma": 0, "compute": 0,
           "total": 0}
    try:
        txt = compiled.as_text()
    except Exception:  # pragma: no cover - backend without HLO text
        return out
    m = re.search(r"^ENTRY .*?^\}", txt, re.M | re.S)
    if m:
        txt = m.group(0)
    pat = re.compile(
        r"^\s*(?:ROOT )?%?[\w.-]+ = ((?:\([^)]*\)|\S+)) ([\w-]+)\(", re.M)
    shape_pat = re.compile(r"(\w+)\[([\d,]*)\]")
    for mm in pat.finditer(txt):
        shape, op = mm.groups()
        if op in _SKIP_OPS:
            continue
        out["n_kernels"] += 1
        b = 0
        for sm in shape_pat.finditer(shape):
            unit = _DTYPE_BYTES.get(sm.group(1))
            if unit is None:
                continue
            n = 1
            for d in sm.group(2).split(","):
                if d:
                    n *= int(d)
            b += n * unit
        bucket = _CENSUS_BUCKET.get(op, "compute")
        out[bucket] += b
        out["total"] += b
    return out


def relayout_bytes(compiled) -> int:
    """Materialized relayout bytes in a compiled program's ENTRY HLO
    (see ``entry_census``; since round 4 this includes materialized
    ``reshape`` retiling copies -- at 1080p those are another 22 MB the
    copy/transpose/concat parse missed)."""
    return entry_census(compiled)["relayout"]


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
