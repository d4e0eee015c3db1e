"""Process-level compiled-program cache control.

Compiled executables stay reachable from two layers: JAX's own global
pjit/compilation caches, and tpuao's memoized program builders (the
``functools.lru_cache``'d jit / shard_map wrapper factories in
``models/pipeline.py`` and ``parallel/*``, plus the profiling chain
cache in ``utils/profiling.py``).  In a long-lived process that
compiles many distinct geometries — the full ``--slow`` pytest tier
fuzzes hundreds of shapes; a serving process sees arbitrary client
geometries — that working set grows without bound.

Measured failure mode (r5, 1-CPU test host): the slow tier's single
pytest process climbs past 7 GB RSS and XLA's CPU backend eventually
SEGFAULTS inside ``backend_compile_and_load`` — deterministic at the
~300th test, but the test passes in isolation and every <100-test
subset passes, i.e. pure accumulation, no poison test.  Clearing both
cache layers between test modules (``tests/conftest.py``) bounds the
growth and removes the crash.

:func:`clear_program_caches` drops both layers so the executables (and
the LLVM JIT code memory backing them on the CPU backend) become
collectable.  Callers pay recompiles afterwards, so this is process
-lifetime hygiene (between test modules, on a serving maintenance
sweep), never a hot-path call — through the axon relay a single TPU
recompile costs 20-90 s.
"""

from __future__ import annotations

import gc
import sys


def program_cache_functions() -> list:
    """Every ``functools.lru_cache``-wrapped callable defined in a
    loaded ``tpuao`` module (the memoized program builders).

    Discovered dynamically so new builders are covered without
    registration; detection is duck-typed on the ``cache_clear`` /
    ``cache_info`` pair the stdlib wrapper exposes.
    """
    seen: dict[int, object] = {}
    for name, mod in list(sys.modules.items()):
        if not (name == "tpuao" or name.startswith("tpuao.")) or mod is None:
            continue
        for attr in vars(mod).values():
            if (callable(attr) and hasattr(attr, "cache_clear")
                    and hasattr(attr, "cache_info")):
                seen.setdefault(id(attr), attr)
    return list(seen.values())


def clear_program_caches() -> int:
    """Drop every tpuao program cache plus JAX's global compilation
    caches, then force a GC pass; returns the number of tpuao-side
    cache entries dropped (for observability — serving reports it).

    Safe at any quiescent point: all cleared caches are pure
    memoization, so behavior is unchanged and the cost is recompiles
    on next use.
    """
    import jax

    dropped = 0
    for fn in program_cache_functions():
        try:
            dropped += fn.cache_info().currsize
        except Exception:
            pass
        fn.cache_clear()

    # the profiling chain cache is a plain dict (keys embed argument
    # signatures, not hashable args), not an lru_cache
    try:
        from tpuao.utils import profiling

        dropped += len(profiling._CHAIN_CACHE)
        profiling._CHAIN_CACHE.clear()
    except Exception:
        pass

    jax.clear_caches()
    gc.collect()
    return dropped
