"""utils.caches -- compiled-program cache control.

The slow pytest tier's measured failure mode (r5): one process
accumulating every compiled executable climbs past 7 GB RSS and XLA's
CPU backend segfaults inside backend_compile_and_load.  These tests pin
the remedy: cache discovery finds the memoized builders, clearing drops
entries and a re-render after clearing is bit-identical (pure
memoization, no behavior change), and the serving maintenance route
exposes the same sweep to operators of long-lived servers.
"""

from __future__ import annotations

import json
import threading
import urllib.request

import numpy as np
import pytest

from tpuao.utils import caches


def _render_small():
    from tpuao.models.pipeline import render_frame
    from tpuao.params import AOParams, CameraParams
    from tpuao.utils import fixtures as F

    z = F.spheres_on_plane(64, 96, n_spheres=2, seed=7).astype(np.float32)
    return np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                   AOParams()))


def test_discovery_finds_memoized_builders():
    import tpuao.models.pipeline  # noqa: F401 -- ensure builders are loaded

    fns = caches.program_cache_functions()
    names = {f.__wrapped__.__module__ + "." + f.__wrapped__.__qualname__
             for f in fns}
    assert any("pipeline" in n for n in names), names
    # every discovered entry is an lru_cache wrapper over tpuao code
    for f in fns:
        assert hasattr(f, "cache_clear") and hasattr(f, "cache_info")


def test_clear_drops_entries_and_render_is_unchanged():
    before = _render_small()
    dropped = caches.clear_program_caches()
    assert dropped >= 1  # at least the pipeline jit wrapper was cached
    after = _render_small()  # recompiles from scratch
    np.testing.assert_array_equal(before, after)
    # the builders repopulate on use
    total = sum(f.cache_info().currsize
                for f in caches.program_cache_functions())
    assert total >= 1


def test_serving_maintenance_route():
    from tpuao import serving as S

    srv = S.make_server(0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        from tpuao.client import AOClient
        from tpuao.utils import fixtures as F

        z = F.spheres_on_plane(64, 96, n_spheres=2, seed=7)
        c = AOClient(base)
        first = c.render(z.astype(np.float32))

        r = urllib.request.urlopen(urllib.request.Request(
            base + "/maintenance/clear-caches", data=b"", method="POST"),
            timeout=30)
        body = json.loads(r.read())
        assert r.status == 200 and body["dropped"] >= 1

        # warm state is declared stale...
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(base + "/healthz", timeout=10)
        assert ei.value.code == 503
        # ...and the very next render recompiles and still matches
        again = c.render(z.astype(np.float32))
        np.testing.assert_array_equal(first, again)
        stats = json.loads(urllib.request.urlopen(
            base + "/stats", timeout=10).read())
        assert stats["cache_clears"] == 1
    finally:
        srv.shutdown()
        srv.server_close()
