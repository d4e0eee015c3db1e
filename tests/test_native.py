"""Native C++ helper tests: the ctypes ray-caster must agree bit-for-bit
with the NumPy reference path (same IEEE double ops in the same order)."""

import numpy as np
import pytest

from tpuao.utils import fixtures as F
from tpuao.utils.native import get_lib


needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="native lib unavailable (no g++)")


@needs_native
def test_native_depth_bit_identical():
    a = F.spheres_on_plane(96, 144, n_spheres=5, seed=4, backend="numpy")
    b = F.spheres_on_plane(96, 144, n_spheres=5, seed=4, backend="native")
    np.testing.assert_array_equal(a, b)


@needs_native
def test_native_normals_bit_identical():
    a_d, a_n = F.spheres_on_plane(64, 96, n_spheres=4, seed=7,
                                  with_normals=True, backend="numpy")
    b_d, b_n = F.spheres_on_plane(64, 96, n_spheres=4, seed=7,
                                  with_normals=True, backend="native")
    np.testing.assert_array_equal(a_d, b_d)
    np.testing.assert_array_equal(a_n, b_n)


@needs_native
def test_native_abi():
    from tpuao.utils.native import ABI_VERSION
    assert get_lib().tpuao_native_abi_version() == ABI_VERSION


def test_numpy_fallback_works_without_native(monkeypatch):
    import tpuao.utils.fixtures as fx

    monkeypatch.setattr("tpuao.utils.native.raycast_spheres_native",
                        lambda *a, **k: None)
    z = fx.spheres_on_plane(32, 48, n_spheres=2, seed=1, backend="auto")
    assert z.shape == (32, 48)
