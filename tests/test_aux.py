"""Aux subsystem tests: quality presets, debug buffer dump (SURVEY.md SS6)."""

import os

import numpy as np
import pytest

from tpuao.models.presets import PRESETS, preset
from tpuao.params import AOParams, CameraParams
from tpuao.utils.debug_dump import dump_debug_buffers, load_debug_buffers
from tpuao.utils import fixtures as F


def test_presets():
    assert preset("high") == AOParams()
    assert preset("VERY_LOW").exhaustive is False
    assert preset("ultra").use_normals is True
    with pytest.raises(ValueError):
        preset("nope")
    assert len(PRESETS) == 5


@pytest.mark.slow
def test_preset_renders():
    from tpuao.models.pipeline import render_frame

    z = F.spheres_on_plane(64, 64, n_spheres=2, seed=1)
    for name in ("VERY_LOW", "MEDIUM"):
        ao = np.asarray(render_frame(z, CameraParams(depth_mode="linear"),
                                     preset(name), impl="jnp"))
        assert ao.shape == (64, 64)


def test_debug_dump_roundtrip(tmp_path):
    from tpuao.models.pipeline import render_frame

    z = F.spheres_on_plane(64, 64, n_spheres=2, seed=1)
    ao, dbg = render_frame(z, CameraParams(depth_mode="linear"), AOParams(),
                           debug_outputs=True, impl="jnp")
    path = str(tmp_path / "dump")
    names = dump_debug_buffers(dbg, path)
    assert any("linear_z" in n for n in names)
    assert any("ao_levels" in n for n in names)
    # dump appended .npz when tensorstore was unavailable; load must work
    # with whichever artifact exists on disk
    artifact = path if os.path.isdir(path) else path + ".npz"
    loaded = load_debug_buffers(artifact)
    key = next(k for k in loaded if "linear_z" in k)
    np.testing.assert_allclose(loaded[key], np.asarray(dbg["linear_z"]))


def test_debug_dump_npz(tmp_path):
    d = {"a": np.ones((4, 4)), "nested": {"b": np.zeros((2, 2))}}
    p = str(tmp_path / "x.npz")
    names = dump_debug_buffers(d, p)
    assert names == ["a", "nested/b"]
    loaded = load_debug_buffers(p)
    # load restores the '/'-nested keys (identical to the zarr backend)
    assert set(loaded) == {"a", "nested/b"}
    np.testing.assert_array_equal(loaded["nested/b"], np.zeros((2, 2)))


def test_compiler_options_size_classes(monkeypatch):
    """The scoped-VMEM budget flips for >16 Mpix frames (measured: small
    budgets regress <=4K 10-30%, large budgets regress 8K ~20%)."""
    import tpuao.utils.xla_opts as X

    monkeypatch.setattr(X.jax, "default_backend", lambda: "tpu")
    assert X.tpu_compiler_options(None)[
        "xla_tpu_scoped_vmem_limit_kib"] == "49152"
    assert X.tpu_compiler_options(1080 * 1920)[
        "xla_tpu_scoped_vmem_limit_kib"] == "49152"
    assert X.tpu_compiler_options(2176 * 3840)[  # 4K padded: small class
        "xla_tpu_scoped_vmem_limit_kib"] == "49152"
    assert X.tpu_compiler_options(4352 * 7680)[  # 8K: big class
        "xla_tpu_scoped_vmem_limit_kib"] == "20480"
    # normals shift every >4 Mpix class down one notch (r3 sweeps) ...
    assert X.scoped_vmem_kib(2176 * 3840, use_normals=True) == 32768
    assert X.scoped_vmem_kib(4352 * 7680, use_normals=True) == 16384
    # ... but not 1080p-class frames
    assert X.scoped_vmem_kib(1088 * 1920, use_normals=True) == 49152
    monkeypatch.setattr(X.jax, "default_backend", lambda: "cpu")
    assert X.tpu_compiler_options(4352 * 7680) is None
