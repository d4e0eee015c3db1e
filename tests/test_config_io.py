"""Config persistence tests (params.save_config/load_config + engine):
the Unity serialized-component analog (SURVEY.md SS6 config system)."""

import numpy as np
import pytest

from tpuao.models.pipeline import AmbientOcclusionEngine
from tpuao.params import (AOParams, CameraParams, load_config,
                          params_from_dict, params_to_dict, save_config)


def test_roundtrip(tmp_path):
    p = AOParams(strength=2.5, rejection_falloff=4.0, hierarchy_depth=3,
                 use_normals=True, exhaustive=False)
    c = CameraParams(near=0.25, far=500.0, depth_mode="linear",
                     reversed_z=False)
    path = save_config(str(tmp_path / "ao.json"), p, c)
    p2, c2 = load_config(path)
    assert params_to_dict(p2) == params_to_dict(p)
    assert params_to_dict(c2) == params_to_dict(c)
    assert p2.hierarchy_depth == 3 and p2.use_normals and not p2.exhaustive
    assert c2.depth_mode == "linear" and not c2.reversed_z


def test_load_validates_ranges(tmp_path):
    import json

    bad = {"ao": {"strength": 99.0}, "camera": {}}
    path = tmp_path / "bad.json"
    path.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="strength"):
        load_config(str(path))


def test_unknown_field_rejected():
    with pytest.raises(ValueError, match="unknown"):
        params_from_dict(AOParams, {"strenght": 1.0})


def test_engine_roundtrip(tmp_path):
    eng = AmbientOcclusionEngine(CameraParams(depth_mode="linear"))
    eng.strength = 3.0
    eng.blur_tolerance = -2.0
    path = eng.save_config(str(tmp_path / "eng.json"))
    eng2 = AmbientOcclusionEngine.from_config(path, out_dtype="uint8")
    assert eng2.strength == 3.0 and eng2.blur_tolerance == -2.0
    assert eng2.camera.depth_mode == "linear"
    z = np.full((64, 64), 0.5, np.float32)
    out = np.asarray(eng2.render(z))
    assert out.dtype == np.uint8 and out.shape == (64, 64)
