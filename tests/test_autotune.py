"""Scoped-VMEM autotuner tests (utils/autotune.py).

The sweep itself is hardware-dependent (it measures the real compiler's
fusion behavior under each budget), so these tests inject a fake timer
and verify the MACHINERY: candidate plumbing, argmin selection, the
per-shape override table consulted by ``scoped_vmem_kib``, JSON
persistence with the device-kind guard, and the CLI front end.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuao.utils import autotune, xla_opts


@pytest.fixture(autouse=True)
def _clean_overrides():
    xla_opts.clear_tuned_vmem()
    yield
    xla_opts.clear_tuned_vmem()


def fake_timer(times_by_kib):
    """Timer stub recording the compiler_options each candidate got."""
    seen = []

    def timer(fn, *args, iters=None, compiler_options=None):
        kib = int(compiler_options["xla_tpu_scoped_vmem_limit_kib"])
        seen.append(kib)
        return times_by_kib[kib]

    timer.seen = seen
    return timer


def test_sweep_vmem_plumbs_candidates():
    t = fake_timer({16384: 3.0, 49152: 1.0})
    out = autotune.sweep_vmem(lambda x: x, jnp.zeros(4),
                              candidates=(16384, 49152), timer=t)
    assert out == {16384: 3.0, 49152: 1.0}
    assert t.seen == [16384, 49152]


def test_sweep_vmem_host_timer_via_shape_key():
    """A timer without a compiler_options parameter (the
    host_chain_time_ms shape) sweeps through the per-shape override
    table; the pre-sweep override is restored afterwards (review r3:
    forwarding compiler_options= to such a timer crashed)."""
    seen = []

    def host_timer(fn, *args, iters=None):
        kib = xla_opts.scoped_vmem_kib(640, False)
        seen.append(kib)
        return {16384: 2.0, 49152: 1.0}[kib]

    xla_opts.set_tuned_vmem(640, False, 20480)  # pre-existing override
    out = autotune.sweep_vmem(lambda x: x, jnp.zeros(4),
                              candidates=(16384, 49152),
                              timer=host_timer, shape_key=(640, False))
    assert out == {16384: 2.0, 49152: 1.0}
    assert seen == [16384, 49152]
    assert xla_opts.scoped_vmem_kib(640, False) == 20480  # restored
    # with NO prior override the sweep must leave the table clean
    seen.clear()

    def host_timer2(fn, *args, iters=None):
        seen.append(xla_opts.scoped_vmem_kib(641, False))
        return 1.0

    autotune.sweep_vmem(lambda x: x, jnp.zeros(4),
                        candidates=(16384, 49152),
                        timer=host_timer2, shape_key=(641, False))
    assert seen == [16384, 49152]
    assert xla_opts.scoped_vmem_kib(641, False) == 49152  # class default


def test_sweep_vmem_host_timer_requires_shape_key():
    def host_timer(fn, *args, iters=None):  # pragma: no cover - not called
        return 1.0

    with pytest.raises(ValueError, match="shape_key"):
        autotune.sweep_vmem(lambda x: x, jnp.zeros(4), timer=host_timer)


def test_tune_frame_applies_exact_shape_override():
    times = {16384: 0.9, 20480: 0.5, 49152: 0.7}
    t_ = fake_timer(times)
    res = autotune.tune_frame((64, 96), timer=t_, candidates=tuple(times))
    assert res["best_kib"] == 20480
    assert res["pixels"] == 64 * 96
    assert res["default_kib"] == 49152  # small-frame class
    assert set(t_.seen) == set(times)
    # exact shape now tuned; any other shape still hits the size classes
    assert xla_opts.scoped_vmem_kib(64 * 96, False) == 20480
    assert xla_opts.scoped_vmem_kib(64 * 96, True) == 49152
    assert xla_opts.scoped_vmem_kib(64 * 97, False) == 49152
    assert xla_opts.scoped_vmem_kib(17 << 20, False) == 20480  # 8K class


def test_tune_frame_normals_keys_separately():
    res = autotune.tune_frame((64, 96), use_normals=True,
                              timer=fake_timer({16384: 0.1, 49152: 0.2}),
                              candidates=(16384, 49152))
    assert res["use_normals"] is True
    assert xla_opts.scoped_vmem_kib(64 * 96, True) == 16384
    assert xla_opts.scoped_vmem_kib(64 * 96, False) == 49152


def test_save_load_roundtrip(tmp_path):
    xla_opts.set_tuned_vmem(1000, False, 20480)
    xla_opts.set_tuned_vmem(2000, True, 32768)
    path = str(tmp_path / "tuned.json")
    autotune.save_tuned(path)
    xla_opts.clear_tuned_vmem()
    assert xla_opts.scoped_vmem_kib(1000, False) == 49152
    assert autotune.load_tuned(path) == 2
    assert xla_opts.scoped_vmem_kib(1000, False) == 20480
    assert xla_opts.scoped_vmem_kib(2000, True) == 32768


def test_load_rejects_foreign_device_kind(tmp_path):
    path = str(tmp_path / "tuned.json")
    with open(path, "w") as f:
        json.dump({"device_kind": "TPU v9999",
                   "entries": [{"pixels": 1000, "use_normals": False,
                                "kib": 16384}]}, f)
    assert autotune.load_tuned(path) == 0
    assert xla_opts.scoped_vmem_kib(1000, False) == 49152
    assert autotune.load_tuned(path, strict_device=False) == 1
    assert xla_opts.scoped_vmem_kib(1000, False) == 16384


def test_load_accepts_legacy_file_without_device_kind(tmp_path):
    """A hand-written cache with no device_kind key loads like
    'unknown' (review r3: dropping its entries let a subsequent
    tune --save rewrite the file with only the fresh measurement)."""
    path = str(tmp_path / "legacy.json")
    with open(path, "w") as f:
        json.dump({"entries": [{"pixels": 1000, "use_normals": False,
                                "kib": 20480}]}, f)
    assert autotune.load_tuned(path) == 1
    assert xla_opts.scoped_vmem_kib(1000, False) == 20480


def test_cli_tune_merges_legacy_cache(tmp_path, monkeypatch, capsys):
    """tune --save on a device_kind-less cache file merges, keeping the
    prior entries."""
    from tpuao import cli

    path = str(tmp_path / "legacy.json")
    with open(path, "w") as f:
        json.dump({"entries": [{"pixels": 5, "use_normals": False,
                                "kib": 16384}]}, f)
    monkeypatch.setattr(autotune, "device_time_ms",
                        fake_timer({20480: 0.1, 49152: 0.2}))
    assert cli.main(["tune", "64x96", "--candidates", "20,48",
                     "--save", path]) == 0
    capsys.readouterr()
    with open(path) as f:
        saved = json.load(f)
    ents = {(e["pixels"], e["use_normals"]): e["kib"]
            for e in saved["entries"]}
    assert ents == {(5, False): 16384, (64 * 96, False): 20480}


def test_device_time_ms_accepts_compiler_options_off_tpu():
    # explicit options are dropped off-TPU (the xla_tpu_* flag is unknown
    # to the CPU compiler) instead of erroring
    from tpuao.utils.profiling import device_time_ms

    ms = device_time_ms(lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32),
                        iters=2, repeats=1,
                        compiler_options={
                            "xla_tpu_scoped_vmem_limit_kib": "49152"})
    assert np.isfinite(ms)  # ran end to end (CPU noise may go tiny/neg)


def test_cli_tune_and_cache(tmp_path, monkeypatch, capsys):
    from tpuao import cli

    monkeypatch.setattr(autotune, "device_time_ms",
                        fake_timer({20480: 0.4, 49152: 0.6}))
    path = str(tmp_path / "cache.json")
    rc = cli.main(["tune", "64x96", "--candidates", "20,48",
                   "--save", path])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert res["best_kib"] == 20480
    with open(path) as f:
        saved = json.load(f)
    assert saved["entries"] == [{"pixels": 64 * 96, "use_normals": False,
                                 "kib": 20480}]

    # a second tune for another shape MERGES into the same file
    monkeypatch.setattr(autotune, "device_time_ms",
                        fake_timer({20480: 0.9, 49152: 0.2}))
    assert cli.main(["tune", "32x64", "--candidates", "20,48",
                     "--save", path]) == 0
    capsys.readouterr()
    with open(path) as f:
        saved = json.load(f)
    assert len(saved["entries"]) == 2

    # render --autotune-cache loads it (smoke: tiny frame through the CLI)
    xla_opts.clear_tuned_vmem()
    from tpuao.utils.frameio import save_pfm

    z = np.full((32, 64), 0.5, np.float32)
    save_pfm(str(tmp_path / "d.pfm"), z)
    rc = cli.main(["render", str(tmp_path / "d.pfm"),
                   str(tmp_path / "ao.pfm"), "--impl", "jnp",
                   "--depth-mode", "linear",
                   "--autotune-cache", path])
    assert rc == 0
    # both entries loaded from the cache before rendering
    assert xla_opts.scoped_vmem_kib(64 * 96, False) == 20480
    capsys.readouterr()


def test_cli_tune_refuses_foreign_device_cache(tmp_path, monkeypatch,
                                               capsys):
    """tune --save must not overwrite a cache tuned on other hardware
    (save_tuned would rewrite it with only this process's entries)."""
    from tpuao import cli

    path = str(tmp_path / "c.json")
    prior = {"device_kind": "TPU v9999",
             "entries": [{"pixels": 5, "use_normals": False,
                          "kib": 16384}]}
    with open(path, "w") as f:
        json.dump(prior, f)
    monkeypatch.setattr(autotune, "device_time_ms",
                        fake_timer({20480: 0.1, 49152: 0.2}))
    rc = cli.main(["tune", "64x96", "--candidates", "20,48",
                   "--save", path])
    assert rc == 2
    capsys.readouterr()
    with open(path) as f:
        assert json.load(f) == prior  # untouched


def test_hbm_mb_reports_compiled_memory():
    from tpuao.utils import roofline as RL

    compiled = jax.jit(lambda x: x * 2.0).lower(
        jnp.zeros((8, 128), jnp.float32)).compile()
    out = RL.hbm_mb(compiled)
    assert isinstance(out, dict)
    if out:  # backend exposes memory_analysis
        assert {"args_mb", "output_mb", "temp_mb", "total_mb"} <= set(out)
        assert out["total_mb"] >= 0.0
