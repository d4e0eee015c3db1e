"""Transient-fault retry wrapper tests (SURVEY.md SS6 failure recovery)."""

import pytest

from tpuao.utils.resilience import is_transient, retry_transient


def test_retries_transient_then_succeeds():
    calls = {"n": 0}

    @retry_transient(retries=3, backoff_s=0.0)
    def flaky(x):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: TPU worker process crashed")
        return x * 2

    assert flaky(21) == 42
    assert calls["n"] == 3


def test_persistent_error_reraises_immediately():
    calls = {"n": 0}

    @retry_transient(retries=5, backoff_s=0.0)
    def broken(x):
        calls["n"] += 1
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        broken(1)
    assert calls["n"] == 1


def test_gives_up_after_retries():
    calls = {"n": 0}

    @retry_transient(retries=2, backoff_s=0.0)
    def always_down(x):
        calls["n"] += 1
        raise RuntimeError("INTERNAL: http://x/remote_compile: HTTP 500")

    with pytest.raises(RuntimeError):
        always_down(1)
    assert calls["n"] == 3


def test_is_transient_classifier():
    assert is_transient(RuntimeError("response body closed before"))
    assert not is_transient(RuntimeError("RESOURCE_EXHAUSTED: vmem"))


@pytest.mark.slow
def test_wraps_real_jitted_program():
    import jax.numpy as jnp
    import numpy as np
    import jax

    from tpuao.models.pipeline import ao_pipeline
    from tpuao.params import AOParams, CameraParams

    cam = CameraParams(depth_mode="linear")
    fn = retry_transient(
        jax.jit(lambda d: ao_pipeline(d, cam, AOParams(), None,
                                      impl="jnp")[0]))
    z = jnp.asarray(np.full((64, 64), 0.4, np.float32))
    out = np.asarray(fn(z))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)
