import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils.profiling import device_time_ms

cam = CameraParams(depth_mode="linear")
par = AOParams()
z = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, (1080, 1920)), jnp.float32)
for impl in ("auto", "fused", "pallas"):
    fn = lambda d: ao_pipeline(d, cam, par, None, impl=impl)[0]
    ms = device_time_ms(fn, z, iters=600)
    print(f"impl={impl:7s} {ms:7.3f} ms")
