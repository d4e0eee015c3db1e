import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time
from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils.profiling import device_time_ms

cam = CameraParams(depth_mode="linear")
par = AOParams()
z = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, (1080, 1920)), jnp.float32)
fn = lambda d: ao_pipeline(d, cam, par, None, impl="auto")[0]
for k in range(6):
    med, mn = device_time_ms(fn, z, iters=800, repeats=3, return_min=True)
    print(f"{time.strftime('%H:%M:%S')}  median {med:.4f}  min {mn:.4f} ms")
