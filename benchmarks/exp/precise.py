import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils.profiling import device_time_ms

cam = CameraParams(depth_mode="linear")
par = AOParams()
for spec in sys.argv[1:]:
    h, w = (int(a) for a in spec.split("x"))
    z = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, (h, w)), jnp.float32)
    fn = lambda d: ao_pipeline(d, cam, par, None, impl="auto")[0]
    med, mn = device_time_ms(fn, z, repeats=5, return_min=True)
    print(f"{h}x{w}: median {med:.4f}  min {mn:.4f} ms  {h*w/1e3/med:.0f} Mpix/s")
