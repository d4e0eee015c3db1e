import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import single_scale_ao
from tpuao.params import AOParams, CameraParams
from tpuao.utils.profiling import device_time_ms
from tpuao.utils import fixtures as F

cam = CameraParams(depth_mode="linear")
p1 = AOParams(hierarchy_depth=1, enable_blur=False)
z = jax.device_put(jnp.asarray(F.spheres_on_plane(720, 1280, n_spheres=6, seed=11), jnp.float32))
f1 = jax.jit(lambda d: single_scale_ao(d, cam, p1, impl="auto"))
for _ in range(3):
    med, mn = device_time_ms(f1, z, repeats=5, return_min=True)
    print(f"720p single-scale: median {med:.4f}  min {mn:.4f} ms")
