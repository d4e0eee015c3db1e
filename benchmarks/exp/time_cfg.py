"""R2: time the frame program + memory analysis at given sizes."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils.profiling import device_time_ms
from tpuao.utils.xla_opts import tpu_compiler_options

cam = CameraParams(depth_mode="linear")
p = AOParams()
fn = lambda d: ao_pipeline(d, cam, p, None, impl="auto")[0]
jfn = jax.jit(fn, compiler_options=tpu_compiler_options())
for spec in sys.argv[1:]:
    h, w = (int(a) for a in spec.split("x"))
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, (h, w)), jnp.float32)
    c = jfn.lower(x).compile()
    m = c.memory_analysis()
    med, mn = device_time_ms(fn, x, iters=20, return_min=True)
    print(f"{h}x{w}: median {med:.3f} ms  min {mn:.3f} ms  "
          f"{h*w/1e6/(med/1e3):.0f} Mpix/s  temp {m.temp_size_in_bytes/1e6:.0f} MB")
