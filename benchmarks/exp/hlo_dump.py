import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils.xla_opts import tpu_compiler_options

cam = CameraParams(depth_mode="linear")
p = AOParams()
fn = jax.jit(lambda d: ao_pipeline(d, cam, p, None, impl="auto")[0],
             compiler_options=tpu_compiler_options())
h, w = (int(a) for a in sys.argv[1].split("x"))
x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, (h, w)), jnp.float32)
c = fn.lower(x).compile()
txt = c.as_text()
open(f"/root/repo/benchmarks/exp/hlo_{h}x{w}.txt", "w").write(txt)
print("HLO lines:", txt.count("\n"))
