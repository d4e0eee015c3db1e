"""R2 exp 1: memory/cost analysis of the frame program at 1080p vs 4K."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils.xla_opts import tpu_compiler_options

cam = CameraParams(depth_mode="linear")
p = AOParams()
fn = jax.jit(lambda d: ao_pipeline(d, cam, p, None, impl="auto")[0],
             compiler_options=tpu_compiler_options())
for h, w in ((1080, 1920), (2160, 3840)):
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, (h, w)), jnp.float32)
    c = fn.lower(x).compile()
    m = c.memory_analysis()
    print(f"== {h}x{w}")
    print("  temp bytes: %.1f MB" % (m.temp_size_in_bytes / 1e6))
    print("  output bytes: %.1f MB" % (m.output_size_in_bytes / 1e6))
    print("  argument bytes: %.1f MB" % (m.argument_size_in_bytes / 1e6))
    ca = c.cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    if d:
        for k in ("bytes accessed", "flops", "transcendentals"):
            if k in d: print(f"  {k}: {d[k]/1e6:.1f} M")
