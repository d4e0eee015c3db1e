import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import ao_pipeline
from tpuao.params import AOParams, CameraParams
from tpuao.utils.profiling import device_time_ms
from tpuao.utils.xla_opts import tpu_compiler_options
import re
from collections import Counter

cam = CameraParams(depth_mode="linear")

# normals config, 1080p
pn = AOParams(use_normals=True)
rng = np.random.default_rng(0)
z = jnp.asarray(rng.uniform(0.1, 1, (1080, 1920)), jnp.float32)
n = rng.uniform(-1, 1, (1080, 1920, 3)); n[..., 2] = np.abs(n[..., 2]) + 0.2
n /= np.linalg.norm(n, axis=-1, keepdims=True)
nd = jnp.asarray(n, jnp.float32)
fn = lambda d, nn: ao_pipeline(d, cam, pn, nn, impl="auto")[0]
med, mn = device_time_ms(fn, z, nd, iters=20, return_min=True)
print(f"normals 1080p: median {med:.3f} min {mn:.3f} ms")

# 8K HLO inflated-buffer check
p = AOParams()
f2 = jax.jit(lambda d: ao_pipeline(d, cam, p, None, impl="auto")[0],
             compiler_options=tpu_compiler_options())
x = jnp.asarray(rng.uniform(0.1, 1, (4320, 7680)), jnp.float32)
c = f2.lower(x).compile()
txt = c.as_text()
pat = re.compile(r"f32\[([\d,]+)\]\{[\d,]+(?::T\(([^)]*)\))?")
seen = Counter()
for m in pat.finditer(txt):
    dims = [int(d) for d in m.group(1).split(",")]
    til = m.group(2)
    dd = dims[:]
    if til:
        tile = [int(t) for t in til.split(",") if t]
        for i, t in enumerate(reversed(tile)):
            j = len(dd) - 1 - i
            if j >= 0: dd[j] = -(-dd[j] // t) * t
    b = 4
    for d in dd: b *= d
    raw = 4
    for d in dims: raw *= d
    if b >= 30e6 and b > 1.5 * raw:
        seen[(m.group(0), b, raw)] += 1
for (s, b, raw), cnt in sorted(seen.items(), key=lambda kv: -kv[0][1])[:10]:
    print(f"inflated {b/1e6:8.1f} MB (raw {raw/1e6:7.1f}) x{cnt}  {s}")
m = c.memory_analysis()
print("8K temp MB:", m.temp_size_in_bytes / 1e6)
