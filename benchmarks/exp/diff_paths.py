import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import ao_pipeline, _pad_to_64
from tpuao.ops import prepare as P, render as R, upsample as U
from tpuao.params import AOParams, CameraParams, padded_shape
from tpuao.utils.profiling import device_time_ms

cam = CameraParams(depth_mode="linear")
par = AOParams()
h0, w0 = 1080, 1920
hp, wp = padded_shape(h0, w0)
z = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, (h0, w0)), jnp.float32)

def inline(depth):
    d = par.hierarchy_depth
    dp = _pad_to_64(depth.astype(jnp.float32), hp, wp)
    linz = P.linearize_depth(dp, cam)
    pyr = P.build_pyramid(linz, d)
    aos = {l: R.render_ao_level(pyr[l], l, wp, cam, par, None)
           for l in range(1, d + 1)}
    combined = aos[d]
    for l in range(d, 0, -1):
        combined = U.blur_upsample_step(
            combined, pyr[l], pyr[l - 1], par, wp,
            lo_ao2=aos[l] if l != d else None)
    return combined[..., :h0, :w0]

def viapipe(depth):
    return ao_pipeline(depth, cam, par, None, impl="auto")[0]

for name, fn in (("inline", inline), ("ao_pipeline", viapipe),
                 ("inline2", inline), ("ao_pipeline2", viapipe)):
    med, mn = device_time_ms(fn, z, iters=40, return_min=True)
    print(f"{name:13s} median {med:.3f}  min {mn:.3f} ms")
