"""Incremental pipeline truncation: where does the frame time go?"""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import _pad_to_64
from tpuao.ops import prepare as P, render as R, upsample as U
from tpuao.params import AOParams, CameraParams, padded_shape
from tpuao.utils.profiling import device_time_ms

cam = CameraParams(depth_mode="linear")
par = AOParams()
spec = sys.argv[1] if len(sys.argv) > 1 else "1080x1920"
h0, w0 = (int(a) for a in spec.split("x"))
hp, wp = padded_shape(h0, w0)
rng = np.random.default_rng(0)
z = jnp.asarray(rng.uniform(0.1, 1, (h0, w0)), jnp.float32)

def upto(stage):
    def fn(depth):
        d = par.hierarchy_depth
        dp = _pad_to_64(depth.astype(jnp.float32), hp, wp)
        linz = P.linearize_depth(dp, cam)
        pyr = P.build_pyramid(linz, d)
        if stage == "prepare":
            return [x.sum() for x in pyr]
        aos = {l: R.render_ao_level(pyr[l], l, wp, cam, par, None)
               for l in range(1, d + 1)}
        if stage == "render":
            return [a.sum() for a in aos.values()]
        combined = aos[d]
        last = {"chain2": 2, "chain1": 1, "full": 0}[stage]
        for l in range(d, last, -1):
            combined = U.blur_upsample_step(
                combined, pyr[l], pyr[l - 1], par, wp,
                lo_ao2=aos[l] if l != d else None)
        return combined[..., :h0, :w0] if last == 0 else combined
    return fn

prev = 0.0
for stage in ("prepare", "render", "chain2", "chain1", "full"):
    ms = device_time_ms(upto(stage), z, iters=20)
    print(f"{stage:8s} {ms:7.3f} ms  (+{ms - prev:6.3f})")
    prev = ms
