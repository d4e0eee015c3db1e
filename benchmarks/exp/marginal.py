"""DCE-proof marginal cost per pipeline stage (each variant sums all live values)."""
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
z = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, (h0, w0)), jnp.float32)

def upto(n_steps, with_renders=True):
    """n_steps chain steps applied (0..4); all renders kept alive."""
    def fn(depth):
        d = par.hierarchy_depth
        dp = _pad_to_64(depth.astype(jnp.float32), hp, wp)
        linz = P.linearize_depth(dp, cam)
        pyr = P.build_pyramid(linz, d)
        live = [x.sum() for x in pyr]
        if not with_renders:
            return live
        aos = {l: R.render_ao_level(pyr[l], l, wp, cam, par, None)
               for l in range(1, d + 1)}
        live += [a.sum() for a in aos.values()]
        combined = aos[d]
        for i, l in enumerate(range(d, 0, -1)):
            if i >= n_steps:
                break
            combined = U.blur_upsample_step(
                combined, pyr[l], pyr[l - 1], par, wp,
                lo_ao2=aos[l] if l != d else None)
            live.append(combined.sum())
        return live
    return fn

prev = 0.0
for name, fn in [("prepare", upto(0, False)), ("renders", upto(0)),
                 ("step4", upto(1)), ("step3", upto(2)),
                 ("step2", upto(3)), ("step1", upto(4))]:
    ms = device_time_ms(fn, z, iters=600)
    print(f"{name:8s} {ms:7.3f} ms  (+{ms-prev:6.3f})")
    prev = ms
