"""Split the final chain step's cost: filter/upsample vs interleave."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.models.pipeline import _pad_to_64
from tpuao.ops import prepare as P, render as R, upsample as U
from tpuao.params import AOParams, CameraParams, padded_shape, upsample_constants
from tpuao.utils.profiling import device_time_ms

cam = CameraParams(depth_mode="linear")
par = AOParams()
h0, w0 = 1080, 1920
hp, wp = padded_shape(h0, w0)
z = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, (h0, w0)), jnp.float32)

def run(mode):
    def fn(depth):
        d = par.hierarchy_depth
        dp = _pad_to_64(depth.astype(jnp.float32), hp, wp)
        linz = P.linearize_depth(dp, cam)
        pyr = P.build_pyramid(linz, d)
        aos = {l: R.render_ao_level(pyr[l], l, wp, cam, par, None)
               for l in range(1, d + 1)}
        combined = aos[d]
        for l in range(d, 1, -1):
            combined = U.blur_upsample_step(
                combined, pyr[l], pyr[l - 1], par, wp,
                lo_ao2=aos[l] if l != d else None)
        # final step, decomposed
        lo_ao = jnp.minimum(combined, aos[1])
        _, k_blur, k_up, nfs = upsample_constants(par, wp, pyr[1].shape[-1])
        pad = [(0, 1), (0, 1)]
        ap = jnp.pad(lo_ao, pad, mode="edge")
        dp1 = jnp.pad(pyr[1], pad, mode="edge")
        filtered = U.noise_filter(ap, dp1, nfs)
        if mode == "nofinal":
            return combined
        if mode == "filter_only":
            return filtered
        # inline _bilateral_upsample2x_ext to get at the planes
        import tpuao.ops.upsample as UU
        planes = []
        lh, lw = pyr[1].shape
        hi_d = pyr[0]
        taps = {(dr, dc): (filtered[dr: dr + lh, dc: dc + lw],
                           dp1[dr: dr + lh, dc: dc + lw])
                for dr in (0, 1) for dc in (0, 1)}
        for p in (0, 1):
            hd_rows = hi_d[p::2, :]
            for q in (0, 1):
                hd = hd_rows[:, q::2]
                acc = jnp.zeros_like(hd); wacc = jnp.zeros_like(hd)
                for dr in (0, 1):
                    wr = 1.0 - p * 0.5 if dr == 0 else p * 0.5
                    if wr == 0.0: continue
                    for dc in (0, 1):
                        wc = 1.0 - q * 0.5 if dc == 0 else q * 0.5
                        if wc == 0.0: continue
                        a, dd_ = taps[(dr, dc)]
                        ddd = dd_ - hd
                        wt = (wr * wc) / (ddd * ddd / k_blur + k_up)
                        acc = acc + wt * a; wacc = wacc + wt
                planes.append(acc / jnp.maximum(wacc, 1e-30))
        if mode == "planes":
            return planes
        out = UU.interleave2x2(*planes)
        return out[:h0, :w0]
    return fn

for mode in ("nofinal", "filter_only", "planes", "full"):
    ms = device_time_ms(run(mode), z, iters=600)
    print(f"{mode:12s} {ms:7.3f} ms")

# micro: interleave alone on resident planes
planes = [jnp.asarray(np.random.default_rng(i).uniform(0, 1, (544, 960)), jnp.float32) for i in range(4)]
import tpuao.ops.upsample as UU
ms = device_time_ms(lambda *ps: UU.interleave2x2(*ps), *planes, iters=2000)
print(f"interleave micro: {ms:.4f} ms")
