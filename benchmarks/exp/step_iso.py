"""One blur_upsample_step in isolation per level size."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuao.ops import upsample as U
from tpuao.params import AOParams
from tpuao.utils.profiling import device_time_ms

par = AOParams()
rng = np.random.default_rng(0)
for lh, lw, premin in ((68, 120, False), (136, 240, True),
                       (272, 480, True), (544, 960, True)):
    lo = jnp.asarray(rng.uniform(0.2, 0.9, (lh, lw)), jnp.float32)
    lo2 = jnp.asarray(rng.uniform(0.2, 0.9, (lh, lw)), jnp.float32)
    lod = jnp.asarray(rng.uniform(0.1, 1.0, (lh, lw)), jnp.float32)
    hid = jnp.asarray(rng.uniform(0.1, 1.0, (2 * lh, 2 * lw)), jnp.float32)
    fn = lambda a, a2, ld, hd: U.blur_upsample_step(
        a, ld, hd, par, 1920, lo_ao2=a2 if premin else None)
    ms = device_time_ms(fn, lo, lo2, lod, hid, iters=1000)
    print(f"lo ({lh:4d},{lw:4d}) -> ({2*lh},{2*lw}): {ms:.4f} ms")
