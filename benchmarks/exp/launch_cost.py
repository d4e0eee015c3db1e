"""Per-XLA-kernel overhead: chain of N optimization-barrier-separated ops."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from tpuao.utils.profiling import device_time_ms

for shape in ((272, 480), (544, 960), (1088, 1920)):
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1, shape), jnp.float32)
    def chainN(n):
        def fn(a):
            for _ in range(n):
                a = lax.optimization_barrier(a * 1.0000001 + 1e-9)
            return a
        return fn
    t10 = device_time_ms(chainN(10), x, iters=600)
    t60 = device_time_ms(chainN(60), x, iters=300)
    per = (t60 - t10) / 50
    print(f"{shape}: 10 ops {t10:.4f} ms, 60 ops {t60:.4f} ms -> {per*1e3:.2f} us/kernel")
