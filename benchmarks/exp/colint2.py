"""Column interleave with an honest consumer (adjacent-lane product)."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from tpuao.utils.profiling import device_time_ms

rng = np.random.default_rng(0)
A = jnp.asarray(rng.uniform(0, 1, (544, 960)), jnp.float32)
B = jnp.asarray(rng.uniform(0, 1, (544, 960)), jnp.float32)

def consume(out):
    return out[:, 1:] * out[:, :-1] + out[:, 1:]

def v_pad(a, b):
    z = jnp.zeros((), a.dtype)
    out = lax.pad(a, z, [(0, 0, 0), (0, 1, 1)]) + lax.pad(b, z, [(0, 0, 0), (1, 0, 1)])
    return consume(out)

def v_transpose(a, b):
    at, bt = a.T, b.T
    rows = jnp.concatenate([at, bt], axis=-1)
    return consume(rows.reshape(1920, 544).T)

def v_stack(a, b):  # the known-bad small-minor reshape, for reference
    out = jnp.stack([a, b], axis=-1).reshape(544, 1920)
    return consume(out)

base = lambda a, b: consume(jnp.concatenate([a, b], axis=-1))  # no interleave: cost of consumer alone
for name, fn in (("baseline", base), ("pad", v_pad),
                 ("transpose", v_transpose), ("stack", v_stack)):
    ms = device_time_ms(fn, A, B, iters=2000)
    print(f"{name:10s} {ms:.4f} ms")
