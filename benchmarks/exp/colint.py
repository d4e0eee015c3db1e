"""Column (lane) interleave formulations, micro at (544,960)->(544,1920)."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from tpuao.utils.profiling import device_time_ms

rng = np.random.default_rng(0)
A = jnp.asarray(rng.uniform(0, 1, (544, 960)), jnp.float32)
B = jnp.asarray(rng.uniform(0, 1, (544, 960)), jnp.float32)

def v_pad(a, b):  # current: interior-padded adds
    z = jnp.zeros((), a.dtype)
    return lax.pad(a, z, [(0, 0, 0), (0, 1, 1)]) + lax.pad(b, z, [(0, 0, 0), (1, 0, 1)])

def v_transpose(a, b):  # transpose -> row interleave (concat+reshape) -> transpose
    at, bt = a.T, b.T                       # (960, 544)
    rows = jnp.concatenate([at[:, None, :], bt[:, None, :]], axis=1)  # (960,2,544)
    return rows.reshape(1920, 544).T

def v_transpose2(a, b):  # transpose + concat/reshape trick without small dims
    at, bt = a.T, b.T                       # (960, 544)
    rows = jnp.concatenate([at, bt], axis=-1)  # (960, 1088)
    return rows.reshape(1920, 544).T

def v_dus(a, b):  # reference correctness check on host
    out = np.empty((544, 1920), np.float32)
    out[:, 0::2] = np.asarray(a); out[:, 1::2] = np.asarray(b)
    return out

want = v_dus(A, B)
for name, fn in (("pad", v_pad), ("transpose", v_transpose), ("transpose2", v_transpose2)):
    got = np.asarray(jax.jit(fn)(A, B))
    ok = np.array_equal(got, want)
    ms = device_time_ms(fn, A, B, iters=2000)
    print(f"{name:11s} {ms:.4f} ms  correct={ok}")
