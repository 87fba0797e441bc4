import os, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl

N = 4096  # flat table size
R = 8

def kern(tab_ref, idx_ref, out_ref):
    tab = tab_ref[...]          # (N//128, 128) in VMEM
    idx = idx_ref[...]          # (R,128) int32 in [0,N)
    flat = tab.reshape(-1)
    out_ref[...] = jnp.take(flat, idx, axis=0)

def run(interpret):
    tab = jnp.arange(N, dtype=jnp.float32).reshape(N//128, 128)
    idx = jnp.asarray(np.random.randint(0, N, size=(R,128)), jnp.int32)
    f = pl.pallas_call(kern,
        out_shape=jax.ShapeDtypeStruct((R,128), jnp.float32),
        interpret=interpret)
    out = f(tab, idx)
    ref = np.arange(N, dtype=np.float32)[np.asarray(idx)]
    print("interpret" if interpret else "compiled",
          "ok" if np.allclose(out, ref) else "MISMATCH")

run(True)
run(False)
