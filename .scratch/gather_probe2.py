import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl

N = 4096; R = 8

def kern(tab_ref, idx_ref, out_ref):
    tab = tab_ref[...]          # (N,128)
    idx = idx_ref[...]          # (R,128)
    out_ref[...] = jnp.take_along_axis(tab, idx, axis=0)

def run(interpret):
    rng = np.random.default_rng(0)
    tabn = rng.standard_normal((N,128)).astype(np.float32)
    idxn = rng.integers(0, N, size=(R,128)).astype(np.int32)
    f = pl.pallas_call(kern,
        out_shape=jax.ShapeDtypeStruct((R,128), jnp.float32),
        interpret=interpret)
    out = np.asarray(f(jnp.asarray(tabn), jnp.asarray(idxn)))
    ref = np.take_along_axis(tabn, idxn, axis=0)
    print("interpret" if interpret else "compiled",
          "ok" if np.allclose(out, ref) else "MISMATCH")

run(True)
run(False)
