import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl

def bench(N, iters=64):
    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[...]
        idx = idx_ref[...]
        acc = jnp.zeros_like(tab)
        def body(i, carry):
            acc, ix = carry
            g = jnp.take_along_axis(tab, ix, axis=0)
            ix = (ix * 1664525 + 1013904223) & (N - 1)
            return acc + g, ix
        acc, _ = jax.lax.fori_loop(0, iters, body, (acc, idx))
        out_ref[...] = acc
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((N,128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, size=(N,128)), jnp.int32)
    f = jax.jit(pl.pallas_call(kern,
        out_shape=jax.ShapeDtypeStruct((N,128), jnp.float32)))
    out = f(tab, idx); out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(tab, idx)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    per = dt / iters / N / 128
    print(f"N={N:5d}: {dt*1e3:.3f} ms/call, {per*1e12:.2f} ps/gathered-elem, "
          f"{N*128*iters/dt/1e9:.1f} Gelem/s")

for N in (8, 64, 512, 4096):
    bench(N)
