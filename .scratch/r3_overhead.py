"""Decompose the ~30ms fixed per-launch cost seen in the scaling study:
tunnel/dispatch RTT (rig artifact) vs on-device kernel setup.

Method: one jitted fn that launches the D=8-shard kernel K times
back-to-back (different seeds, summed means) = K launches, ONE host
round-trip. If t(K) ~= K*W + c with the same c as K=1, the overhead is
host-side; if t(K) ~= K*(W + c), it's on-device per-launch.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from vpt import cornell_vpt, default_camera
from vpt.kernels import wavefront as wf

W = H = 1024
SPP = 64
D = 8
scene = cornell_vpt()
cam = default_camera()

run = wf.build_tile_renderer(scene, cam, W, H, SPP, nee=True,
                             distance="free", tile_rows=32, sampler="ld")
lanes = run.lanes_per_tile
ntiles = -(-W * H // (lanes * D))
raw = run.make_raw(ntiles)


def timed(fn, *args, n=5):
    out = fn(*args)
    np.asarray(out)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    return best


# trivial-op round trip (tunnel floor)
@jax.jit
def trivial(x):
    return x * 2.0

t_triv = timed(trivial, jnp.float32(3.0))
print(f"trivial jit round-trip: {t_triv*1e3:.1f}ms")

for K in (1, 2, 4, 8):
    def make(K):
        @jax.jit
        def go(seed):
            acc = jnp.float32(0)
            for k in range(K):
                acc = acc + raw(seed + k, jnp.int32(0)).mean()
            return acc
        return go
    t = timed(make(K), jnp.int32(3))
    paths = ntiles * lanes * SPP * K
    print(f"K={K}: t={t*1e3:7.1f}ms  {paths/t/1e6:7.1f}M paths/s/chip  "
          f"t/K={t/K*1e3:6.1f}ms", flush=True)
