"""On-chip study: heterogeneous diff-pair throughput + fog-k recovery.

1. fwd+bwd throughput of the differentiable pair on foggy_cornell at the
   bench workload (1024x1024x64, chained launches, device-side reduce).
2. end-to-end fog-falloff recovery: target rendered at k=0.06, training
   starts at k=0.12 with fog_k traced (diff_field=True), A/B-MSE Adam.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time, sys
import numpy as np
import jax, jax.numpy as jnp
import vpt
from vpt.kernels.diff import make_diff_renderer, pack_params
from vpt.kernels.wavefront import build_tile_renderer

CHAIN = 4
cam = vpt.default_camera()

# ---- 1. throughput ----
sc = vpt.scene.scene.foggy_cornell()
W = H = 1024; SPP = 64
r = make_diff_renderer(sc, cam, W, H, SPP, max_bounces=32, tile_rows=32,
                       sampler="ld")
params = pack_params(sc)

@jax.jit
def vg_chain(p, seed):
    def one(c, s):
        def loss(pp):
            return jnp.mean(r(pp, s))
        l, g = jax.value_and_grad(loss)(p)
        return c + l + g["sigma_a"], None
    acc, _ = jax.lax.scan(one, jnp.float32(0.0), seed + jnp.arange(CHAIN))
    return acc

print("compiling fwd+bwd (hetero)...", flush=True)
t0 = time.time()
_ = np.asarray(vg_chain(params, jnp.int32(1)))
print("compile+first run %.1fs" % (time.time() - t0), flush=True)
best = 0.0
for i in range(3):
    t0 = time.time()
    _ = np.asarray(vg_chain(params, jnp.int32(10 + i)))
    dt = (time.time() - t0) / CHAIN
    pps = W * H * SPP / dt
    best = max(best, pps)
    print("  run %d: %.3fs/launch -> %.1fM paths/s" % (i, dt, pps / 1e6), flush=True)
print("HETERO fwd+bwd best: %.1fM paths/s" % (best / 1e6), flush=True)

# ---- 2. fog-k recovery ----
import dataclasses
from vpt.media.density import exp_height
K_TRUE, K0 = 0.06, 0.12
tw, th, tspp = 256, 256, 512
tgt_run = build_tile_renderer(sc, cam, tw, th, tspp, max_bounces=32,
                              tile_rows=32, sampler="ld")
print("rendering target...", flush=True)
t0 = time.time()
target = np.asarray(tgt_run(123)).reshape(th, tw, 3)
print("target %.1fs" % (time.time() - t0), flush=True)

wrong = dataclasses.replace(
    sc, medium=dataclasses.replace(
        sc.medium, density=exp_height(k=K0, y0=-40.8, majorant=1.01)))

def keep_only_fog(updated, initial):
    out = dict(initial)
    out["fog_k"] = updated["fog_k"]
    return out

t0 = time.time()
p_fit, losses = vpt.dist.fit_kernel(
    wrong, cam, jnp.asarray(target), steps=120, spp=32,
    learning_rate=4e-3, sampler="ld", diff_field=True,
    param_filter=keep_only_fog, log_every=20)
wall = time.time() - t0
ks = float(p_fit["fog_k"])
print("fog_k recovered: %.5f (true %.3f, start %.3f) in %.1fs" %
      (ks, K_TRUE, K0, wall), flush=True)
