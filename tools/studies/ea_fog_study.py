"""Free-flight vs equi-angular IN FOG (round 3): the reference's research
question on a heterogeneous medium, fused kernel, one v5e chip."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time
import numpy as np
import jax.numpy as jnp
import vpt
from vpt.kernels.wavefront import build_tile_renderer

sc = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
W, H = 512, 384
print("converged target (free, 4096 spp)...", flush=True)
tgt = np.clip(np.asarray(build_tile_renderer(
    sc, cam, W, H, 4096, tile_rows=32, sampler="ld")(999)), 0, 1)

for name, dist in (("free-flight", "free"), ("equi-angular", "equiangular")):
    run = build_tile_renderer(sc, cam, W, H, 64, distance=dist,
                              tile_rows=32, sampler="ld")
    _ = np.asarray(run(0))
    t0 = time.time(); n = 0
    mses = []
    for s in range(4):
        img = np.clip(np.asarray(run(100 + s)), 0, 1)
        n += 1
        mses.append(float(np.mean((img - tgt) ** 2)))
    dt = (time.time() - t0) / n
    pps = W * H * 64 / dt
    mse = float(np.mean(mses))
    print("%s: %.1fM paths/s  MSE@64spp %.3e  MSExTIME %.3e" %
          (name, pps / 1e6, mse, mse * dt), flush=True)
