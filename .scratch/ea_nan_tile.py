import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if "--nans" in sys.argv:
    jax.config.update("jax_debug_nans", True)
import numpy as np
import vpt
from vpt.kernels.wavefront import build_tile_renderer
sc = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
W, H = 256, 192
run = build_tile_renderer(sc, cam, W, H, 32, distance="equiangular",
                          nee=True, tile_rows=32, sampler="ld",
                          max_bounces=8, interpret=True)
raw = run.make_raw(1)
t0 = time.time()
out = np.asarray(raw(7, 12288))
print("tile3 %.1fs nan=%d at %s" % (
    time.time() - t0, np.isnan(out).sum(),
    np.argwhere(np.isnan(out).any(-1)).ravel()[:8]), flush=True)
