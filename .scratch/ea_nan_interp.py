import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
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
img = np.asarray(run(7))
print("nan=%d" % np.isnan(img).sum(), flush=True)
