import numpy as np
import vpt
from vpt.kernels.wavefront import build_tile_renderer
sc = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
W, H = 256, 192
run = build_tile_renderer(sc, cam, W, H, 32, distance="equiangular",
                          nee=True, tile_rows=32, sampler="ld")
img = np.asarray(run(7))
bad = np.argwhere(np.isnan(img).any(-1)).ravel()
print("nan pixels:", bad[:20], flush=True)
print("lanes_per_tile", run.lanes_per_tile, "tiles:",
      sorted(set(int(b) // run.lanes_per_tile for b in bad)), flush=True)
