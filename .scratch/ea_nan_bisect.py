import numpy as np
import vpt
from vpt.kernels.wavefront import build_tile_renderer
sc = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
W, H = 256, 192
for mb in (1, 2, 4, 8, 16, 32):
    run = build_tile_renderer(sc, cam, W, H, 32, distance="equiangular",
                              nee=True, tile_rows=32, sampler="ld",
                              max_bounces=mb)
    img = np.asarray(run(7))
    print("mb=%2d nan=%d inf=%d" % (mb, np.isnan(img).sum(),
                                    np.isinf(img).sum()), flush=True)
run = build_tile_renderer(sc, cam, W, H, 32, distance="equiangular",
                          nee=True, tile_rows=32)
img = np.asarray(run(7))
print("threefry default-mb nan=%d" % np.isnan(img).sum(), flush=True)
