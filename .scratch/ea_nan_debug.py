import numpy as np
import vpt
from vpt.kernels.wavefront import build_tile_renderer
sc = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
W, H = 256, 192
for name, kw in (
    ("EA nee", dict(distance="equiangular", nee=True)),
    ("EA implicit", dict(distance="equiangular", nee=False)),
    ("EA clamped impl", dict(distance="ea_clamped", nee=False)),
    ("free nee", dict(distance="free", nee=True)),
):
    run = build_tile_renderer(sc, cam, W, H, 32, tile_rows=32,
                              sampler="ld", **kw)
    img = np.asarray(run(7))
    print(name, "nan", int(np.isnan(img).sum()), "inf",
          int(np.isinf(img).sum()), "mean", float(np.nanmean(img)), flush=True)
