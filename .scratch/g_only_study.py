"""Fit ONLY g (rest at truth) from 3 views: sign/identifiability probe."""
import dataclasses, time
import numpy as np
import jax.numpy as jnp
import vpt
from vpt.dist import fit_multiview
from vpt.kernels.wavefront import build_tile_renderer
from vpt.scene.camera import look_at
from vpt.scene.scene import foggy_cornell

true_scene = dataclasses.replace(
    foggy_cornell(), medium=dataclasses.replace(foggy_cornell().medium, g=0.5))
cams = [vpt.default_camera(),
        look_at((35.0, 30.0, 180.0), (0.0, -10.0, 0.0)),
        look_at((-38.0, -20.0, 150.0), (10.0, 0.0, -40.0))]
W = H = 128
targets = [np.asarray(build_tile_renderer(true_scene, c, W, H, 2048,
                                          max_bounces=32, tile_rows=32,
                                          sampler="ld")(123)).reshape(H, W, 3)
           / 2048 for c in cams]
wrong = dataclasses.replace(
    true_scene, medium=dataclasses.replace(true_scene.medium, g=0.0))

def freeze_all_but_g(p, p0):
    out = dict(p0)
    out["g"] = p["g"]
    return out

t0 = time.time()
params, losses = fit_multiview(
    wrong, cams, targets, steps=150, spp=16, learning_rate=2e-2,
    max_bounces=32, sampler="ld", diff_g=True, diff_field=True,
    param_filter=freeze_all_but_g, polyak_tail=20, log_every=25)
print("g-only: true 0.5, init 0.0 -> %.3f  loss %.4g->%.4g  %.1fs"
      % (float(params["g"]), losses[0], losses[-1], time.time() - t0),
      flush=True)
