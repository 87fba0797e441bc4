"""Joint (sigma_a, sigma_s, g, fog_k) recovery on one chip: anisotropic
ground fog, all four medium unknowns traced in the diff pair at once."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import dataclasses, time
import numpy as np
import jax.numpy as jnp
import vpt
from vpt.kernels.wavefront import build_tile_renderer
from vpt.media.density import exp_height
from vpt.scene.scene import foggy_cornell

base = foggy_cornell()
# anisotropic fog: forward-scattering g=0.5
base = dataclasses.replace(base, medium=dataclasses.replace(base.medium, g=0.5))
cam = vpt.default_camera()
W = H = 256
print("rendering target (true: sa=0.004 ss=0.036 g=0.5 k=0.06)...", flush=True)
target = np.asarray(
    build_tile_renderer(base, cam, W, H, 4096, max_bounces=32,
                        tile_rows=32, sampler="ld")(77)).reshape(H, W, 3)

wrong = dataclasses.replace(
    base, medium=dataclasses.replace(
        base.medium, sigma_a=0.004, sigma_s=0.020, g=0.5,
        density=exp_height(k=0.12, y0=-40.8, majorant=1.01)))

import optax

def medium_only(updated, initial):
    out = dict(initial)
    for k in ("sigma_a", "sigma_s", "g", "fog_k"):
        out[k] = updated[k]
    return out

t0 = time.time()
p_fit, losses = vpt.dist.fit_kernel(
    wrong, cam, jnp.asarray(target), steps=600, spp=32,
    learning_rate=optax.exponential_decay(4e-3, 60, 0.8),
    sampler="ld", diff_g=True, diff_field=True,
    param_filter=medium_only, log_every=50)
wall = time.time() - t0
print("recovered: sa=%.5f (0.004)  ss=%.5f (0.036)  g=%.3f (0.5)  "
      "k=%.4f (0.06)  in %.1fs" %
      (float(p_fit["sigma_a"]), float(p_fit["sigma_s"]),
       float(p_fit["g"]), float(p_fit["fog_k"]), wall), flush=True)
