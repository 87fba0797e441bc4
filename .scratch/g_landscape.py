"""Loss landscape in g with everything else at truth (3 views)."""
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
import vpt
from vpt.kernels.diff import make_diff_renderer, pack_params
from vpt.kernels.wavefront import build_tile_renderer
from vpt.scene.camera import look_at
from vpt.scene.scene import foggy_cornell

true_scene = dataclasses.replace(
    foggy_cornell(), medium=dataclasses.replace(foggy_cornell().medium, g=0.5))
cams = [vpt.default_camera(),
        look_at((35.0, 30.0, 180.0), (0.0, -10.0, 0.0)),
        look_at((-38.0, -20.0, 150.0), (10.0, 0.0, -40.0))]
W = H = 128
targets = [jnp.asarray(np.asarray(
    build_tile_renderer(true_scene, c, W, H, 2048, max_bounces=32,
                        tile_rows=32, sampler="ld")(123)).reshape(-1, 3)
    / 2048) for c in cams]
weights = [1.0 / (jnp.mean(t, axis=-1, keepdims=True) + 0.05) ** 2
           for t in targets]
renders = [make_diff_renderer(true_scene, c, W, H, 64, max_bounces=32,
                              tile_rows=32, sampler="ld", diff_g=True,
                              diff_field=True) for c in cams]
params = pack_params(true_scene, with_g=True, with_field=True)

@jax.jit
def loss_at(p, seed):
    tot = 0.0
    for v, (r, t, w) in enumerate(zip(renders, targets, weights)):
        a = r(p, seed * 6 + 2 * v)
        b = r(p, seed * 6 + 2 * v + 1)
        tot = tot + jnp.mean(w * (a - t) * (b - t))
    return tot / 3

for g in (-0.5, -0.45, -0.25, 0.0, 0.25, 0.45, 0.5):
    p = dict(params); p["g"] = jnp.float32(g)
    ls = [float(loss_at(p, jnp.int32(7 + s))) for s in range(4)]
    print("g=%+.2f  loss %.2f +- %.2f" % (g, np.mean(ls),
                                          np.std(ls) / 2), flush=True)
