import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp, optax
import vpt
from vpt.kernels.geom import make_geom_renderer, pack_theta

scene = vpt.cornell_vpt(); cam = vpt.default_camera()
W, H, SPP = 24, 16, 4
r = make_geom_renderer(scene, cam, W, H, SPP, sphere=8, cam_grads=False,
                       max_bounces=4, primal_only=True, interpret=True)
th = pack_theta(scene, cam, 8)
img0, _ = r(th, jnp.int32(3))
th2 = dict(th); th2["sigma_s"] = th["sigma_s"] * 3.0
img1, _ = r(th2, jnp.int32(3))
print("sigma traced ok; image changed:", not np.array_equal(np.asarray(img0), np.asarray(img1)),
      "means:", float(img0.mean()), float(img1.mean()), flush=True)

from vpt.dist import make_fd_geom_train_step
opt = optax.adam(1e-3)
step = make_fd_geom_train_step(scene, cam, W, H, SPP, opt, sphere=None,
                               cam_grads=False, sigma=True, max_bounces=4,
                               interpret=True)
th0 = dict(pack_theta(scene, cam, None)); th0["sigma_s"] = th0["sigma_s"] * 2.5
st = opt.init(th0)
th1, st, loss = step(th0, st, jnp.asarray(np.asarray(img0)), jnp.int32(5))
print("fd sigma step ok, loss", float(loss),
      "d_sigma_s:", float(th1["sigma_s"] - th0["sigma_s"]),
      "d_center:", float(jnp.abs(th1["center"] - th0["center"]).max()), flush=True)

# dual path still builds and matches
rd = make_geom_renderer(scene, cam, W, H, SPP, sphere=8, cam_grads=False,
                        max_bounces=4, interpret=True)
imgd, tang = rd(th, jnp.int32(3))
rel = np.abs(np.asarray(imgd) - np.asarray(img0)) / max(1.0, float(np.abs(np.asarray(img0)).max()))
print("dual primal still matches:", float(np.quantile(rel, 0.99)), flush=True)
