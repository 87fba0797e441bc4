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
W, H, SPP = 16, 8, 8
th = pack_theta(scene, cam, 8)
rl = make_geom_renderer(scene, cam, W, H, SPP, sphere=8, cam_grads=False,
                        max_bounces=5, sampler="ld", primal_only=True,
                        interpret=True)
rr = make_geom_renderer(scene, cam, W, H, SPP, sphere=8, cam_grads=False,
                        max_bounces=5, primal_only=True, interpret=True)
a, _ = rl(th, jnp.int32(3)); b, _ = rl(th, jnp.int32(3)); c, _ = rl(th, jnp.int32(4))
a, b, c = map(np.asarray, (a, b, c))
print("det:", np.array_equal(a, b), "seeded:", not np.array_equal(a, c),
      "finite:", np.isfinite(a).all(), flush=True)
ml = np.mean([np.clip(np.asarray(rl(th, jnp.int32(s))[0]), 0, 1).mean() for s in range(6)])
mr = np.mean([np.clip(np.asarray(rr(th, jnp.int32(s))[0]), 0, 1).mean() for s in range(6)])
print("clamped means ld/random:", ml, mr, flush=True)
# dual path with ld also builds and is finite
rd = make_geom_renderer(scene, cam, W, H, SPP, sphere=8, cam_grads=False,
                        max_bounces=5, sampler="ld", interpret=True)
img, tang = rd(th, jnp.int32(3))
print("dual-ld finite:", np.isfinite(np.asarray(img)).all(),
      np.isfinite(np.asarray(tang)).all(), flush=True)
# FD step with ld
from vpt.dist import make_fd_geom_train_step
opt = optax.adam(0.3)
step = make_fd_geom_train_step(scene, cam, W, H, SPP, opt, sphere=8,
                               cam_grads=False, max_bounces=5, sampler="ld",
                               interpret=True)
th0 = dict(th); th0["center"] = th["center"] + jnp.asarray([0., 4., 0.])
t2, _, loss = step(th0, opt.init(th0), jnp.zeros((W*H, 3), jnp.float32) + 0.05,
                   jnp.int32(5))
print("fd-ld step ok, loss", float(loss), "moved:",
      not np.allclose(np.asarray(t2["center"]), np.asarray(th0["center"])), flush=True)
