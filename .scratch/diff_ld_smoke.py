import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
import vpt
from vpt.kernels.diff import make_diff_renderer, pack_params

scene = vpt.cornell_vpt(); cam = vpt.default_camera()
W, H, SPP = 16, 8, 8
params = pack_params(scene)
rl = make_diff_renderer(scene, cam, W, H, SPP, max_bounces=5, sampler="ld",
                        interpret=True)
rr = make_diff_renderer(scene, cam, W, H, SPP, max_bounces=5,
                        interpret=True)
a = np.asarray(rl(params, jnp.int32(3)))
b = np.asarray(rl(params, jnp.int32(3)))
c = np.asarray(rl(params, jnp.int32(4)))
print("det:", np.array_equal(a, b), "seeded:", not np.array_equal(a, c),
      "finite:", np.isfinite(a).all(), flush=True)
ml = np.mean([np.clip(np.asarray(rl(params, jnp.int32(s))), 0, 1).mean() for s in range(6)])
mr = np.mean([np.clip(np.asarray(rr(params, jnp.int32(s))), 0, 1).mean() for s in range(6)])
print("clamped means ld/random:", ml, mr, flush=True)
vg = jax.jit(jax.value_and_grad(lambda p, s: jnp.mean(rl(p, s))))
v, g = vg(params, jnp.int32(7))
leaves = jax.tree_util.tree_leaves(g)
print("grad finite:", all(np.isfinite(np.asarray(x)).all() for x in leaves),
      "dsigma_s:", float(g["sigma_s"]), flush=True)
