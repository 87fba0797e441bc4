import dataclasses, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import numpy as np, jax.numpy as jnp, optax, vpt
from vpt.dist.train_fast import fit_geom_fd
from vpt.kernels.wavefront import build_tile_renderer
from vpt.media import density as df
from vpt.scene.scene import Medium, blob_cloud

W, H, spp_t, spp, steps = 64, 48, 128, 32, 80
base = blob_cloud()
n = 16
xs = np.linspace(-28, 28, n); ys = np.linspace(-18, 24, n); zs = np.linspace(150, 195, n)
gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
vals = np.asarray(df.density(base.medium.density, jnp.asarray(np.stack([gx, gy, gz], -1))))
sp = (xs[1]-xs[0], ys[1]-ys[0], zs[1]-zs[0])
org = (xs[0]-sp[0]/2, ys[0]-sp[1]/2, zs[0]-sp[2]/2)
f = df.grid(vals, origin=org, spacing=sp, majorant=float(vals.max())*1.3)
scene = dataclasses.replace(base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0, f))
LIGHT = 8
cam = vpt.default_camera()
target = np.asarray(build_tile_renderer(scene, cam, W, H, spp_t, max_bounces=16, sampler="ld")(99)).reshape(H, W, 3)
wrong = dataclasses.replace(scene, center=scene.center.at[LIGHT, 1].add(8.0))
t0 = time.time()
theta, losses = fit_geom_fd(wrong, cam, target, sphere=LIGHT, cam_grads=False,
                            steps=steps, spp=spp, learning_rate=0.4,
                            max_bounces=16, sampler="ld", seed=3)
res = np.linalg.norm(np.asarray(theta["center"]) - np.asarray(scene.center[LIGHT]))
print(f"light residual {res:.3f} (started 8.0) in {time.time()-t0:.1f}s  loss {losses[0]:.4g} -> {np.mean(losses[-10:]):.4g}")
