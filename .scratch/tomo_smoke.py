import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time
import numpy as np, jax, jax.numpy as jnp
import vpt
from vpt.media import density as df
from vpt.scene.scene import Medium, blob_cloud
from vpt.scene import camera as cam_mod
from vpt.dist import fit_grid
from vpt.integrators import engine

W, H, SPP_T = 16, 12, 16
base = blob_cloud()

# truth grid: rasterize the scene's analytic blobs onto a coarse grid
n = 8
xs = np.linspace(-28, 28, n); ys = np.linspace(-18, 24, n); zs = np.linspace(150, 195, n)
gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
pts = jnp.asarray(np.stack([gx, gy, gz], -1))
vals_true = np.asarray(df.density(base.medium.density, pts))
sp = (xs[1]-xs[0], ys[1]-ys[0], zs[1]-zs[0])
org = (xs[0]-sp[0]/2, ys[0]-sp[1]/2, zs[0]-sp[2]/2)
MAJ = float(vals_true.max()) * 1.3
gtrue = df.grid(vals_true, origin=org, spacing=sp, majorant=MAJ)

def with_field(f):
    return dataclasses.replace(base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0, f))

cams = [vpt.default_camera(),
        cam_mod.look_at((150, 30, 170), (0, 0, 170)),
        cam_mod.look_at((-140, -20, 175), (0, 0, 170))]

spec = engine.IntegratorSpec(max_bounces=6)
ids = jnp.arange(W*H, dtype=jnp.int32)
def render(scene, camera, seed, spp):
    key = jax.random.PRNGKey(seed)
    def one(acc, s):
        ks = jax.random.fold_in(key, s)
        o, d = cam_mod.rays_for_pixels(camera, W, H, ids, ks, True)
        return acc + engine.trace(scene, spec, o, d, ks), None
    acc, _ = jax.lax.scan(one, jnp.zeros((W*H,3)), jnp.arange(spp))
    return np.asarray(acc/spp).reshape(H, W, 3)

ts = with_field(gtrue)
targets = [render(ts, c, 100+i, SPP_T) for i, c in enumerate(cams)]
print("targets done", [t.mean() for t in targets])

init_vals = np.full((n,n,n), 0.3, np.float32)
ginit = df.grid(init_vals, origin=org, spacing=sp, majorant=MAJ)
scene0 = with_field(ginit)

t0 = time.time()
rec, losses = fit_grid(scene0, cams, targets, steps=12, spp=2,
                       learning_rate=4e-2, max_bounces=6, seed=7, log_every=2)
print(f"{time.time()-t0:.1f}s  loss {losses[0]:.4g} -> {np.mean(losses[-3:]):.4g}")
rec = np.asarray(rec)
err0 = np.abs(init_vals - vals_true).mean()
err1 = np.abs(rec - vals_true).mean()
c = np.corrcoef(rec.ravel(), vals_true.ravel())[0,1]
print(f"voxel MAE {err0:.4f} -> {err1:.4f}; corr(rec, true) = {c:.3f}")
