import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time
import numpy as np, jax, jax.numpy as jnp
import vpt
from vpt.media import density as df
from vpt.scene.scene import Medium, blob_cloud
from vpt.scene import camera as cam_mod
from vpt.integrators import engine

W, H = 16, 12
base = blob_cloud()
n = 8
xs = np.linspace(-28, 28, n); ys = np.linspace(-18, 24, n); zs = np.linspace(150, 195, n)
gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
vals_true = np.asarray(df.density(base.medium.density, jnp.asarray(np.stack([gx, gy, gz], -1)))).astype(np.float32)
sp = (xs[1]-xs[0], ys[1]-ys[0], zs[1]-zs[0])
org = (xs[0]-sp[0]/2, ys[0]-sp[1]/2, zs[0]-sp[2]/2)
MAJ = float(vals_true.max()) * 1.3

def with_vals(v):
    f = df.DensityField(params=jnp.asarray(v, jnp.float32), kind="grid", majorant=MAJ,
                        grid_origin=org, grid_spacing=sp)
    return dataclasses.replace(base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0, f))

cams = [vpt.default_camera(),
        cam_mod.look_at((150, 30, 170), (0, 0, 170)),
        cam_mod.look_at((-140, -20, 175), (0, 0, 170))]
ids = jnp.arange(W*H, dtype=jnp.int32)

spec_f = engine.IntegratorSpec(max_bounces=6)
spec_s = engine.IntegratorSpec(max_bounces=6, sigma_score=True)

def render_t(scene, camera, key, spp, spec, diff=False):
    def one(acc, s):
        ks = jax.random.fold_in(key, s)
        o, d = cam_mod.rays_for_pixels(camera, W, H, ids, ks, True)
        return acc + engine.trace(scene, spec, o, d, ks, differentiable=diff), None
    acc, _ = jax.lax.scan(one, jnp.zeros((W*H,3)), jnp.arange(spp))
    return acc/spp

# targets at high spp
TSPP = 24
targets = [np.asarray(render_t(with_vals(vals_true), c, jax.random.PRNGKey(100+i), TSPP, spec_f)) for i, c in enumerate(cams)]
tf = jnp.stack([jnp.asarray(t) for t in targets])
wts = 1.0/(jnp.mean(tf, axis=-1, keepdims=True)+0.05)**2

@jax.jit
def loss_and_grad(v, key, spp):
    def loss_fn(v):
        tot = 0.0
        for i, c in enumerate(cams):
            ka, kb = jax.random.split(jax.random.fold_in(key, i))
            a = render_t(with_vals(v), c, ka, spp, spec_s, diff=True)
            b = render_t(with_vals(v), c, kb, spp, spec_s, diff=True)
            tot = tot + jnp.mean((a-tf[i])*(b-tf[i])*wts[i])
        return tot/3
    return jax.value_and_grad(loss_fn)(v)

init = np.full((n,n,n), 0.3, np.float32)
# loss at init vs at truth (high spp forward estimate)
@jax.jit
def loss_only(v, key, spp):
    tot = 0.0
    for i, c in enumerate(cams):
        ka, kb = jax.random.split(jax.random.fold_in(key, i))
        a = render_t(with_vals(v), c, ka, spp, spec_f)
        b = render_t(with_vals(v), c, kb, spp, spec_f)
        tot = tot + jnp.mean((a-tf[i])*(b-tf[i])*wts[i])
    return tot/3
print("loss(init) =", float(loss_only(jnp.asarray(init), jax.random.PRNGKey(1), 8)))
print("loss(true) =", float(loss_only(jnp.asarray(vals_true), jax.random.PRNGKey(2), 8)))

# averaged gradient at init: does -g point toward truth?
G = np.zeros_like(init); K = 4
for i in range(K):
    l, g = loss_and_grad(jnp.asarray(init), jax.random.PRNGKey(500+i), 4)
    G += np.asarray(g)/K
d = (vals_true - init)
cos = (G*(-d)).sum()/ (np.linalg.norm(G)*np.linalg.norm(d) + 1e-12)
print("cos(-grad, truth-init) =", float((G*d).sum()/(np.linalg.norm(G)*np.linalg.norm(d)+1e-12)) * -1.0)
print("|grad| =", np.linalg.norm(G), " corr voxelwise:", np.corrcoef(G.ravel(), d.ravel())[0,1])
