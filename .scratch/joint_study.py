"""On-chip: JOINT geometry + medium inverse rendering on one kernel.

Unknowns: light position (sphere 8, +8y offset) AND sigma_a/sigma_s
(started at 2.5x truth). CRN FD on the theta-traced primal kernel, 5 dims
x 4 launches/step. Per-block Adam rates via optax.multi_transform."""
import sys; sys.path.insert(0, '/root/repo')
import dataclasses, time, numpy as np, jax.numpy as jnp, optax
import vpt
from vpt.kernels.wavefront import build_tile_renderer
from vpt.kernels.geom import pack_theta
from vpt.dist import make_fd_geom_train_step

scene = vpt.cornell_vpt()
cam = vpt.default_camera()
W, H = 64, 48
target = np.asarray(build_tile_renderer(scene, cam, W, H, 128,
                    max_bounces=16)(99)).reshape(-1, 3)
true_c = np.asarray(scene.center[8])
true_sa, true_ss = float(scene.medium.sigma_a), float(scene.medium.sigma_s)

wrong = dataclasses.replace(
    scene,
    center=scene.center.at[8, 1].set(true_c[1] + 8.0),
    medium=dataclasses.replace(scene.medium,
                               sigma_a=scene.medium.sigma_a * 2.5,
                               sigma_s=scene.medium.sigma_s * 2.5))

opt = optax.multi_transform(
    {'pos': optax.adam(optax.exponential_decay(0.8, 12, 0.75)),
     'sig': optax.adam(optax.exponential_decay(2e-3, 20, 0.75))},
    {'center': 'pos', 'cam_origin': 'pos', 'fov': 'pos',
     'sigma_a': 'sig', 'sigma_s': 'sig'})
STEPS, SPP = 120, 64
step = make_fd_geom_train_step(wrong, cam, W, H, SPP, opt, sphere=8,
                               cam_grads=False, sigma=True, max_bounces=16)
theta = pack_theta(wrong, cam, 8)
st = opt.init(theta)
tf = jnp.asarray(target)
hist = []
t0 = time.time()
for i in range(STEPS):
    theta, st, loss = step(theta, st, tf, jnp.int32(3 + i))
    hist.append((np.asarray(theta['center']).copy(),
                 float(theta['sigma_a']), float(theta['sigma_s'])))
dt = time.time() - t0
tail = hist[-20:]
rc = np.mean(np.stack([h[0] for h in tail]), axis=0)
ra = np.mean([h[1] for h in tail]); rs = np.mean([h[2] for h in tail])
print(f'light y: start {true_c[1]+8:.2f} true {true_c[1]:.2f} got {rc[1]:.3f} '
      f'(3D residual {np.linalg.norm(rc-true_c):.3f})', flush=True)
print(f'sigma_a: start {true_sa*2.5:.5f} true {true_sa:.5f} got {ra:.5f}', flush=True)
print(f'sigma_s: start {true_ss*2.5:.5f} true {true_ss:.5f} got {rs:.5f}', flush=True)
print(f'loss {float(loss):.4g}  {dt:.1f}s for {STEPS} steps '
      f'({STEPS*5*4} kernel launches)', flush=True)
print('DONE', flush=True)
