"""Camera-pose recovery, per-block lr (pos 0.5, fov 0.004): dual vs FD."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import dataclasses, time, numpy as np, jax.numpy as jnp, optax
import vpt
from vpt.kernels.wavefront import build_tile_renderer
from vpt.kernels.geom import pack_theta
from vpt.dist import make_fd_geom_train_step, make_geom_train_step

scene = vpt.cornell_vpt()
cam0 = vpt.default_camera()
W, H = 64, 48
target = np.asarray(build_tile_renderer(scene, cam0, W, H, 128,
                    max_bounces=16)(99)).reshape(-1, 3)
cam_w = dataclasses.replace(
    cam0, origin=cam0.origin + np.asarray([4.0, -3.0, 6.0], np.float32),
    fov_scale=cam0.fov_scale * 1.06)
true_o = np.asarray(cam0.origin); true_f = float(cam0.fov_scale)
print('start |o| off:', np.linalg.norm(np.asarray(cam_w.origin) - true_o),
      'fov off:', float(cam_w.fov_scale) - true_f, flush=True)

def opt_factory():
    return optax.multi_transform(
        {'pos': optax.adam(optax.exponential_decay(0.5, 15, 0.75)),
         'fov': optax.adam(optax.exponential_decay(0.004, 15, 0.75))},
        {'center': 'pos', 'cam_origin': 'pos', 'fov': 'fov', 'sigma_a': 'pos', 'sigma_s': 'pos', 'cam_dir': 'pos'})

STEPS, SPP = 100, 64
for mode in ['fd']:
    opt = opt_factory()
    mk = make_fd_geom_train_step if mode == 'fd' else make_geom_train_step
    step = mk(scene, cam_w, W, H, SPP, opt, sphere=None, cam_grads=True,
              max_bounces=16)
    theta = pack_theta(scene, cam_w, None)
    st = opt.init(theta)
    hist_o, hist_f = [], []
    t0 = time.time()
    tf = jnp.asarray(target)
    for i in range(STEPS):
        theta, st, loss = step(theta, st, tf, jnp.int32(3 + i))
        hist_o.append(np.asarray(theta['cam_origin']).copy())
        hist_f.append(float(theta['fov']))
    dt = time.time() - t0
    ro = np.mean(np.stack(hist_o[-15:]), axis=0)
    rf = np.mean(hist_f[-15:])
    print(f'{mode:4s}: origin residual {np.linalg.norm(ro - true_o):.3f} '
          f'(per-axis {ro - true_o}), fov residual {rf - true_f:+.5f}  '
          f'({dt:.1f}s, loss {float(loss):.4g})', flush=True)
print('DONE', flush=True)
