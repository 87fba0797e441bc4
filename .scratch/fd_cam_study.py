"""On-chip: camera-pose (origin + fov) recovery via boundary-aware CRN FD
in the occlusion-heavy Cornell scene — the case the dual/AD estimators are
boundary-dominated in (every silhouette sweeps across pixels)."""
import sys; sys.path.insert(0, '/root/repo')
import dataclasses, time, numpy as np, optax
import vpt
from vpt.kernels.wavefront import build_tile_renderer
from vpt.dist import fit_geom_fd, fit_geom

scene = vpt.cornell_vpt()
cam0 = vpt.default_camera()
W, H = 64, 48
target = np.asarray(build_tile_renderer(scene, cam0, W, H, 128,
                    max_bounces=16)(99)).reshape(H, W, 3)

def perturbed(cam):
    return dataclasses.replace(
        cam,
        origin=cam.origin + np.asarray([4.0, -3.0, 6.0], np.float32),
        fov_scale=cam.fov_scale * 1.06)

cam_w = perturbed(cam0)
true_o = np.asarray(cam0.origin); true_f = float(cam0.fov_scale)
print('start offset |o|:', np.linalg.norm(np.asarray(cam_w.origin)-true_o),
      'fov off:', float(cam_w.fov_scale)-true_f, flush=True)

for mode, fit in [('dual', fit_geom), ('fd', fit_geom_fd)]:
    hist_o, hist_f = [], []
    def track(theta, init):
        hist_o.append(np.asarray(theta['cam_origin']).copy())
        hist_f.append(float(theta['fov'])); return theta
    t0 = time.time()
    kw = dict(sphere=None, cam_grads=True, steps=100, spp=64,
              learning_rate=optax.exponential_decay(0.5, 15, 0.75),
              max_bounces=16, seed=3, param_filter=track)
    theta, losses = fit(scene, cam_w, target, **kw)
    dt = time.time() - t0
    ro = np.mean(np.stack(hist_o[-15:]), axis=0)
    rf = np.mean(hist_f[-15:])
    print(f'{mode:4s}: origin residual {np.linalg.norm(ro-true_o):.3f} '
          f'(per-axis {ro-true_o}), fov residual {rf-true_f:+.5f} '
          f'({dt:.1f}s, loss {losses[-1]:.4g})', flush=True)
print('DONE', flush=True)
