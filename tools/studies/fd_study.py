"""On-chip study: detached dual-kernel gradients vs boundary-aware CRN FD.

Case A (point light, Cornell sphere 8): dual is known-biased (~2.3 residual).
Case B (open-medium AREA light): dual diverges (boundary term has the mass).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import dataclasses, time, numpy as np, optax
import vpt
from vpt.kernels.wavefront import build_tile_renderer
from vpt.dist import fit_geom, fit_geom_fd

cam = vpt.default_camera()
W, H = 64, 48
lr = optax.exponential_decay(0.8, 12, 0.75)

def track_factory(hist):
    def track(theta, init):
        hist.append(np.asarray(theta['center']).copy()); return theta
    return track

def run_case(name, scene, sphere, offset, mode, steps=80, spp=64, h=0.5):
    target = np.asarray(build_tile_renderer(scene, cam, W, H, 128,
                        max_bounces=16)(99)).reshape(H, W, 3)
    true_c = np.asarray(scene.center[sphere])
    wrong = dataclasses.replace(
        scene, center=scene.center.at[sphere, 1].set(true_c[1] + offset))
    hist = []
    t0 = time.time()
    fit = fit_geom_fd if mode == 'fd' else fit_geom
    kw = dict(sphere=sphere, cam_grads=False, steps=steps, spp=spp,
              learning_rate=lr, max_bounces=16, seed=3,
              param_filter=track_factory(hist))
    if mode == 'fd':
        kw['h'] = h
    theta, losses = fit(wrong, cam, target, **kw)
    dt = time.time() - t0
    rec = np.mean(np.stack(hist[-15:]), axis=0)
    res = float(np.linalg.norm(rec - true_c))
    print(f'{name:28s} mode={mode:4s} start_off={offset:.1f} '
          f'residual={res:.3f}  y_rec={rec[1]:.3f} (true {true_c[1]:.2f})  '
          f'{dt:.1f}s', flush=True)
    return res, dt

cornell = vpt.cornell_vpt()
open_med = vpt.make_scene(
    [(2.0, (0.0, 0.0, -50.0), (0,0,0), (60.0, 50.0, 40.0), 0,
      (0,0,0), (0,0,0), 0.0)],
    sigma_a=0.002, sigma_s=0.015)

run_case('cornell point-light (s8)', cornell, 8, 8.0, 'dual')
run_case('cornell point-light (s8)', cornell, 8, 8.0, 'fd')
run_case('open-medium area-light', open_med, 0, 8.0, 'dual')
run_case('open-medium area-light', open_med, 0, 8.0, 'fd')
print('DONE', flush=True)
