import os, sys, time
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, vpt
from vpt.core.vecmath import to_display_value
g = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "tests", "data", "golden_cornell_linear.npz"))["ds16"]
scene = vpt.cornell_vpt(); cam = vpt.default_camera()
acc = np.zeros((768, 1024, 3)); t0=time.time()
for i in range(10):
    cfg = vpt.RenderConfig(width=1024, height=768, spp=4, max_bounces=32,
                           chunk_pixels=98304, seed=500 + i)
    img = np.asarray(vpt.render(scene, cam, cfg))
    acc += np.power(to_display_value(img) / 255.0, 2.2)
    ours = (acc / (i+1)).reshape(48, 16, 64, 16, 3).mean(axis=(1, 3))
    rel = np.abs(ours - g) / (np.abs(g) + 1e-3)
    c = np.corrcoef(ours.ravel(), g.ravel())[0, 1]
    print(f"runs={i+1} corr={c:.4f} med_rel={np.percentile(rel,50):.4f} p95={np.percentile(rel,95):.4f} mean_ratio={ours.mean()/g.mean():.4f} t={time.time()-t0:.0f}s", flush=True)
