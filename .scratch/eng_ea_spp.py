import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, vpt
fog = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
for spp in (2, 4, 8, 16, 32):
    cfg = vpt.RenderConfig(width=96, height=72, spp=spp, max_bounces=8,
                           integrator="explicit_equiangular")
    im = np.array(vpt.render(fog, cam, cfg))
    print("spp=%2d nan=%d" % (spp, np.isnan(im).sum()), flush=True)
