import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, vpt

fog = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
for mb in (1, 2, 4, 8, 16):
    cfg = vpt.RenderConfig(width=96, height=72, spp=32, max_bounces=mb,
                           integrator="explicit_equiangular")
    im = np.array(vpt.render(fog, cam, cfg))
    print("mb=%2d nan=%d inf=%d neg=%d mean=%.5f" % (
        mb, np.isnan(im).sum(), np.isinf(im).sum(), (im < 0).sum(),
        np.nanmean(im)), flush=True)
