import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_debug_nans', True)
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, vpt

fog = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
cfg = vpt.RenderConfig(width=96, height=72, spp=32, max_bounces=8,
                       integrator="explicit_equiangular")
im = np.array(vpt.render(fog, cam, cfg))
print("nan=%d" % np.isnan(im).sum(), flush=True)
