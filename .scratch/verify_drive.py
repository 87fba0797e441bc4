import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, vpt
from vpt.io.ppm import write_ppm
from vpt.core.vecmath import to_display_value
from PIL import Image

scene = vpt.cornell_vpt()
cam = vpt.default_camera()
cfg = vpt.RenderConfig(width=160, height=120, spp=64, max_bounces=16)
img = np.array(vpt.render(scene, cam, cfg))
assert not np.isnan(img).any()
write_ppm('.scratch/verify_cornell.ppm', img)
Image.fromarray(np.asarray(to_display_value(img)).astype(np.uint8)).save(
    '.scratch/verify_cornell.png')
print("cornell mean", img.mean())

fog = vpt.scene.scene.foggy_cornell()
for integ in ("explicit_free", "explicit_equiangular", "implicit_free"):
    cfg = vpt.RenderConfig(width=96, height=72, spp=32, max_bounces=16,
                           integrator=integ)
    im = np.array(vpt.render(fog, cam, cfg))
    assert not np.isnan(im).any(), integ
    assert not (im < 0).any(), integ
    print("fog", integ, "mean %.5f" % im.mean())
    if integ == "explicit_equiangular":
        Image.fromarray(np.asarray(to_display_value(im)).astype(np.uint8)).save(
            '.scratch/verify_fog_ea.png')
