import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_debug_nans', True)
jax.config.update('jax_disable_jit', True)
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax.numpy as jnp, vpt
from vpt.integrators import engine
from vpt.integrators.volume import VOLUME_INTEGRATORS
from vpt.api.render import resolve_tracer
from vpt.core import rng
fog = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
W, H, SPP, MB = 96, 72, 2, 8
_, spec, _ = resolve_tracer("explicit_equiangular", 0.6, MB)
key = rng.fold(jax.random.PRNGKey(0), 0)     # chunk 0 fold as in api.render
ids = jnp.arange(W * H, dtype=jnp.int32)
L = engine.render_persistent(fog, spec, cam, W, H, ids, SPP, key)
print("nan lanes:", np.argwhere(np.isnan(np.asarray(L)).any(-1)).ravel()[:5],
      flush=True)
