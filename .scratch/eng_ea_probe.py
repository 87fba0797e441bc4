import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_disable_jit', True)
import sys; sys.path.insert(0, '/root/repo')
import numpy as np, jax.numpy as jnp, vpt
from vpt.media import nee as nee_mod
from vpt.integrators import engine
from vpt.api.render import resolve_tracer
from vpt.core import rng

orig = nee_mod.single_scattering
def probe(scene, xt, idsource, sigma_t, sigma_s, transmittance_xt,
          prob_source, u1, u2, **kw):
    t = np.asarray(transmittance_xt); s = np.asarray(sigma_s)
    x = np.asarray(xt)
    bad = ~np.isfinite(t) | ~np.isfinite(s)
    if bad.any():
        i = np.argwhere(bad).ravel()[0]
        print("BAD lane", i, "t_xt", t[i] if t.ndim else t,
              "sigma_s_x", s[i] if s.ndim else s, "xt", x[i], flush=True)
    big = np.isfinite(s) & (np.abs(s) > 1e20) if s.ndim else np.zeros(1, bool)
    if s.ndim and big.any():
        i = np.argwhere(big).ravel()[0]
        print("HUGE sigma_s_x lane", i, "=", s[i], "t_xt", t[i],
              "xt", x[i], "prod", t[i]*s[i], flush=True)
    return orig(scene, xt, idsource, sigma_t, sigma_s, transmittance_xt,
                prob_source, u1, u2, **kw)
nee_mod.single_scattering = probe
engine.nee_mod.single_scattering = probe

fog = vpt.scene.scene.foggy_cornell()
cam = vpt.default_camera()
W, H, SPP, MB = 96, 72, 2, 8
_, spec, _ = resolve_tracer("explicit_equiangular", 0.6, MB)
key = rng.fold(jax.random.PRNGKey(0), 0)
ids = jnp.arange(W * H, dtype=jnp.int32)
L = engine.render_persistent(fog, spec, cam, W, H, ids, SPP, key)
print("nan lanes:", np.argwhere(np.isnan(np.asarray(L)).any(-1)).ravel()[:5],
      flush=True)
