"""Multi-view joint (sigma_a, sigma_s, g, fog_k) recovery on one chip.

Single-view fog estimation is weakly identifiable (similarity theory:
appearance constrains sigma_s*(1-g) and the profile jointly — BASELINE.md
round-3 note). This study adds VIEWS, not estimator machinery: V diff
renderers (one per camera), gradients averaged across views per step.
"""
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
import optax
import vpt
from vpt.kernels.diff import make_diff_renderer, pack_params
from vpt.kernels.wavefront import build_tile_renderer
from vpt.media.density import exp_height
from vpt.scene.scene import foggy_cornell
from vpt.scene.camera import look_at, default_camera
from vpt.dist.train import project_params

base = foggy_cornell()
base = dataclasses.replace(base, medium=dataclasses.replace(base.medium, g=0.5))
W = H = 192; TSPP = 4096; SPP = 32

cams = [
    default_camera(),
    look_at((35.0, 30.0, 180.0), (0.0, -10.0, 0.0)),
    look_at((-38.0, -20.0, 150.0), (10.0, 0.0, -40.0)),
]
print("rendering %d targets..." % len(cams), flush=True)
targets = []
for c in cams:
    tgt = np.asarray(build_tile_renderer(base, c, W, H, TSPP, max_bounces=32,
                                         tile_rows=32, sampler="ld")(123)
                     ).reshape(-1, 3) / TSPP
    targets.append(jnp.asarray(tgt))

wrong = dataclasses.replace(
    base, medium=dataclasses.replace(
        base.medium, sigma_a=0.010, sigma_s=0.020, g=0.0,
        density=exp_height(k=0.12, y0=-40.8, majorant=1.01)))

renders = [make_diff_renderer(wrong, c, W, H, SPP // 2, max_bounces=32,
                              tile_rows=32, sampler="ld",
                              diff_g=True, diff_field=True) for c in cams]
params = pack_params(wrong, with_g=True, with_field=True)
init = dict(params)
# LOG-space medium block: Adam's unit-scale steps become MULTIPLICATIVE
# for sigma/k (a 4e-3 step is x1.004), which cannot blast the medium into
# the vanishing-gradient thick-fog basin the raw parameterization hits
def to_opt(p):
    q = dict(p)
    for k in ("sigma_a", "sigma_s", "fog_k"):
        q[k] = jnp.log(jnp.maximum(p[k], 1e-8))
    return q

def from_opt(q):
    p = dict(q)
    for k in ("sigma_a", "sigma_s", "fog_k"):
        p[k] = jnp.exp(q[k])
    return p

opt_params = to_opt(params)
opt = optax.adam(optax.exponential_decay(6e-3, 80, 0.8))
state = opt.init(opt_params)

# per-pixel relMSE weights from the TARGET (fixed weights keep the A/B
# identity E[w (A-t)(B-t)] = w (E-t)^2 exact): without them the side
# views' direct-emitter pixels (radiance 4000) dominate the loss and the
# first steps blast the medium into a thick-fog local basin
weights = [1.0 / (jnp.mean(t, axis=-1, keepdims=True) + 0.05) ** 2
           for t in targets]

@jax.jit
def step(qp, state, seed):
    def loss_fn(q):
        p = from_opt(q)
        tot = 0.0
        for r, t, w in zip(renders, targets, weights):
            a = r(p, seed * 2)
            b = r(p, seed * 2 + 1)
            tot = tot + jnp.mean(w * (a - t) * (b - t))
        return tot / len(renders)
    loss, g = jax.value_and_grad(loss_fn)(qp)
    upd, state = opt.update(g, state, qp)
    qp = optax.apply_updates(qp, upd)
    qp["g"] = jnp.clip(qp["g"], -0.95, 0.95)
    return qp, state, loss

print("compiling multi-view step...", flush=True)
t0 = time.time()
tail = []
for i in range(800):
    opt_params, state, loss = step(opt_params, state, jnp.int32(100 + i))
    for k in ("albedo", "radiance"):
        opt_params[k] = init[k]
    cur = from_opt(opt_params)
    if i >= 700:
        tail.append([float(cur["sigma_a"]), float(cur["sigma_s"]),
                     float(cur["g"]), float(cur["fog_k"])])
    if i % 50 == 0:
        print("step %3d loss %.5f  sa=%.5f ss=%.5f g=%.3f k=%.4f" %
              (i, float(loss), float(cur["sigma_a"]),
               float(cur["sigma_s"]), float(cur["g"]),
               float(cur["fog_k"])), flush=True)
m = np.mean(tail, axis=0)
print("FINAL Polyak tail (true sa=0.004 ss=0.036 g=0.5 k=0.06): "
      "sa=%.5f ss=%.5f g=%.3f k=%.4f in %.1fs" %
      (m[0], m[1], m[2], m[3], time.time() - t0), flush=True)
