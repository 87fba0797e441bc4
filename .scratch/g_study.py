"""Traced-g diff kernel on the real chip: throughput + joint (sigma_s, g)
recovery. Run: nohup python .scratch/g_study.py > .scratch/g_study.log 2>&1 &"""
import sys; sys.path.insert(0, "/root/repo")
import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
import optax
import vpt
from vpt.scene.scene import Medium
from vpt.kernels.diff import make_diff_renderer, pack_params
from vpt.dist.train_fast import make_kernel_train_step
from vpt.kernels.wavefront import build_tile_renderer

CAM = vpt.default_camera()
print("backend:", jax.default_backend(), flush=True)

# ---- throughput at the north-star workload --------------------------------
W, H, SPP = 1024, 1024, 64
base = vpt.cornell_vpt()
sc = dataclasses.replace(base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.4))
for tag, kw, pk in (("diff pair baked g=0.4", dict(), dict()),
                    ("diff pair traced-g",    dict(diff_g=True), dict(with_g=True))):
    r = make_diff_renderer(sc, CAM, W, H, SPP, max_bounces=32, tile_rows=32, **kw)
    p = pack_params(sc, **pk)
    vg = jax.jit(jax.value_and_grad(lambda q, s: jnp.mean(r(q, s)), argnums=0))
    out = vg(p, jnp.int32(0)); jax.tree_util.tree_map(np.asarray, out)  # warm
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        out = vg(p, jnp.int32(i + 1))
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {W*H*SPP/best/1e6:.1f}M paths/s (t={best:.3f}s)", flush=True)

# ---- joint (sigma_s, g) recovery ------------------------------------------
W, H, SPP = 256, 256, 32
true_g, true_ss = 0.6, 0.009
truth = dataclasses.replace(base, medium=Medium(jnp.float32(0.001), jnp.float32(true_ss), jnp.float32(true_g)))
cfg = vpt.RenderConfig(width=W, height=H, spp=512, max_bounces=32, seed=7, renderer="pallas")
target = jnp.asarray(np.asarray(vpt.render(truth, CAM, cfg)).reshape(W * H, 3))
print("target done", flush=True)

start = dataclasses.replace(base, medium=Medium(jnp.float32(0.001), jnp.float32(0.025), jnp.float32(0.0)))
opt = optax.adam(optax.exponential_decay(2e-2, 60, 0.5))
step = make_kernel_train_step(start, CAM, W, H, SPP, opt, max_bounces=32, diff_g=True)
params = pack_params(start, with_g=True)
init = {k: v for k, v in params.items()}
ost = opt.init(params)
t0 = time.perf_counter()
hist = []
for i in range(200):
    params, ost, loss = step(params, ost, target, jnp.int32(i))
    # freeze everything except sigma_s and g (sigma_a stays at truth here)
    params = dict(params, albedo=init["albedo"], radiance=init["radiance"], sigma_a=init["sigma_a"])
    hist.append((float(params["sigma_s"]), float(params["g"])))
    if i % 25 == 0:
        print(f"step {i}: loss {float(loss):.3e} sigma_s {hist[-1][0]:.5f} g {hist[-1][1]:.3f}", flush=True)
wall = time.perf_counter() - t0
tail = np.asarray(hist[-30:])
print(f"recovered sigma_s {tail[:,0].mean():.5f} (true {true_ss}) g {tail[:,1].mean():.3f} (true {true_g}) in {wall:.1f}s", flush=True)
