"""On-chip: adaptive sampling vs uniform at EQUAL average sample budget.
adaptive(spp, boost, frac) spends spp*(1 + frac*boost/2) samples/pixel on
average; compare clamped-MSE + wall time against plain renders at that
equivalent spp."""
import sys, time; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
import vpt
from vpt.kernels.wavefront import build_tile_renderer

scene = vpt.cornell_vpt(); cam = vpt.default_camera()
W = H = 256
run_t = build_tile_renderer(scene, cam, W, H, 8192, max_bounces=16)
tgt = jnp.clip(run_t(999), 0.0, 1.0)
print('target done', flush=True)

def mse_plain(spp, seeds):
    run = build_tile_renderer(scene, cam, W, H, spp, max_bounces=16)
    f = jax.jit(lambda s: jnp.mean((jnp.clip(run(s), 0, 1) - tgt) ** 2))
    np.asarray(f(0))
    t0 = time.perf_counter(); vals = [float(np.asarray(f(s))) for s in seeds]
    return np.mean(vals), (time.perf_counter() - t0) / len(seeds)

def mse_adapt(spp, boost, frac, seeds):
    cfg = vpt.RenderConfig(width=W, height=H, spp=spp, max_bounces=16)
    tgt_flat = tgt.reshape(H, W, 3)
    def one(s):
        img = vpt.render_adaptive(scene, cam, cfg, boost=boost, frac=frac,
                                  seed=s)
        return float(np.asarray(jnp.mean((jnp.clip(img, 0, 1) - tgt_flat) ** 2)))
    one(0)
    t0 = time.perf_counter(); vals = [one(s) for s in seeds]
    return np.mean(vals), (time.perf_counter() - t0) / len(seeds)

SEEDS = range(10)
for spp, boost, frac in [(16, 3.0, 0.25), (16, 6.0, 0.125), (64, 3.0, 0.25)]:
    eq = int(round(spp * (1 + frac * boost / 2)))
    mp, tp = mse_plain(eq, SEEDS)
    ma, ta = mse_adapt(spp, boost, frac, SEEDS)
    print(f'budget~{eq}spp: plain mse {mp:.5g} ({tp*1e3:.1f}ms) | '
          f'adaptive(spp={spp},boost={boost},frac={frac}) mse {ma:.5g} '
          f'({ta*1e3:.1f}ms) | mse ratio {mp/ma:.3f}x', flush=True)
print('DONE', flush=True)
