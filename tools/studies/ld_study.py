"""On-chip: sampler='ld' (CP-rotated R3, first 3 dims) vs 'random' —
clamped-MSE at equal spp + throughput at the bench workload."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time, numpy as np, jax, jax.numpy as jnp
import vpt
from vpt.kernels.wavefront import build_tile_renderer

scene = vpt.cornell_vpt(); cam = vpt.default_camera()
W = H = 256
tgt = None

def render_mean_mse(sampler, spp, seeds):
    run = build_tile_renderer(scene, cam, W, H, spp, max_bounces=16,
                              sampler=sampler)
    @jax.jit
    def mse(s):
        img = jnp.clip(run(s), 0.0, 1.0)
        return jnp.mean((img - tgt) ** 2)
    return float(np.mean([np.asarray(mse(s)) for s in seeds]))

run_t = build_tile_renderer(scene, cam, W, H, 8192, max_bounces=16)
tgt = jnp.clip(run_t(999), 0.0, 1.0)
print('target done', flush=True)

for spp in (4, 16, 64):
    mr = render_mean_mse('random', spp, range(10))
    ml = render_mean_mse('ld', spp, range(10))
    print(f'spp={spp:3d}  mse random {mr:.5g}  ld {ml:.5g}  '
          f'ratio {mr/ml:.3f}x', flush=True)

# throughput at the bench workload (1024x1024x64)
WB = HB = 1024; SPPB = 64
for sampler in ('random', 'ld'):
    run = build_tile_renderer(scene, cam, WB, HB, SPPB, max_bounces=32,
                              sampler=sampler)
    @jax.jit
    def red(s):
        return jnp.mean(run(s), axis=0)
    np.asarray(red(0))   # compile+warm
    best = np.inf
    for i in range(4):
        t0 = time.perf_counter()
        np.asarray(red(i + 1))
        best = min(best, time.perf_counter() - t0)
    rate = WB * HB * SPPB / best
    print(f'throughput {sampler:6s}: {rate/1e6:.1f}M paths/s', flush=True)
print('DONE', flush=True)
