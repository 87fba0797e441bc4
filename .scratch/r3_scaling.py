"""Round-3 strong-scaling study: can D=8 reach >=85%?

Per BASELINE.md round 2, the forward render has no cross-chip comms, so a
shard's wall-clock IS the pod wall-clock. Round-2 measured (R=32 fixed,
data-axis split): D=8 -> 66.2%. Hypotheses to test on the real chip:
  a) smaller tile_rows at small work (more grid programs pipeline the
     all-lanes-done tail);
  b) sample-axis split (same 256 programs per shard, spp/D samples each)
     instead of data-axis split (256/D programs, full spp).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from vpt import cornell_vpt, default_camera
from vpt.api.config import RenderConfig
from vpt.kernels import wavefront as wf

W = H = 1024
SPP = 64
scene = cornell_vpt()
cfg = RenderConfig(width=W, height=H, spp=SPP)
cam = default_camera()


def timed(fn, *args, n=4):
    best = 1e9
    out = fn(*args)
    np.asarray(out)  # compile+run
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        out = np.asarray(out)
        best = min(best, time.time() - t0)
    return best


def shard_time(tiles, spp, R):
    run = wf.build_tile_renderer(
        scene, cam, W, H, spp, nee=True, distance="free",
        continue_prob=0.6, max_bounces=32, tile_rows=R, sampler="ld")
    lanes = run.lanes_per_tile
    raw = jax.jit(run.make_raw(tiles))
    # reduce on device: return the mean to avoid the tunnel 12MB transfer
    @jax.jit
    def go(seed):
        return raw(seed, jnp.int32(0)).mean()
    t = timed(go, jnp.int32(3))
    paths = tiles * lanes * spp
    return t, paths


total_tiles_r32 = -(-W * H // (32 * 128))
print(f"workload {W}x{H}x{SPP}, total R32 tiles {total_tiles_r32}")

results = {}
for D in (1, 2, 4, 8):
    rows = []
    # a) data split at R in {32, 16, 8}
    for R in (32, 16, 8):
        ntiles = -(-W * H // (R * 128 * D))
        t, paths = shard_time(ntiles, SPP, R)
        rows.append((f"data R={R}", t, paths / t / 1e6))
    # b) sample split at R=32 (full tile count, spp/D)
    t, paths = shard_time(total_tiles_r32, SPP // D, 32)
    rows.append(("sample R=32", t, paths / t / 1e6))
    results[D] = rows
    for name, t, mps in rows:
        print(f"D={D:2d} {name:12s} t={t*1e3:7.1f}ms {mps:7.1f}M paths/s/chip",
              flush=True)

base = max(m for _, _, m in results[1])
print("\nefficiency vs best D=1:")
for D, rows in results.items():
    best = max(rows, key=lambda r: r[2])
    print(f"D={D}: best={best[0]} {best[2]:.1f}M -> {best[2]/base*100:.1f}%")
