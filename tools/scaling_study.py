"""Strong-scaling study of the fused render kernel, tunnel-artifact-free.

The forward render has no cross-chip communication (BASELINE.md round 2):
each device renders its contiguous pixel-tile shard, so per-shard device
wall-clock IS the pod wall-clock. This machine reaches its one v5e chip
through the axon dev tunnel, whose BLOCKING dispatch round-trip is ~30ms
(measured below) — comparable to a D=8 shard's 41ms of device work, so a
naive one-launch-one-wait timing under-reports small shards by ~70% and
the round-2 table reported that artifact as a 66% D=8 efficiency.

Method here: launch each shard K times back-to-back inside ONE jit
(different seeds, summed on device) => K kernel executions, one host
round-trip; per-launch device time = t/K with the RTT amortized to
~30/K ms. K=8 bounds the residual artifact at <1ms/launch. This is also
the honest model of production rendering: progressive/training workloads
issue launches continuously with async dispatch, and on local PCIe the
round-trip is ~1ms.

Usage: python tools/scaling_study.py [--spp 64] [--size 1024] [--k 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--tile-rows", type=int, default=32)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import vpt
    from vpt.kernels import wavefront as wf

    W = H = args.size
    scene = vpt.cornell_vpt()
    cam = vpt.default_camera()

    def timed(fn, *a, n=args.reps):
        out = fn(*a)
        np.asarray(out)  # compile + first run
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            np.asarray(fn(*a))
            best = min(best, time.time() - t0)
        return best

    @jax.jit
    def trivial(x):
        return x * 2.0

    rtt = timed(trivial, jnp.float32(3.0))
    print(f"host<->device round-trip (trivial jit): {rtt*1e3:.1f}ms")

    run = wf.build_tile_renderer(scene, cam, W, H, args.spp, nee=True,
                                 distance="free", tile_rows=args.tile_rows,
                                 sampler="ld")
    lanes = run.lanes_per_tile
    K = args.k
    rows = []
    for D in (1, 2, 4, 8):
        ntiles = -(-W * H // (lanes * D))
        raw = run.make_raw(ntiles)

        @jax.jit
        def go(seed):
            acc = jnp.float32(0)
            for k in range(K):
                acc = acc + raw(seed + k, jnp.int32(0)).mean()
            return acc

        t = timed(go, jnp.int32(3)) / K
        paths = ntiles * lanes * args.spp
        rows.append((D, ntiles, t, paths / t / 1e6))
        print(f"D={D}: tiles/shard={ntiles:4d} t/launch={t*1e3:6.1f}ms "
              f"{paths/t/1e6:7.1f}M paths/s/chip", flush=True)

    base = rows[0][3]
    print("\nstrong scaling (fixed frame split over D shards), device time:")
    for D, ntiles, t, mps in rows:
        print(f"D={D}: {mps:7.1f}M paths/s/chip  efficiency {mps/base*100:5.1f}%")


if __name__ == "__main__":
    sys.exit(main())
