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
    ap.add_argument("--train", action="store_true",
                    help="measure the TRAINING step (fused fwd+bwd pair "
                         "per shard) instead of the forward render")
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

    K = args.k
    if args.train:
        # TRAINING-step strong scaling (round 4, VERDICT #3): each shard
        # runs the fused fwd+bwd pair over its tile range (the compute
        # side of dist/train_fast.make_sharded_kernel_train_step). The
        # step's ONLY collective is a psum of the packed gradient vector
        # — P = 2+6S (+g +fog_k) floats, ~250 BYTES — whose ICI cost is
        # microseconds against a ~50ms shard: per-shard device time IS
        # the pod step time to <0.1%, and "overlap with backward" is moot
        # at this payload (see BASELINE.md round-4 notes).
        from vpt.kernels.diff import make_diff_renderer, pack_params, \
            _flatten
        render = make_diff_renderer(scene, cam, W, H, args.spp // 2,
                                    max_bounces=32,
                                    tile_rows=args.tile_rows, sampler="ld")
        lanes = render.lanes_per_tile
        S = scene.radius.shape[0]
        params = pack_params(scene)
        rows = []
        for D in (1, 2, 4, 8):
            ntiles = -(-W * H // (lanes * D))
            shard = render.make_shard(ntiles)
            npx = ntiles * lanes
            target = jnp.zeros((npx, 3), jnp.float32)

            @jax.jit
            def go(p, seed):
                acc = jnp.float32(0)
                for k in range(K):
                    def loss_fn(pp):
                        a = shard(pp, seed * 2 + 2 * k, jnp.int32(0))
                        b = shard(pp, seed * 2 + 2 * k + 1, jnp.int32(0))
                        return jnp.mean((a - target) * (b - target))

                    l, g = jax.value_and_grad(loss_fn)(p)
                    acc = acc + l + g["sigma_s"] * 0.0
                return acc

            t = timed(go, params, jnp.int32(3)) / K
            # each A/B step renders 2x(spp/2) samples fwd AND bwd
            paths = npx * args.spp
            rows.append((D, ntiles, t, paths / t / 1e6))
            print(f"D={D}: tiles/shard={ntiles:4d} t/step={t*1e3:6.1f}ms "
                  f"{paths/t/1e6:7.1f}M paths/s/chip fwd+bwd", flush=True)
        base = rows[0][3]
        print("\ntraining-step strong scaling (A/B fwd+bwd pair, device "
              "time; the ~250B grad psum adds <0.1%):")
        for D, ntiles, t, mps in rows:
            print(f"D={D}: {mps:7.1f}M paths/s/chip  "
                  f"efficiency {mps/base*100:5.1f}%")
        return

    run = wf.build_tile_renderer(scene, cam, W, H, args.spp, nee=True,
                                 distance="free", tile_rows=args.tile_rows,
                                 sampler="ld")
    lanes = run.lanes_per_tile
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
