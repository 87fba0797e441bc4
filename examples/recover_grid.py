"""Multi-view voxel tomography: recover a 3D density grid from renders.

The reference's inverse question is two scalars (sigma_a, sigma_s at
src/rt.cpp:794); this example recovers a whole voxel-grid density field
(`vpt.media.density.grid`) — differentiable volume reconstruction through
the engine's score-function estimator (`vpt.dist.fit_grid`,
IntegratorSpec(sigma_score=True)).

Setup: the `blob_cloud` scene's analytic smoke is rasterized onto an
n^3 grid (the "truth"), rendered from V=3 cameras; optimization starts
from a uniform fog box and descends the multi-view A/B-MSE.

    python examples/recover_grid.py                 # kernel path, n=16
    python examples/recover_grid.py --backend engine --n 8 --res 24

Round 4: the fused Pallas kernels learned voxel grids (chunked
lane-gather trilinear forward; two-phase-replay backward whose voxel
scatter-add runs as MXU one-hot matmuls — BASELINE.md round-4 grid
study), so the default backend is now "kernel" at 4.8M paths/s fwd+bwd
— ~16x the engine path — with targets rendered by the forward kernel.
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16, help="grid resolution n^3")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--spp", type=int, default=8,
                    help="per-render spp (each step renders 2 per view)")
    ap.add_argument("--res", type=int, default=128, help="target width")
    ap.add_argument("--target-spp", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--backend", choices=("kernel", "engine"),
                    default="kernel")
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--init", type=float, default=0.05,
                    help="uniform initial density (low + L1: empty space "
                         "stays empty, the cloud grows where photons say)")
    ap.add_argument("--reg-l1", type=float, default=2e-3,
                    help="L1 sparsity prior (see dist/tomography.py: "
                         "zero-signal voxels random-walk without it)")
    ap.add_argument("--reg-tv", type=float, default=0.0,
                    help="total-variation smoothness prior (round 5): "
                         "flattens salt-and-pepper noise inside the cloud")
    ap.add_argument("--interp", choices=("tri", "nearest"), default="tri",
                    help="pc transport interpolant; 'nearest' is ~3-7x "
                         "faster at n>=24 (BASELINE.md round 5)")
    ap.add_argument("--lr-decay", type=float, default=1.0,
                    help="final/initial lr ratio, exponential schedule "
                         "over the run (1.0 = constant); a decayed tail "
                         "converges into the stochastic-gradient noise "
                         "ball instead of wandering in it")
    ap.add_argument("--polyak", type=float, default=0.0,
                    help="tail fraction (0..1) of steps to Polyak-average "
                         "(0 = off); returns the average of the last "
                         "polyak*steps iterates")
    ap.add_argument("--distance", choices=("free", "equiangular"),
                    default="free",
                    help="distance-sampling family for the training "
                         "renders (the reference's research question in "
                         "voxel-gradient form)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import vpt
    from vpt.dist import fit_grid
    from vpt.integrators import engine
    from vpt.media import density as df
    from vpt.scene import camera as cam_mod
    from vpt.scene.scene import Medium, blob_cloud

    W, H = args.res, (args.res * 3) // 4
    base = blob_cloud()
    n = args.n

    # truth: rasterize the scene's own analytic blobs over the cloud region
    xs = np.linspace(-28, 28, n)
    ys = np.linspace(-18, 24, n)
    zs = np.linspace(150, 195, n)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    vals_true = np.asarray(
        df.density(base.medium.density,
                   jnp.asarray(np.stack([gx, gy, gz], -1))))
    sp = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
    org = (xs[0] - sp[0] / 2, ys[0] - sp[1] / 2, zs[0] - sp[2] / 2)
    maj = float(vals_true.max()) * 1.3

    def with_field(vals):
        f = df.grid(vals, origin=org, spacing=sp, majorant=maj,
                    transport_interp=args.interp)
        return dataclasses.replace(
            base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s,
                                0.0, f))

    # views 7-12 (round 5): top-down/bottom-up profile-resolving and
    # reverse geometry — few-view tomography is under-determined, and the
    # round-4 multi-view study showed view DIVERSITY targets specific
    # degeneracies (frontal-only cannot resolve the depth profile)
    cams = [vpt.default_camera(),
            cam_mod.look_at((150, 30, 170), (0, 0, 170)),
            cam_mod.look_at((-140, -20, 175), (0, 0, 170)),
            cam_mod.look_at((80, 90, 120), (0, 0, 170)),
            cam_mod.look_at((-90, 70, 240), (0, 0, 170)),
            cam_mod.look_at((40, -60, 100), (0, 0, 170)),
            cam_mod.look_at((5, 160, 172), (0, 0, 172)),
            cam_mod.look_at((-10, -150, 170), (0, 5, 170)),
            cam_mod.look_at((10, 20, 330), (0, 0, 172)),
            cam_mod.look_at((120, -90, 230), (0, 0, 170)),
            cam_mod.look_at((-120, 110, 120), (0, 0, 170)),
            cam_mod.look_at((60, 140, 250), (0, 0, 170))][:args.views]

    spec = engine.IntegratorSpec(max_bounces=8)
    ids = jnp.arange(W * H, dtype=jnp.int32)

    def render(scene, camera, seed, spp):
        if args.backend == "kernel":
            from vpt.kernels.wavefront import build_tile_renderer
            run = build_tile_renderer(scene, camera, W, H, spp,
                                      max_bounces=8, sampler="ld")
            return np.asarray(run(seed)).reshape(H, W, 3)
        key = jax.random.PRNGKey(seed)

        def one(acc, s):
            ks = jax.random.fold_in(key, s)
            o, d = cam_mod.rays_for_pixels(camera, W, H, ids, ks, True)
            return acc + engine.trace(scene, spec, o, d, ks), None

        acc, _ = jax.lax.scan(one, jnp.zeros((W * H, 3)), jnp.arange(spp))
        return np.asarray(acc / spp).reshape(H, W, 3)

    print(f"rendering {len(cams)} target views "
          f"({W}x{H}x{args.target_spp}spp, truth grid {n}^3)...")
    truth_scene = with_field(vals_true)
    targets = [render(truth_scene, c, 100 + i, args.target_spp)
               for i, c in enumerate(cams)]

    init = np.full((n, n, n), args.init, np.float32)
    if args.lr_decay != 1.0:
        import optax
        lr = optax.exponential_decay(args.lr, args.steps, args.lr_decay)
    else:
        lr = args.lr
    polyak_from = (args.steps - int(args.polyak * args.steps)
                   if args.polyak > 0 else 0)
    print(f"fitting: {args.steps} steps, {args.spp}spp/render, "
          f"lr={args.lr} decay={args.lr_decay} polyak_from={polyak_from}")
    t0 = time.time()
    rec, losses = fit_grid(with_field(init), cams, targets,
                           steps=args.steps, spp=args.spp,
                           learning_rate=lr, max_bounces=8, seed=7,
                           backend=args.backend, reg_l1=args.reg_l1,
                           reg_tv=args.reg_tv, distance=args.distance,
                           polyak_from=polyak_from,
                           log_every=max(args.steps // 10, 1))
    dt = time.time() - t0

    rec = np.asarray(rec)
    mae0 = np.abs(init - vals_true).mean()
    mae1 = np.abs(rec - vals_true).mean()
    corr = np.corrcoef(rec.ravel(), vals_true.ravel())[0, 1]
    print(f"{dt:.1f}s  loss {losses[0]:.4g} -> {np.mean(losses[-5:]):.4g}")
    print(f"voxel MAE {mae0:.4f} -> {mae1:.4f}  "
          f"corr(recovered, truth) = {corr:.3f}")


if __name__ == "__main__":
    main()
