"""Multi-view joint medium recovery: (sigma_a, sigma_s, g, fog_k) of a
Henyey-Greenstein ground-fog scene from V camera views.

Single-view fog estimation is weakly identifiable — similarity theory ties
appearance to sigma_s(1-g) and the density profile jointly, and the round-3
single-view joint study plateaued well off-truth (BASELINE.md round-3
notes). This demo adds VIEWS, not estimator machinery:
`vpt.dist.fit_multiview` runs one differentiable fused pair per camera
(kernels/diff.py custom VJP; diff_g + diff_field trace the anisotropy and
the exp_height falloff) and averages the A/B-MSE losses. Defaults carry
the study's two stability lessons: LOG-space medium block (Adam steps
become multiplicative — no thick-fog blow-up) and target-relMSE pixel
weights (direct-emitter pixels otherwise dominate every early step).

The multi-view fit tightens the loss dramatically but the (g, sigma_s)
similarity basin is real physics, not an estimator bug: expect accurate
appearance long before pointwise parameter truth. Gradients themselves are
FD-validated (tests/test_hg.py, tests/test_diff_kernel.py).

    python examples/recover_fog_multiview.py            # TPU, full size
    python examples/recover_fog_multiview.py --cpu      # tiny smoke
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="tiny interpret-mode pipeline smoke")
    ap.add_argument("--steps", type=int, default=2400)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--size", type=int, default=192)
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    import vpt
    from vpt.dist import fit_multiview
    from vpt.kernels.wavefront import build_tile_renderer
    from vpt.media.density import exp_height
    from vpt.scene.camera import look_at
    from vpt.scene.scene import foggy_cornell

    interpret = args.cpu
    W = H = (24 if args.cpu else args.size)
    steps = 6 if args.cpu else args.steps
    spp = 4 if args.cpu else args.spp
    tspp = 32 if args.cpu else 4096
    mb = 8 if args.cpu else 32
    tr = 8 if args.cpu else 32

    true_scene = foggy_cornell()
    true_scene = dataclasses.replace(
        true_scene, medium=dataclasses.replace(true_scene.medium, g=0.5))
    # the 4th REVERSE view is what identifies the HG sign: all-frontal
    # cameras measured an appearance-perfect g=-0.46 basin at g=+0.5
    # truth; looking back along the dominant light paths separates
    # forward from backward scattering (BASELINE.md round-4 multi-view
    # study: g recovered to 0.44 with it). The (sigma, fog_k)
    # profile-amplitude trade survives even 4 views.
    cams = [
        vpt.default_camera(),
        look_at((35.0, 30.0, 180.0), (0.0, -10.0, 0.0)),
        look_at((-38.0, -20.0, 150.0), (10.0, 0.0, -40.0)),
        look_at((0.0, 25.0, 60.0), (0.0, -10.0, 200.0)),
    ]

    print(f"rendering {len(cams)} targets ({W}x{H} @ {tspp} spp)...",
          flush=True)
    targets = [
        np.asarray(build_tile_renderer(
            true_scene, c, W, H, tspp, max_bounces=mb, tile_rows=tr,
            sampler="ld", interpret=interpret)(123)).reshape(H, W, 3) / tspp
        for c in cams
    ]

    wrong = dataclasses.replace(
        true_scene, medium=dataclasses.replace(
            true_scene.medium, sigma_a=0.010, sigma_s=0.020, g=0.0,
            density=exp_height(k=0.12, y0=-40.8, majorant=1.01)))

    def freeze_materials(p, p0):
        out = dict(p)
        for k in ("albedo", "radiance"):
            out[k] = p0[k]
        return out

    t0 = time.time()
    params, losses = fit_multiview(
        wrong, cams, targets, steps=steps, spp=spp,
        learning_rate=2.5e-3, max_bounces=mb, sampler="ld",
        diff_g=True, diff_field=True, interpret=interpret,
        param_filter=freeze_materials, polyak_tail=max(steps // 8, 1),
        log_every=max(steps // 12, 1))
    m = true_scene.medium
    print(f"\ntruth:     sa={float(m.sigma_a):.5f} ss={float(m.sigma_s):.5f}"
          f" g={float(m.g):.3f} k={float(m.density.params[0]):.4f}")
    print(f"recovered: sa={float(params['sigma_a']):.5f}"
          f" ss={float(params['sigma_s']):.5f}"
          f" g={float(params['g']):.3f} k={float(params['fog_k']):.4f}")
    print(f"loss {losses[0]:.4g} -> {losses[-1]:.4g}"
          f" in {time.time() - t0:.1f}s ({steps} steps)")


if __name__ == "__main__":
    main()
