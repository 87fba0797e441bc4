"""Recover the medium coefficients (the reference's estimation task,
src/rt.cpp:794) from one rendered image, at fused-kernel speed.

    python examples/recover_sigma.py            # TPU, ~40s
    python examples/recover_sigma.py --cpu      # tiny CPU check (~min)
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode CPU run at toy size")
    ap.add_argument("--steps", type=int, default=None)
    args = ap.parse_args()
    if args.cpu:
        import os
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import vpt
    from vpt.kernels.wavefront import build_tile_renderer

    interp = args.cpu
    W, H, spp_t, spp, steps = ((48, 32, 64, 8, 30) if args.cpu
                               else (256, 256, 512, 32, 200))
    if args.steps:
        steps = args.steps

    scene = vpt.cornell_vpt()          # truth: sigma_a=0.001 sigma_s=0.009
    cam = vpt.default_camera()
    target = np.asarray(
        build_tile_renderer(scene, cam, W, H, spp_t, max_bounces=16,
                            interpret=interp)(99)).reshape(H, W, 3)

    wrong = dataclasses.replace(
        scene, medium=dataclasses.replace(
            scene.medium, sigma_s=scene.medium.sigma_s * 2.78))
    t0 = time.time()
    params, losses = vpt.dist.fit_kernel(
        wrong, cam, target, steps=steps, spp=spp, learning_rate=1.5e-3,
        max_bounces=16, interpret=interp, log_every=max(steps // 10, 1))
    print(f"sigma_s: start {float(wrong.medium.sigma_s):.5f} "
          f"true {float(scene.medium.sigma_s):.5f} "
          f"recovered {float(params['sigma_s']):.5f} "
          f"in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
