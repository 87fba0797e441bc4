"""Localize an area light from one image with boundary-aware CRN finite
differences — the pathwise estimators provably cannot do this (the
emitter's visible disk is pure boundary term; see docs/INVERSE_RENDERING.md).

    python examples/localize_light.py           # TPU, ~10s
    python examples/localize_light.py --cpu     # tiny CPU check
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import optax
    import vpt
    from vpt.kernels.wavefront import build_tile_renderer

    interp = args.cpu
    W, H, spp_t, spp, steps = ((48, 36, 48, 16, 44) if args.cpu
                               else (64, 48, 128, 64, 80))
    offset = 5.0 if args.cpu else 8.0

    # one area light glowing in an open medium
    scene = vpt.make_scene(
        [(2.0, (0.0, 0.0, -50.0), (0, 0, 0), (60.0, 50.0, 40.0), 0,
          (0, 0, 0), (0, 0, 0), 0.0)],
        sigma_a=0.002, sigma_s=0.015)
    cam = vpt.default_camera()
    target = np.asarray(
        build_tile_renderer(scene, cam, W, H, spp_t, max_bounces=16,
                            interpret=interp)(99)).reshape(H, W, 3)
    true_y = float(scene.center[0, 1])
    wrong = dataclasses.replace(
        scene, center=scene.center.at[0, 1].set(true_y + offset))

    t0 = time.time()
    lr = (optax.exponential_decay(0.7, 8, 0.65) if args.cpu
          else optax.exponential_decay(0.8, 12, 0.75))
    theta, losses = vpt.dist.fit_geom_fd(
        wrong, cam, target, sphere=0, cam_grads=False, steps=steps, spp=spp,
        learning_rate=lr,
        max_bounces=16, seed=3, interpret=interp,
        log_every=max(steps // 8, 1))
    got = float(theta["center"][1])
    print(f"light y: start {true_y + offset:.2f} true {true_y:.2f} "
          f"recovered {got:.3f} in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
