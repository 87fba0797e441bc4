"""Recover a Gaussian blob cloud's SHAPE (center / radius / weight) from
one rendered image at fused-kernel speed (round 4: diff_blobs traces all
(K, 5) blob parameters through the custom-VJP pair — closed-form erf-pair
optical-depth derivatives + delta-tracking event scores,
prims.field_blob_tau_grads).

    python examples/recover_blobs.py            # TPU (~1 min)
    python examples/recover_blobs.py --cpu      # toy CPU check
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    import optax
    import vpt
    from vpt.dist.train_fast import _fit_loop, make_kernel_train_step
    from vpt.kernels.diff import pack_params
    from vpt.kernels.wavefront import build_tile_renderer
    from vpt.media import density as df
    from vpt.scene.scene import Medium

    interp = args.cpu
    W, H, spp_t, spp, steps = ((32, 24, 32, 8, 20) if args.cpu
                               else (256, 192, 256, 32, 120))
    if args.steps:
        steps = args.steps

    truth = vpt.blob_cloud() if hasattr(vpt, "blob_cloud") else None
    if truth is None:
        from vpt.scene.scene import blob_cloud
        truth = blob_cloud()
    cam = vpt.default_camera()
    t0 = time.time()
    target = np.asarray(
        build_tile_renderer(truth, cam, W, H, spp_t, max_bounces=16,
                            sampler="ld", interpret=interp)(42)
    ).reshape(H, W, 3)
    print(f"target ({W}x{H}x{spp_t}) in {time.time()-t0:.1f}s")

    # perturb blob 0: center shifted, radius inflated, weight off
    tb = np.asarray(truth.medium.density.params, np.float32)
    wrong_blobs = tb.copy()
    wrong_blobs[0, 0] += 6.0       # cx
    wrong_blobs[0, 1] -= 4.0       # cy
    wrong_blobs[0, 3] *= 1.5       # r
    wrong_blobs[0, 4] *= 0.6       # w
    wrong = dataclasses.replace(
        truth, medium=Medium(
            truth.medium.sigma_a, truth.medium.sigma_s, 0.0,
            dataclasses.replace(truth.medium.density,
                                params=jnp.asarray(wrong_blobs))))

    # per-block Adam rates: centers/radii live at scene scale (~units),
    # weights at ~0.1-1; medium/material frozen
    labels = {"sigma_a": "frozen", "sigma_s": "frozen",
              "albedo": "frozen", "radiance": "frozen", "blobs": "blob"}
    opt = optax.multi_transform(
        {"blob": optax.adam(0.15), "frozen": optax.set_to_zero()}, labels)
    step = make_kernel_train_step(wrong, cam, W, H, spp, opt,
                                  max_bounces=16, sampler="ld",
                                  diff_blobs=True, interpret=interp)
    params, losses = _fit_loop(step, pack_params(wrong, with_blobs=True),
                               opt, target, W, H, steps, seed=1,
                               param_filter=None,
                               log_every=max(steps // 8, 1))
    rec = np.asarray(params["blobs"])
    print("\nblob 0 (perturbed -> recovered vs truth):")
    for j, name in enumerate(("cx", "cy", "cz", "r", "w")):
        print(f"  {name}: {wrong_blobs[0, j]:8.3f} -> {rec[0, j]:8.3f}  "
              f"(true {tb[0, j]:8.3f})")
    d0 = np.abs(wrong_blobs[0] - tb[0])
    d1 = np.abs(rec[0] - tb[0])
    print(f"  param-error L1: {d0.sum():.3f} -> {d1.sum():.3f}  "
          f"wall {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
