"""Recover the camera pose (origin + fov) from one image with
boundary-aware CRN finite differences. Camera motion in an enclosed scene
sweeps every silhouette across pixels — pathwise AD diverges on this
problem; FD converges (BASELINE.md "Boundary terms" table).

    python examples/recover_camera.py           # TPU, ~15s
    python examples/recover_camera.py --cpu     # pipeline smoke (~30s):
        camera recovery genuinely needs the TPU-sized sample budget
        (100 steps @ 64spp); the CPU mode just exercises the step.
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

    import jax.numpy as jnp
    import numpy as np
    import optax
    import vpt
    from vpt.dist import make_fd_geom_train_step
    from vpt.kernels.geom import pack_theta
    from vpt.kernels.wavefront import build_tile_renderer

    interp = args.cpu
    W, H, spp_t, spp, steps = ((40, 30, 16, 4, 4) if args.cpu
                               else (64, 48, 128, 64, 100))
    off = np.asarray(([1.5, -1.0, 2.0] if args.cpu else [4.0, -3.0, 6.0]),
                     np.float32)

    scene = vpt.cornell_vpt()
    cam0 = vpt.default_camera()
    target = np.asarray(
        build_tile_renderer(scene, cam0, W, H, spp_t, max_bounces=16,
                            interpret=interp)(99)).reshape(-1, 3)
    cam_w = dataclasses.replace(cam0, origin=cam0.origin + off,
                                fov_scale=cam0.fov_scale * 1.04)

    # per-block Adam rates: fov_scale is ~0.51 — unit-rate Adam destroys it
    opt = optax.multi_transform(
        {"pos": optax.adam(optax.exponential_decay(0.5, 15, 0.75)),
         "fov": optax.adam(optax.exponential_decay(0.004, 15, 0.75))},
        {"center": "pos", "cam_origin": "pos", "fov": "fov",
         "sigma_a": "pos", "sigma_s": "pos"})
    step = make_fd_geom_train_step(scene, cam_w, W, H, spp, opt,
                                   sphere=None, cam_grads=True,
                                   max_bounces=16, interpret=interp)
    theta = pack_theta(scene, cam_w, None)
    st = opt.init(theta)
    t0 = time.time()
    for i in range(steps):
        theta, st, loss = step(theta, st, jnp.asarray(target),
                               jnp.int32(3 + i))
    ro = np.asarray(theta["cam_origin"]) - np.asarray(cam0.origin)
    rf = float(theta["fov"]) - float(cam0.fov_scale)
    if args.cpu:
        print(f"smoke ok: {steps} FD steps ran, loss {float(loss):.4g}, "
              f"origin moved {np.linalg.norm(np.asarray(theta['cam_origin']) - np.asarray(cam_w.origin)):.3f} "
              f"in {time.time()-t0:.1f}s (convergence demo needs TPU sizes)")
    else:
        print(f"origin residual {np.linalg.norm(ro):.3f} (started "
              f"{np.linalg.norm(off):.3f}), fov residual {rf:+.5f} "
              f"(started {float(cam_w.fov_scale) - float(cam0.fov_scale):+.5f}) "
              f"in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
