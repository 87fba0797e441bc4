"""Recover the FULL camera pose (origin + look direction + fov — all
7 DOF of src/rt.cpp:755-759) from one image with boundary-aware CRN
finite differences. Camera motion in an enclosed scene sweeps every
silhouette across pixels — pathwise AD diverges on this problem; FD
converges (BASELINE.md "Boundary terms" table). Round 4 added the look
direction to the theta vector (kernels/geom.py dims 9-11) and to the
dual planes (dir_grads=True, K<=10).

    python examples/recover_camera.py           # TPU, ~30s
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

    dir_off = np.asarray(([0.004, -0.003, 0.0] if args.cpu
                          else [0.010, -0.008, 0.0]), np.float32)

    scene = vpt.cornell_vpt()
    cam0 = vpt.default_camera()
    target = np.asarray(
        build_tile_renderer(scene, cam0, W, H, spp_t, max_bounces=16,
                            interpret=interp)(99)).reshape(-1, 3)
    cam_w = dataclasses.replace(cam0, origin=cam0.origin + off,
                                direction=cam0.direction + dir_off,
                                fov_scale=cam0.fov_scale * 1.06)

    # BLOCK-COORDINATE, direction first: the joint 7-DOF fit diverges (a
    # direction error looks like a translation to the origin block — the
    # origin chases the image shift, Adam momentum runs away; measured:
    # origin 7.8 -> 15.9 joint vs 7.8 -> ~4.5 staged). Direction-only
    # converges fast (0.73 -> 0.10 deg in 30 steps), after which the
    # origin+fov block behaves like the round-2 study. Per-block Adam
    # rates: fov_scale is ~0.51 and the look direction unit-scale —
    # unit-rate Adam destroys both.
    theta = pack_theta(scene, cam_w, None)
    t0 = time.time()
    tf = jnp.asarray(target)
    rounds = 1 if args.cpu else 3
    n_dir, n_pose = (2, 2) if args.cpu else (30, 60)
    loss = None
    for r in range(rounds):
        dec = 0.7 ** r
        opt = optax.multi_transform(
            {"dir": optax.adam(optax.exponential_decay(0.002 * dec, 15,
                                                       0.75)),
             "frozen": optax.set_to_zero()},
            {"center": "frozen", "cam_origin": "frozen", "fov": "frozen",
             "sigma_a": "frozen", "sigma_s": "frozen", "cam_dir": "dir"})
        step = make_fd_geom_train_step(scene, cam_w, W, H, spp, opt,
                                       sphere=None, cam_grads=False,
                                       dir_grads=True,
                                       max_bounces=16, interpret=interp)
        st = opt.init(theta)
        for i in range(n_dir):
            theta, st, loss = step(theta, st, tf, jnp.int32(1000 * r + i))
        opt2 = optax.multi_transform(
            {"pos": optax.adam(optax.exponential_decay(0.5 * dec, 15,
                                                       0.75)),
             "fov": optax.adam(optax.exponential_decay(0.004 * dec, 15,
                                                       0.75)),
             "frozen": optax.set_to_zero()},
            {"center": "frozen", "cam_origin": "pos", "fov": "fov",
             "sigma_a": "frozen", "sigma_s": "frozen",
             "cam_dir": "frozen"})
        step2 = make_fd_geom_train_step(scene, cam_w, W, H, spp, opt2,
                                        sphere=None, cam_grads=True,
                                        max_bounces=16, interpret=interp)
        st2 = opt2.init(theta)
        for i in range(n_pose):
            theta, st2, loss = step2(theta, st2, tf,
                                     jnp.int32(5000 * r + 17 + i))

    def dir_angle(d):
        d = np.asarray(d, np.float64)
        d0 = np.asarray(cam0.direction, np.float64)
        c = np.dot(d / np.linalg.norm(d), d0 / np.linalg.norm(d0))
        return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))

    ro = np.asarray(theta["cam_origin"]) - np.asarray(cam0.origin)
    rf = float(theta["fov"]) - float(cam0.fov_scale)
    if args.cpu:
        steps = rounds * (n_dir + n_pose)
        print(f"smoke ok: {steps} FD steps ran, loss {float(loss):.4g}, "
              f"origin moved {np.linalg.norm(np.asarray(theta['cam_origin']) - np.asarray(cam_w.origin)):.3f} "
              f"in {time.time()-t0:.1f}s (convergence demo needs TPU sizes)")
    else:
        print(f"origin residual {np.linalg.norm(ro):.3f} (started "
              f"{np.linalg.norm(off):.3f}), fov residual {rf:+.5f} "
              f"(started {float(cam_w.fov_scale) - float(cam0.fov_scale):+.5f}), "
              f"direction residual {dir_angle(theta['cam_dir']):.4f} deg "
              f"(started {dir_angle(cam_w.direction):.4f} deg) "
              f"in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
