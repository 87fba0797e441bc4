"""Heterogeneous inverse rendering: recover the exp_height fog falloff
rate k (and optionally sigma_s) of `foggy_cornell` from a target render.

Two paths:

  --kernel (default on TPU): the differentiable fused pair with the fog
    falloff TRACED (`make_diff_renderer(diff_field=True)`, kernels/diff.py)
    — pathwise transmittance dI/dk terms + free-flight event scores, A/B
    unbiased MSE, ~70M paths/s fwd+bwd on one v5e chip.

  engine CRN FD (default off-TPU): central differences on the XLA engine
    (the analytic-inversion sampler is reparameterized, but the
    surface/medium event probabilities' boundary terms are what CRN FD
    supplies — the same reasoning as `vpt.dist.fit_geom_fd`, BASELINE.md
    "Boundary terms"), with the round-2 study's clamped-MSE loss
    (unclamped MSE is dominated by emitter-hit speckle).

    python examples/recover_fog.py          # engine FD, any backend
    python examples/recover_fog.py --kernel # fused diff pair (TPU)
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--kernel", action="store_true",
                    help="train through the differentiable fused pair "
                         "(diff_field=True) instead of engine CRN FD")
    args = ap.parse_args()

    if args.kernel:
        return main_kernel(args)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import vpt
    from vpt.media import density as df
    from vpt.scene.scene import Medium, foggy_cornell

    base = foggy_cornell()
    K_TRUE, K_INIT = 0.06, 0.12

    def render_k(k, seed):
        field = df.DensityField(params=jnp.stack([k, jnp.float32(-40.8)]),
                                kind="exp_height", majorant=1.01)
        scene = dataclasses.replace(
            base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s,
                                0.0, field))
        cfg = vpt.RenderConfig(width=24, height=18, spp=args.spp,
                               max_bounces=10, renderer="scan", seed=0)
        img = vpt.render(scene, vpt.default_camera(), cfg,
                         key=jax.random.PRNGKey(seed))
        return jnp.clip(img, 0.0, 1.0)

    print(f"target: k={K_TRUE}; init k={K_INIT}")
    target = render_k(jnp.float32(K_TRUE), 1000)

    @jax.jit
    def fd_grad(k, seed):
        h = 0.008
        lp = jnp.mean((render_k(k + h, seed) - target) ** 2)
        lm = jnp.mean((render_k(k - h, seed) - target) ** 2)
        return (lp - lm) / (2 * h), 0.5 * (lp + lm)

    k = jnp.float32(K_INIT)
    opt = optax.adam(optax.exponential_decay(0.01, 10, 0.8))
    state = opt.init(k)
    t0 = time.time()
    tail = []
    for step in range(args.steps):
        g, loss = fd_grad(k, jnp.int32(step))
        upd, state = opt.update(g, state)
        k = jnp.clip(k + upd, 1e-4, 0.5)
        if step % 10 == 0:
            print(f"step {step:3d}  k={float(k):.4f}  loss={float(loss):.5f}")
        if step >= args.steps - 30:
            tail.append(float(k))
    k_rec = float(np.mean(tail))
    print(f"recovered k={k_rec:.4f} (true {K_TRUE}) "
          f"in {time.time() - t0:.1f}s")


def main_kernel(args):
    import dataclasses
    import time

    import jax.numpy as jnp
    import numpy as np

    import vpt
    from vpt.kernels.wavefront import build_tile_renderer
    from vpt.media.density import exp_height
    from vpt.scene.scene import foggy_cornell

    base = foggy_cornell()
    cam = vpt.default_camera()
    K_TRUE, K_INIT = 0.06, 0.12
    W = H = 128
    print(f"target: k={K_TRUE}; init k={K_INIT} (fused kernel path)")
    target = np.asarray(
        build_tile_renderer(base, cam, W, H, 256, max_bounces=32,
                            tile_rows=32, sampler="ld")(123)
    ).reshape(H, W, 3)

    wrong = dataclasses.replace(
        base, medium=dataclasses.replace(
            base.medium,
            density=exp_height(k=K_INIT, y0=-40.8, majorant=1.01)))

    def keep_only_fog(updated, initial):
        out = dict(initial)
        out["fog_k"] = updated["fog_k"]
        return out

    t0 = time.time()
    p_fit, _ = vpt.dist.fit_kernel(
        wrong, cam, jnp.asarray(target), steps=args.steps, spp=args.spp,
        learning_rate=4e-3, sampler="ld", diff_field=True,
        param_filter=keep_only_fog, log_every=10)
    print(f"recovered k={float(p_fit['fog_k']):.4f} (true {K_TRUE}) "
          f"in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
