"""Command-line driver.

Replaces the reference's `main` (src/rt.cpp:744-830). Compatible minimal
form mirrors `./rt <spp>`: render the active scene at 1024x768 with the
active integrator and write `image.ppm`, printing the elapsed wall clock
(src/rt.cpp:824-827). Everything the reference hardcodes (resolution
src/rt.cpp:752, camera :755-759, sigma :794, scene Sphere.cpp:7-23,
integrator :791-796) is a flag here.

Usage:
  python -m vpt.cli 64                       # reference-style: spp only
  python -m vpt.cli --spp 64 --width 512 --height 512 \
      --integrator explicit_equiangular --scene simple_cornell -o out.ppm
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vpt", description=__doc__)
    p.add_argument("spp_pos", nargs="?", type=int, default=None,
                   help="samples per pixel (positional, reference-style argv[1])")
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--width", type=int, default=1024)    # src/rt.cpp:752
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--integrator", default="explicit_free")
    p.add_argument("--scene", default="cornell_vpt")
    p.add_argument("--scene-file", default=None,
                   help="JSON scene file (vpt.scene.io) — overrides --scene; "
                        "uses the file's camera/sigma unless flags are given")
    p.add_argument("--dump-scene", default=None, metavar="FILE",
                   help="write the resolved scene + camera as JSON and exit")
    # None sentinels: an unset flag defers to the scene's own medium
    # (reference defaults 0.001/0.009 for every built-in scene, src/rt.cpp:794)
    p.add_argument("--sigma-a", type=float, default=None)
    p.add_argument("--sigma-s", type=float, default=None)
    p.add_argument("--hg-g", type=float, default=None, metavar="G",
                   help="Henyey-Greenstein anisotropy in (-1,1); default 0 "
                        "(isotropic, the reference's only behavior). "
                        "Supported by the engine renderers and the fused "
                        "render kernel (g is baked at kernel-build time)")
    p.add_argument("--max-bounces", type=int, default=32)
    p.add_argument("--continue-prob", type=float, default=0.6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk-pixels", type=int, default=65536)
    p.add_argument("--no-jitter", action="store_true")
    p.add_argument("--renderer", default="auto",
                   choices=["auto", "pallas", "persistent", "scan"])
    p.add_argument("--sampler", default="random", choices=["random", "ld"],
                   help="ld: low-discrepancy first-5-dim stratification "
                        "(unbiased, lower MSE, faster; pallas renderer)")
    p.add_argument("--target-noise", type=float, default=None, metavar="SE",
                   help="render batches of --spp until the median per-pixel "
                        "relative standard error reaches SE (vpt.render_to_noise)")
    p.add_argument("--max-spp", type=int, default=4096,
                   help="total spp cap for --target-noise")
    p.add_argument("--adaptive", action="store_true",
                   help="two-pass variance-guided adaptive sampling "
                        "(fused-kernel integrators; spp must be even)")
    p.add_argument("--adaptive-boost", type=float, default=3.0,
                   help="extra samples on hot tiles = boost*spp/2")
    p.add_argument("--adaptive-frac", type=float, default=0.25,
                   help="fraction of tiles that get the boost pass")
    p.add_argument("-o", "--output", default="image.ppm")
    p.add_argument("--sharded", action="store_true",
                   help="render over all local devices via the (data,sample) mesh")
    p.add_argument("--checkpoint", default=None,
                   help="progressive accumulation checkpoint path (resume if exists)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="save the accumulator every N spp (0 = only at end)")
    p.add_argument("--preview", default=None,
                   help="write a tonemapped preview image (.png or .ppm) of "
                        "the running mean while a --checkpoint render runs")
    p.add_argument("--preview-every", type=int, default=0,
                   help="refresh the preview every N completed spp")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.spp_pos is not None:
        args.spp = args.spp_pos

    import vpt
    from vpt.io.ppm import write_ppm
    from vpt.scene.scene import SCENES

    if args.scene_file:
        scene, file_cam = vpt.load_scene(args.scene_file)
    else:
        scene, file_cam = SCENES[args.scene](), None
    import dataclasses as _dc
    from vpt.scene.scene import Medium
    import jax.numpy as jnp
    sigma_a = (args.sigma_a if args.sigma_a is not None
               else float(scene.medium.sigma_a))
    sigma_s = (args.sigma_s if args.sigma_s is not None
               else float(scene.medium.sigma_s))
    g = args.hg_g if args.hg_g is not None else float(
        jnp.asarray(scene.medium.g))
    scene = _dc.replace(
        scene,
        medium=Medium(jnp.asarray(sigma_a, scene.radius.dtype),
                      jnp.asarray(sigma_s, scene.radius.dtype),
                      jnp.asarray(g, scene.radius.dtype),
                      scene.medium.density),
    )
    camera = file_cam if file_cam is not None else vpt.default_camera()
    if args.dump_scene:
        vpt.save_scene(args.dump_scene, scene, camera)
        print(f"wrote {args.dump_scene}")
        return 0
    cfg = vpt.RenderConfig(
        width=args.width, height=args.height, spp=args.spp,
        integrator=args.integrator, max_bounces=args.max_bounces,
        continue_prob=args.continue_prob, seed=args.seed,
        chunk_pixels=args.chunk_pixels, jitter=not args.no_jitter,
        renderer=args.renderer, sampler=args.sampler,
    )

    t0 = time.time()
    effective_spp = args.spp          # --target-noise overrides with actual
    if args.checkpoint:
        from vpt.utils.checkpoint import render_progressive
        img = render_progressive(
            scene, camera, cfg, args.checkpoint,
            checkpoint_every=args.checkpoint_every,
            preview_path=args.preview, preview_every=args.preview_every,
        )
    elif args.sharded:
        from vpt.dist import make_mesh, render_sharded
        img = np.asarray(render_sharded(scene, camera, cfg, make_mesh()))
    elif args.target_noise is not None:
        import jax
        img, spp_used, achieved = vpt.render_to_noise(
            scene, camera, cfg, target_rel_se=args.target_noise,
            max_spp=args.max_spp, log=print,
            interpret=jax.default_backend() not in ("tpu", "axon"))
        img = np.asarray(img)
        effective_spp = spp_used
        print(f"render_to_noise: stopped at {spp_used} spp "
              f"(median rel SE {achieved:.4f})")
    elif args.adaptive:
        import jax
        img = np.asarray(vpt.render_adaptive(
            scene, camera, cfg, boost=args.adaptive_boost,
            frac=args.adaptive_frac,
            # Mosaic kernels need real TPU hardware; interpret elsewhere
            interpret=jax.default_backend() not in ("tpu", "axon")))
    else:
        img = np.asarray(vpt.render(scene, camera, cfg))
    elapsed = time.time() - t0

    write_ppm(args.output, img)
    n_paths = args.width * args.height * effective_spp
    # reference prints "elapsed time: <s>s" (src/rt.cpp:824-827)
    print(f"elapsed time: {elapsed:.5g}s  "
          f"({n_paths / max(elapsed, 1e-9):.3e} paths/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
