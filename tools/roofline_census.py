"""Kernel roofline census (BASELINE.md "Kernel roofline"): count the vector
primitives in ONE persistent-loop iteration of the fused kernel and relate
measured paths/s to the v5e ALU-issue ceiling.

Run on CPU (the census only traces; nothing executes):
  python tools/roofline_census.py
"""
import sys
from collections import Counter

sys.path.insert(0, ".")


def main():
    import os
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import vpt
    from vpt.kernels.wavefront import build_tile_renderer

    scene = vpt.cornell_vpt()
    cam = vpt.default_camera()
    run = build_tile_renderer(scene, cam, 1024, 1024, 64, nee=True,
                              max_bounces=32, tile_rows=32)
    jaxpr = jax.make_jaxpr(lambda s: run(s))(jnp.int32(0))

    def find_eqns(jx, name):
        out = []
        for eqn in jx.eqns:
            if eqn.primitive.name == name:
                out.append(eqn)
            for v in eqn.params.values():
                for sub in (v if isinstance(v, (list, tuple)) else [v]):
                    if hasattr(sub, "eqns"):
                        out += find_eqns(sub, name)
                    elif hasattr(sub, "jaxpr"):
                        out += find_eqns(sub.jaxpr, name)
        return out

    kj = find_eqns(jaxpr.jaxpr, "pallas_call")[0].params["jaxpr"]
    body = find_eqns(kj if hasattr(kj, "eqns") else kj.jaxpr,
                     "while")[0].params["body_jaxpr"].jaxpr
    hist = Counter(e.primitive.name for e in body.eqns)
    total = sum(hist.values())
    trans = sum(v for k, v in hist.items()
                if k in {"exp", "log", "log1p", "sin", "cos"})
    roots = sum(v for k, v in hist.items() if k in {"sqrt", "rsqrt"})
    print(f"while-body vector eqns/lane-iteration: {total} "
          f"(exp/log/sin/cos: {trans}, sqrt/rsqrt: {roots})")
    print("top primitives:", hist.most_common(16))
    # v5e ALU-issue ceiling: 8x128 lanes x 4 ALUs x ~0.94GHz ~ 3.85T f32/s.
    # At the measured 166.6M paths/s x 2.5 mean bounces = 0.42G lane-iter/s
    # the kernel sustains >= total*0.42G vector primitives/s.
    rate = 166.6e6 * 2.5 * total
    print(f"implied >= {rate/1e12:.2f}T vector primitives/s at 166.6M paths/s"
          f" -> {rate/3.85e12*100:.0f}% of the 3.85T ALU-issue ceiling")


if __name__ == "__main__":
    main()
