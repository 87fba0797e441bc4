"""Round-5: close the round-4 multi-view degeneracy claim with data.

The round-4 study (BASELINE.md "Multi-view fog recovery") recovered the
HG sign with one reverse view but left the PROFILE-AMPLITUDE trade open:
a flatter falloff (k 0.024 vs truth 0.06) with ~2.6x sigma_s reproduced
every tested sightline, and the writeup CLAIMED breaking it "needs
profile-resolving geometry (top-down views) or a known coefficient
scale" — untested. This study adds that row: the same 4-view winner
protocol plus a 5th camera, either TOP-DOWN (rays integrate the full
exp_height profile vertically) or LOW-HORIZONTAL (each image row samples
one height — direct profile readout), and reports where (k, sigma_s)
land. Either outcome is the result.

Run: python tools/studies/fog_topdown_study.py [four|topdown|lowhoriz]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp
import optax

from vpt.kernels.diff import make_diff_renderer, pack_params
from vpt.kernels.wavefront import build_tile_renderer
from vpt.media.density import exp_height
from vpt.scene.scene import foggy_cornell
from vpt.scene.camera import look_at, default_camera

base = foggy_cornell()
base = dataclasses.replace(base,
                           medium=dataclasses.replace(base.medium, g=0.5))
W = H = 192
TSPP = 4096
SPP = 32
STEPS = 2000

FRONTAL = [
    default_camera(),
    look_at((35.0, 30.0, 180.0), (0.0, -10.0, 0.0)),
    look_at((-38.0, -20.0, 150.0), (10.0, 0.0, -40.0)),
]
REVERSE = look_at((0.0, 25.0, 60.0), (0.0, -10.0, 200.0))
# 5th views: inside the box (x in [-50, 50], y in [-41, 41], z < 215)
TOPDOWN = look_at((0.0, 38.0, 120.0), (0.0, -40.0, 118.0))
LOWHORIZ = look_at((-45.0, -30.0, 170.0), (45.0, -20.0, 60.0))


def run(tag, cams):
    print(f"=== {tag}: {len(cams)} views", flush=True)
    targets = []
    for c in cams:
        t = np.asarray(build_tile_renderer(
            base, c, W, H, TSPP, max_bounces=32, tile_rows=32,
            sampler="ld")(123)).reshape(-1, 3)
        targets.append(jnp.asarray(t))
    wrong = dataclasses.replace(
        base, medium=dataclasses.replace(
            base.medium, sigma_a=0.010, sigma_s=0.020, g=0.0,
            density=exp_height(k=0.12, y0=-40.8, majorant=1.01)))
    renders = [make_diff_renderer(wrong, c, W, H, SPP // 2, max_bounces=32,
                                  tile_rows=32, sampler="ld", diff_g=True,
                                  diff_field=True) for c in cams]
    params = pack_params(wrong, with_g=True, with_field=True)
    init = dict(params)

    def to_opt(p):
        q = dict(p)
        for k in ("sigma_a", "sigma_s", "fog_k"):
            q[k] = jnp.log(jnp.maximum(p[k], 1e-8))
        return q

    def from_opt(q):
        p = dict(q)
        for k in ("sigma_a", "sigma_s", "fog_k"):
            p[k] = jnp.exp(q[k])
        return p

    qp = to_opt(params)
    opt = optax.adam(optax.exponential_decay(2.5e-3, 200, 0.9))
    state = opt.init(qp)
    weights = [1.0 / (jnp.mean(t, axis=-1, keepdims=True) + 0.05) ** 2
               for t in targets]

    @jax.jit
    def step(qp, state, seed):
        def loss_fn(q):
            p = from_opt(q)
            tot = 0.0
            for r, t, w in zip(renders, targets, weights):
                a = r(p, seed * 2)
                b = r(p, seed * 2 + 1)
                tot = tot + jnp.mean(w * (a - t) * (b - t))
            return tot / len(renders)

        loss, g = jax.value_and_grad(loss_fn)(qp)
        upd, state = opt.update(g, state, qp)
        qp = optax.apply_updates(qp, upd)
        qp["g"] = jnp.clip(qp["g"], -0.95, 0.95)
        return qp, state, loss

    t0 = time.time()
    tail = []
    for i in range(STEPS):
        qp, state, loss = step(qp, state, jnp.int32(100 + i))
        for k in ("albedo", "radiance"):
            qp[k] = init[k]
        if i >= STEPS - 200:
            cur = from_opt(qp)
            tail.append([float(cur["sigma_a"]), float(cur["sigma_s"]),
                         float(cur["g"]), float(cur["fog_k"])])
        if i % 400 == 0:
            cur = from_opt(qp)
            print("  step %4d loss %.4f sa=%.5f ss=%.5f g=%.3f k=%.4f"
                  % (i, float(loss), float(cur["sigma_a"]),
                     float(cur["sigma_s"]), float(cur["g"]),
                     float(cur["fog_k"])), flush=True)
    m = np.mean(tail, axis=0)
    print("%s FINAL tail (true sa=0.004 ss=0.036 g=0.5 k=0.06): "
          "sa=%.5f ss=%.5f g=%.3f k=%.4f  %.0fs"
          % (tag, m[0], m[1], m[2], m[3], time.time() - t0), flush=True)
    return m


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("four", "all"):
        run("four_view_baseline", FRONTAL + [REVERSE])
    if which in ("topdown", "all"):
        run("plus_topdown", FRONTAL + [REVERSE, TOPDOWN])
    if which in ("lowhoriz", "all"):
        run("plus_lowhoriz", FRONTAL + [REVERSE, LOWHORIZ])
