"""Empirical v5e VPU ceilings via in-register Pallas loops (BASELINE.md
"Kernel roofline": replaces the analytic 3.85 T op/s figure with measured
numbers).

Each kernel holds a (32, 128) f32 tile set in VMEM/registers and runs a
jax.lax.fori_loop of pure vector arithmetic with NCHAIN independent
accumulator chains (enough ILP to cover FMA latency); no HBM traffic inside
the loop, so the measured rate is the issue ceiling for that op mix.
MEASUREMENT RULES (learned the hard way, .scratch/vpu_sweep*.log): the
per-call dispatch+tunnel overhead is ~5-30 ms, so each timed call must run
>=300 ms of loop or the rate is overhead, not hardware; and (32, 128)
tiles (4 vregs/op) pipeline ~2.8x better than single-vreg (8, 128) ops —
exactly the quantity the fused render kernel's 'vector primitives per
lane-iteration' census should be divided by.

Run ON TPU:  python tools/vpu_microbench.py
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, NCHAIN, UNROLL = 32, 16, 16
    LANES = R * 128

    def make_bench(body_ops, iters, name):
        """body_ops(xs) -> xs' applies one op per chain per call; the loop
        body unrolls UNROLL rounds so the fori_loop branch/counter overhead
        (~tens of cycles) is amortized over NCHAIN*UNROLL vector
        instructions."""

        def kernel(seed_ref, out_ref):
            s0 = seed_ref[0].astype(jnp.float32) * 1e-6
            xs = tuple(
                jnp.full((R, 128), 0.1, jnp.float32) + s0 * (k + 1)
                for k in range(NCHAIN)
            )

            def step(i, xs):
                for _ in range(UNROLL):
                    xs = body_ops(xs)
                return xs

            xs = jax.lax.fori_loop(0, iters, step, xs)
            acc = xs[0]
            for x in xs[1:]:
                acc = acc + x
            out_ref[:] = acc

        @jax.jit
        def run(seed):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )(jnp.reshape(seed, (1,)).astype(jnp.int32))

        def timed(n=5):
            np.asarray(run(jnp.int32(0)))
            best = 1e9
            for i in range(n):
                t0 = time.time()
                np.asarray(run(jnp.int32(1 + i)))
                best = min(best, time.time() - t0)
            # ops = iters * UNROLL * NCHAIN vector ops over LANES lanes
            return iters * UNROLL * NCHAIN * LANES / best

        return name, timed

    benches = [
        make_bench(lambda xs: tuple(x * 1.000001 + 0.25 for x in xs),
                   400_000, "fma (mul+add fused eqn)"),
        make_bench(lambda xs: tuple(x + 0.25 for x in xs),
                   400_000, "add"),
        make_bench(lambda xs: tuple(jnp.exp(x * -0.9) for x in xs),
                   50_000, "exp(mul) chain"),
        make_bench(lambda xs: tuple(jax.lax.rsqrt(x + 1.0) for x in xs),
                   50_000, "rsqrt(add) chain"),
        make_bench(lambda xs: tuple(jnp.where(x > 0.5, x * 0.5, x + 0.125)
                                    for x in xs),
                   200_000, "compare+select+arith"),
    ]
    print(f"v5e VPU in-register ceilings ({NCHAIN} chains x {LANES} lanes):")
    for name, timed in benches:
        rate = timed()
        print(f"  {name:<26s} {rate / 1e12:6.2f} T lane-ops/s")


if __name__ == "__main__":
    main()
