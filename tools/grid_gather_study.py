"""Measure per-lane table-lookup strategies inside a Pallas TPU kernel.

The voxel-grid density field needs, per (R,128) lane block, an arbitrary
gather g[idx[r,c]] from a T-entry table. TPU vregs are (8,128); Mosaic's
dynamic_gather works within one vreg, so every strategy decomposes T into
128-lane chunks:

  A. lane-gather chunks: for each chunk j, broadcast row j to sublanes and
     take_along_axis(tab_j, idx_lo, axis=1) where idx_hi == j selects.
  B. select-accumulate: sum_j where(idx == j*128 + iota, g) — pure VPU
     compare/select, no gather op.
  C. one-hot MXU: build onehot (R*128, T) bf16 and matmul against g —
     requires a (R,128)->(R*128,1) relayout; measured for the record.

Run on the real chip: python tools/grid_gather_study.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8
ITERS = 4096


def timeit(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 10


def bench_lane_gather(T):
    """Strategy A: chunked lane gather (take_along_axis axis=1)."""
    C = T // 128

    def kern(tab_ref, idx_ref, out_ref):
        idx = idx_ref[...]
        acc = jnp.zeros((R, 128), jnp.float32)

        def body(i, carry):
            acc, ix = carry
            hi = ix // 128
            lo = ix % 128
            r = jnp.zeros((R, 128), jnp.float32)
            for j in range(C):
                row = tab_ref[j, :].reshape(1, 128)
                tab_b = jnp.broadcast_to(row, (R, 128))
                g = jnp.take_along_axis(tab_b, lo, axis=1)
                r = jnp.where(hi == j, g, r)
            ix = (ix * 1664525 + 1013904223) & (T - 1)
            return acc + r, ix

        acc, _ = jax.lax.fori_loop(0, ITERS, body, (acc, idx))
        out_ref[...] = acc

    tab = jnp.asarray(np.random.default_rng(0).standard_normal((C, 128)),
                      jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, T, (R, 128)),
                      jnp.int32)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)))
    dt = timeit(f, tab, idx)
    per_lookup = dt / ITERS
    print(f"A lane-gather   T={T:6d}: {dt*1e3:8.3f} ms/call "
          f"{per_lookup*1e9:8.1f} ns/lookup(1024 lanes) "
          f"{R*128*ITERS/dt/1e9:6.2f} Glookups/s")
    return per_lookup


def bench_select_acc(T):
    """Strategy B: pure compare/select accumulate."""
    C = T // 128

    def kern(tab_ref, idx_ref, out_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        idx = idx_ref[...]
        acc = jnp.zeros((R, 128), jnp.float32)

        def body(i, carry):
            acc, ix = carry
            hi = ix // 128
            lo = ix % 128
            r = jnp.zeros((R, 128), jnp.float32)
            for j in range(C):
                row = tab_ref[j, :].reshape(1, 128)
                tab_b = jnp.broadcast_to(row, (R, 128))
                # no gather: 128-way rotate-free select only matches when
                # lo == col, so sum over matches via masked max — this is
                # NOT a full lookup (only matches aligned entries); kept to
                # measure the per-chunk op cost floor
                r = r + jnp.where((hi == j) & (lo == col), tab_b, 0.0)
            ix = (ix * 1664525 + 1013904223) & (T - 1)
            return acc + r, ix

        acc, _ = jax.lax.fori_loop(0, ITERS, body, (acc, idx))
        out_ref[...] = acc

    tab = jnp.asarray(np.random.default_rng(0).standard_normal((C, 128)),
                      jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, T, (R, 128)),
                      jnp.int32)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)))
    dt = timeit(f, tab, idx)
    print(f"B sel-acc floor T={T:6d}: {dt*1e3:8.3f} ms/call "
          f"{dt/ITERS*1e9:8.1f} ns/lookup")
    return dt / ITERS


def bench_trilinear(T_side):
    """Full trilinear lookup (8 corners) via strategy A."""
    nx = ny = nz = T_side
    T = nx * ny * nz
    C = -(-T // 128)

    def kern(tab_ref, pos_ref, out_ref):
        acc = jnp.zeros((R, 128), jnp.float32)
        px = pos_ref[0]
        py = pos_ref[1]
        pz = pos_ref[2]

        def lookup_flat(ix):
            hi = ix // 128
            lo = ix % 128
            r = jnp.zeros((R, 128), jnp.float32)
            for j in range(C):
                row = tab_ref[j, :].reshape(1, 128)
                tab_b = jnp.broadcast_to(row, (R, 128))
                g = jnp.take_along_axis(tab_b, lo, axis=1)
                r = jnp.where(hi == j, g, r)
            return r

        def body(i, carry):
            acc, x, y, zc = carry
            ux = jnp.clip(x, 0.0, nx - 1.0)
            uy = jnp.clip(y, 0.0, ny - 1.0)
            uz = jnp.clip(zc, 0.0, nz - 1.0)
            ix0 = jnp.clip(ux.astype(jnp.int32), 0, nx - 2)
            iy0 = jnp.clip(uy.astype(jnp.int32), 0, ny - 2)
            iz0 = jnp.clip(uz.astype(jnp.int32), 0, nz - 2)
            fx = ux - ix0
            fy = uy - iy0
            fz = uz - iz0
            base = (ix0 * ny + iy0) * nz + iz0
            c000 = lookup_flat(base)
            c001 = lookup_flat(base + 1)
            c010 = lookup_flat(base + nz)
            c011 = lookup_flat(base + nz + 1)
            c100 = lookup_flat(base + ny * nz)
            c101 = lookup_flat(base + ny * nz + 1)
            c110 = lookup_flat(base + ny * nz + nz)
            c111 = lookup_flat(base + ny * nz + nz + 1)
            c00 = c000 * (1 - fz) + c001 * fz
            c01 = c010 * (1 - fz) + c011 * fz
            c10 = c100 * (1 - fz) + c101 * fz
            c11 = c110 * (1 - fz) + c111 * fz
            d = ((c00 * (1 - fy) + c01 * fy) * (1 - fx)
                 + (c10 * (1 - fy) + c11 * fy) * fx)
            x = (x * 1.37 + 0.61) % (nx - 1.0)
            y = (y * 1.29 + 0.43) % (ny - 1.0)
            zc = (zc * 1.53 + 0.27) % (nz - 1.0)
            return acc + d, x, y, zc

        acc, _, _, _ = jax.lax.fori_loop(
            0, ITERS, body, (acc, px, py, pz))
        out_ref[...] = acc

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((C, 128)), jnp.float32)
    pos = jnp.asarray(rng.uniform(0, T_side - 1, (3, R, 128)), jnp.float32)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)))
    dt = timeit(f, tab, pos)
    print(f"trilinear n={T_side:3d} (T={T:6d}): {dt*1e3:8.3f} ms/call "
          f"{dt/ITERS*1e6:8.2f} us/lookup "
          f"{R*128*ITERS/dt/1e6:8.1f} Mlookups/s")
    return dt / ITERS


def check_lane_gather_correct():
    """One chunked lane-gather vs numpy."""
    T = 512
    C = T // 128

    def kern(tab_ref, idx_ref, out_ref):
        ix = idx_ref[...]
        hi = ix // 128
        lo = ix % 128
        r = jnp.zeros((R, 128), jnp.float32)
        for j in range(C):
            row = tab_ref[j, :].reshape(1, 128)
            tab_b = jnp.broadcast_to(row, (R, 128))
            g = jnp.take_along_axis(tab_b, lo, axis=1)
            r = jnp.where(hi == j, g, r)
        out_ref[...] = r

    rng = np.random.default_rng(0)
    tab = rng.standard_normal((C, 128)).astype(np.float32)
    idx = rng.integers(0, T, (R, 128)).astype(np.int32)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)))
    got = np.asarray(f(jnp.asarray(tab), jnp.asarray(idx)))
    want = tab.reshape(-1)[idx]
    ok = np.allclose(got, want)
    print("correctness (compiled lane-gather vs numpy):",
          "OK" if ok else "MISMATCH")
    assert ok


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_lane_gather_correct()
    for T in (512, 1024, 4096):
        bench_lane_gather(T)
    for T in (512, 4096):
        bench_select_acc(T)
    for n in (8, 16, 32):
        bench_trilinear(n)
