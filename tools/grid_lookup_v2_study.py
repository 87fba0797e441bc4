"""Round-5 study: beating the C-row select-tree grid gather at n >= 24.

The round-4 voxel-grid trilinear lookup scans all C = ceil(n^3/128) packed
table rows per gather (tools/grid_gather_study.py strategy A), so forward
throughput collapses 26.9M -> 3.7M paths/s from n=16 -> 32. Information
argument: one Mosaic within-vreg gather resolves at most 128 table entries
per sublane-row, so an INCOHERENT lane batch cannot beat the C-scan — but
render-tile lanes are spatially COHERENT (camera frustum / shadow rays to
one light), so a per-call dynamic row window [min_hi, max_hi] computed by a
tile-wide reduction skips the chunks no lane needs, exactly.

Measured candidates (one v5e chip):
  A  baseline: full select-tree trilinear density (4 z-pair gathers)
  B  corner-merged tree: ONE C-loop, 4 gathers + selects share the chunk
  C  dynamic-window tree: fori_loop(min_hi, max_hi+1) over tab rows,
     under (a) coherent lanes (all in a small box) and (b) uniform lanes
  D  sublane take_along_axis(axis=0) support probe (8,128) — gather over
     table rows; if Mosaic lowers it there is an 8x denser scan

Run: python tools/grid_lookup_v2_study.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 32          # tile rows, forward-kernel default
ITERS = 512


def timeit(f, *args):
    # np.asarray forces a device->host readback: block_until_ready alone
    # does not reliably block on the experimental axon backend.
    np.asarray(f(*args))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def make_positions(n, coherent, rng):
    """Lane positions in grid units [0, n-1): coherent = a 3-voxel-thick
    slab (primary-ray-tile-like), else uniform over the grid."""
    if coherent:
        base = rng.uniform(0, n - 4, 3)
        pos = base[:, None, None] + rng.uniform(0, 3.0, (3, R, 128))
    else:
        pos = rng.uniform(0, n - 1.001, (3, R, 128))
    return jnp.asarray(pos, jnp.float32)


def _cell(pos, n):
    ux = jnp.clip(pos[0], 0.0, n - 1.0)
    uy = jnp.clip(pos[1], 0.0, n - 1.0)
    uz = jnp.clip(pos[2], 0.0, n - 1.0)
    ix = jnp.minimum(ux.astype(jnp.int32), n - 2)
    iy = jnp.minimum(uy.astype(jnp.int32), n - 2)
    iz = jnp.minimum(uz.astype(jnp.int32), n - 2)
    fx = ux - ix.astype(jnp.float32)
    fy = uy - iy.astype(jnp.float32)
    fz = uz - iz.astype(jnp.float32)
    base = (ix * n + iy) * n + iz
    return base, fx, fy, fz


def _pair_unpack(w):
    iw = jax.lax.bitcast_convert_type(w, jnp.int32)
    hi_bits = jnp.bitwise_and(iw, jnp.int32(-65536))
    lo_bits = jax.lax.shift_left(iw, jnp.int32(16))
    return (jax.lax.bitcast_convert_type(hi_bits, jnp.float32),
            jax.lax.bitcast_convert_type(lo_bits, jnp.float32))


def _trilerp(pairs, fx, fy, fz):
    (c000, c001), (c010, c011), (c100, c101), (c110, c111) = pairs
    c00 = c000 + (c001 - c000) * fz
    c01 = c010 + (c011 - c010) * fz
    c10 = c100 + (c101 - c100) * fz
    c11 = c110 + (c111 - c110) * fz
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return c0 + (c1 - c0) * fx


def _advance(pos, n, coherent):
    """Pseudo-random walk keeping the coherence class."""
    step = 0.37 if coherent else 7.13
    out = []
    for j in range(3):
        p = (pos[j] * 1.093 + step * (j + 1)) % (n - 1.001)
        out.append(p)
    return out


def bench_density(n, scheme, coherent, label):
    T = n * n * n
    C = -(-T // 128)
    C = -(-C // 8) * 8  # 8-row alignment (grid_table)

    def kern(tab_ref, pos_ref, out_ref):
        acc = jnp.zeros((R, 128), jnp.float32)
        pos0 = [pos_ref[0], pos_ref[1], pos_ref[2]]

        def density(pos):
            base, fx, fy, fz = _cell(pos, n)
            if scheme in ("E", "G"):
                # brick layout: rows are 4x4x8 voxel bricks; per-corner
                # (row, lane) from 3D coords (z-pair packing is by
                # construction (value, next-z) so z stays a single lookup)
                ux = jnp.clip(pos[0], 0.0, n - 1.0)
                uy = jnp.clip(pos[1], 0.0, n - 1.0)
                uz = jnp.clip(pos[2], 0.0, n - 1.0)
                ix = jnp.minimum(ux.astype(jnp.int32), n - 2)
                iy = jnp.minimum(uy.astype(jnp.int32), n - 2)
                iz = jnp.minimum(uz.astype(jnp.int32), n - 2)
                nbx = n // 4
                nbz = n // 8
                his, los = [], []
                for a in (0, 1):
                    for b in (0, 1):
                        cx = ix + a
                        cy = iy + b
                        row = ((jax.lax.shift_right_logical(cx, jnp.int32(2))
                                * nbx
                                + jax.lax.shift_right_logical(
                                    cy, jnp.int32(2))) * nbz
                               + jax.lax.shift_right_logical(iz, jnp.int32(3)))
                        lane = (jnp.bitwise_and(cx, jnp.int32(3)) * 32
                                + jnp.bitwise_and(cy, jnp.int32(3)) * 8
                                + jnp.bitwise_and(iz, jnp.int32(7)))
                        his.append(row)
                        los.append(lane)
            else:
                offs = (0, n, n * n, n * n + n)
                his = [jax.lax.shift_right_logical(base + o, jnp.int32(7))
                       for o in offs]
                los = [jnp.bitwise_and(base + o, jnp.int32(127))
                       for o in offs]
            raws = [jnp.zeros((R, 128), jnp.float32) for _ in range(4)]
            if scheme == "A":            # round-4 baseline: 4 full trees
                for c in range(4):
                    r = raws[c]
                    for j in range(C):
                        row = tab_ref[j, :].reshape(1, 128)
                        tb = jnp.broadcast_to(row, (R, 128))
                        g = jnp.take_along_axis(tb, los[c], axis=1)
                        r = jnp.where(his[c] == j, g, r)
                    raws[c] = r
            elif scheme == "B":          # corner-merged tree
                for j in range(C):
                    row = tab_ref[j, :].reshape(1, 128)
                    tb = jnp.broadcast_to(row, (R, 128))
                    for c in range(4):
                        g = jnp.take_along_axis(tb, los[c], axis=1)
                        raws[c] = jnp.where(his[c] == j, g, raws[c])
            elif scheme in ("F", "G"):   # pl.when-gated tree (scratch acc)
                # G = brick layout (his/los already brick-mapped above)
                GROUP = 32
                n_groups = C // GROUP
                gids = [jax.lax.shift_right_logical(h, jnp.int32(5))
                        for h in his]

                def gated(scr):
                    for c in range(4):
                        scr[pl.ds(c * R, R), :] = jnp.zeros(
                            (R, 128), jnp.float32)
                    for g in range(n_groups):
                        hit = jnp.zeros((), jnp.bool_)
                        for c in range(4):
                            hit = jnp.logical_or(hit, jnp.any(gids[c] == g))

                        @pl.when(hit)
                        def _(g=g):
                            for c in range(4):
                                r = scr[pl.ds(c * R, R), :]
                                for jj in range(GROUP):
                                    j = g * GROUP + jj
                                    row = tab_ref[j, :].reshape(1, 128)
                                    tb = jnp.broadcast_to(row, (R, 128))
                                    gg = jnp.take_along_axis(
                                        tb, los[c], axis=1)
                                    r = jnp.where(his[c] == j, gg, r)
                                scr[pl.ds(c * R, R), :] = r
                    return [scr[pl.ds(c * R, R), :] for c in range(4)]

                raws = pl.run_scoped(
                    gated, pltpu.VMEM((4 * R, 128), jnp.float32))
            elif scheme in ("D", "E"):   # group-gated static tree
                # scheme E additionally assumes a brick-ordered table
                # (4x4x8 = 128-voxel bricks as rows) so coherent lanes
                # concentrate in few groups; index math done by caller via
                # _cell_brick — here his/los are already layout-mapped.
                GROUP = 32
                n_groups = C // GROUP
                gids = [jax.lax.shift_right_logical(h, jnp.int32(5))
                        for h in his]
                for g in range(n_groups):
                    hit = jnp.zeros((), jnp.bool_)
                    for c in range(4):
                        hit = jnp.logical_or(hit, jnp.any(gids[c] == g))

                    def scan_group(rs, g=g):
                        rs = list(rs)
                        for jj in range(GROUP):
                            j = g * GROUP + jj
                            row = tab_ref[j, :].reshape(1, 128)
                            tb = jnp.broadcast_to(row, (R, 128))
                            for c in range(4):
                                gg = jnp.take_along_axis(tb, los[c], axis=1)
                                rs[c] = jnp.where(his[c] == j, gg, rs[c])
                        return tuple(rs)

                    raws = list(jax.lax.cond(
                        hit, scan_group, lambda rs: tuple(rs), tuple(raws)))
            else:                        # "C": dynamic window + merge
                hi_min = his[0]
                hi_max = his[-1]
                for c in range(4):
                    hi_min = jnp.minimum(hi_min, his[c])
                    hi_max = jnp.maximum(hi_max, his[c])
                j0 = jnp.min(hi_min)
                j1 = jnp.max(hi_max) + 1

                def body(j, rs):
                    row = tab_ref[pl.ds(j, 1), :]
                    tb = jnp.broadcast_to(row, (R, 128))
                    out = []
                    for c in range(4):
                        g = jnp.take_along_axis(tb, los[c], axis=1)
                        out.append(jnp.where(his[c] == j, g, rs[c]))
                    return out

                raws = jax.lax.fori_loop(j0, j1, body, raws)
            pairs = [_pair_unpack(r) for r in raws]
            return _trilerp(pairs, fx, fy, fz)

        def body(i, carry):
            acc, pos = carry
            acc = acc + density(pos)
            return acc, _advance(pos, n, coherent)

        acc, _ = jax.lax.fori_loop(0, ITERS, body, (acc, pos0))
        out_ref[...] = acc

    rng = np.random.default_rng(0)
    vals = rng.uniform(0.0, 1.0, T).astype(np.float32)
    packed = np.zeros(C * 128, np.uint32)
    nxt = np.concatenate([vals[1:], vals[-1:]])
    bf = (vals.view(np.uint32) >> 16).astype(np.uint32)
    bfn = (nxt.view(np.uint32) >> 16).astype(np.uint32)
    packed[:T] = (bf << 16) | bfn
    tab = jnp.asarray(packed.reshape(C, 128).view(np.float32))
    pos = make_positions(n, coherent, rng)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32)))
    dt = timeit(f, tab, pos)
    per = dt / ITERS
    print(f"{label:34s} n={n:3d} C={C:4d}: {per*1e6:8.2f} us/density "
          f"({R*128*ITERS/dt/1e6:8.1f} M trilinear/s)", flush=True)
    return per


def probe_sublane_gather():
    """Does take_along_axis(tab8 (8,128), idx (1,128), axis=0) lower?"""
    def kern(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(
            tab_ref[...], idx_ref[...], axis=0)

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 8, (1, 128)), jnp.int32)
    try:
        f = jax.jit(pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32)))
        got = np.asarray(f(tab, idx))
        want = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
        ok = np.allclose(got, want)
        print("sublane take_along_axis(axis=0):",
              "SUPPORTED, correct" if ok else "lowered but WRONG", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"sublane take_along_axis(axis=0): unsupported ({type(e).__name__})",
              flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe_sublane_gather()
    for n in (16, 24, 32):
        bench_density(n, "A", True, "A full-tree      (coherent)")
        bench_density(n, "B", True, "B corner-merged  (coherent)")
        bench_density(n, "C", True, "C dyn-window     (coherent)")
        bench_density(n, "C", False, "C dyn-window     (uniform)")
    bench_density(32, "A", False, "A full-tree      (uniform)")
    bench_density(32, "B", False, "B corner-merged  (uniform)")
