"""Stateless counter-based RNG.

The reference mutates ONE global erand48 state from every sampler and every
OpenMP thread (reference include/Vector.h:38, Vector.cpp:8, seeded at
src/rt.cpp:746) — a data race that makes renders non-reproducible. The TPU
build replaces it by construction with a stateless, counter-based scheme:
every random draw is keyed by (base seed, sample index, bounce, draw tag),
so any lane/bounce/draw can be regenerated independently, in parallel, with
no cross-lane state.

Inside `jit` the draw tags are trace-time Python ints, so folding is free to
specialize; the bounce counter is a traced value folded dynamically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fold", "uniform", "uniform3", "Tag"]


class Tag:
    """Stable draw tags, one per logical random decision in an integrator
    bounce. Values only need to be distinct."""

    RR = 0                # russian roulette keep/kill
    LIGHT_PICK = 1        # uniform emitter selection
    DISTANCE = 2          # free-flight / equi-angular distance xi
    PHASE = 3             # isotropic phase direction (2 draws)
    BSDF = 4              # bsdf lobe sampling (2 draws)
    BSDF_CHOICE = 5       # dielectric fresnel branch choice
    NEE_CONE = 6          # solid-angle cone sample in NEE (2 draws)
    MIS_LIGHT = 7         # per-light cone samples inside MIS
    MIS_BSDF = 8          # the bsdf strategy sample inside MIS
    MIS_DIELECTRIC = 9    # the erand48(seed)>gpdf flip inside MIS (misSamplingFunctions.h:38)
    PIXEL_JITTER = 10     # subpixel jitter (2 draws)
    EVENT = 11            # surface/medium bernoulli in equi-angular integrators
    AREA = 12             # area-light surface sample
    MARCH = 13            # ray-marching per-segment draws
    MIS = 14              # subkey root for the whole MIS block of a bounce
    DELTA = 15            # delta-tracking null-collision draws (hetero media)


def fold(key: jax.Array, *tags) -> jax.Array:
    """Fold any number of (possibly traced) integer tags into a key."""
    for t in tags:
        key = jax.random.fold_in(key, t)
    return key


def uniform(key: jax.Array, shape=(), dtype=jnp.float32) -> jax.Array:
    """U[0,1) draw(s) — the erand48 analogue."""
    return jax.random.uniform(key, shape, dtype=dtype)


def uniform3(key: jax.Array, shape=(), dtype=jnp.float32) -> jax.Array:
    """Three independent U[0,1) arrays of the given shape."""
    u = jax.random.uniform(key, (3,) + tuple(shape), dtype=dtype)
    return u[0], u[1], u[2]


# --- erand48-compatible backend (SURVEY §7.2) ---------------------------
#
# The reference draws every uniform from ONE shared erand48 state
# (include/Vector.h:38, Vector.cpp:8). For seed-matched single-threaded
# oracle comparisons we reproduce the exact glibc LCG: 48-bit state,
# x' = a*x + c mod 2^48 with a = 0x5DEECE66D, c = 0xB; the double is the
# top 48 bits scaled by 2^-48 (DRAND48 semantics).

ERAND48_A = 0x5DEECE66D
ERAND48_C = 0xB
ERAND48_MASK = (1 << 48) - 1


def erand48_state(seed_words) -> int:
    """Pack the xsubi[3] little-endian 16-bit words into the 48-bit state
    (the reference seeds 3 entropy bytes into these words, src/rt.cpp:746)."""
    w = list(seed_words)
    return (w[0] | (w[1] << 16) | (w[2] << 32)) & ERAND48_MASK


def erand48_sequence(state: int, n: int):
    """Generate n doubles + the advanced state, bit-exact vs glibc erand48.
    Pure python ints (exact 48-bit arithmetic) — oracle use only."""
    out = []
    for _ in range(n):
        state = (state * ERAND48_A + ERAND48_C) & ERAND48_MASK
        out.append(state / float(1 << 48))
    return out, state
