"""Device-mesh construction for sharded rendering / inverse rendering.

The reference's only parallelism is one OpenMP ``parallel for`` over image
rows inside a single process (reference src/rt.cpp:767-768) with no
communication backend at all (SURVEY.md §2.12). The TPU-native equivalent is
a `jax.sharding.Mesh` with two logical axes:

  "data"   — pixels sharded across devices (the DP axis; replaces the OpenMP
             row loop),
  "sample" — samples-per-pixel sharded across devices (the SP axis; the
             domain's "sequence" axis is spp, SURVEY.md §5), reduced with a
             differentiable `pmean` so every sample shard contributes to the
             pixel estimate.

All communication is XLA collectives over ICI (psum/pmean); there is no
host-side transport. TP/PP/EP have no analogue here: the "model" (scene
parameter pytree) is a few hundred floats and is replicated (SURVEY.md
§2.12).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["DATA_AXIS", "SAMPLE_AXIS", "make_mesh", "mesh_shape_for"]

DATA_AXIS = "data"
SAMPLE_AXIS = "sample"


def mesh_shape_for(n_devices: int, sample_shards: int | None = None) -> tuple[int, int]:
    """Pick a (data, sample) factorization of n_devices.

    By default the sample axis gets the largest power-of-two factor <= 2 —
    pixels are the abundant axis (a 1024x1024 frame has 1M of them), so DP
    dominates; SP exists to exercise the cross-shard estimator reduction and
    to help tiny-image / huge-spp workloads.
    """
    if sample_shards is None:
        sample_shards = 2 if n_devices % 2 == 0 else 1
    if n_devices % sample_shards:
        raise ValueError(
            f"n_devices={n_devices} not divisible by sample_shards={sample_shards}"
        )
    return n_devices // sample_shards, sample_shards


def make_mesh(devices=None, sample_shards: int | None = None) -> Mesh:
    """Build the (data, sample) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    d, s = mesh_shape_for(n, sample_shards)
    arr = np.asarray(devices).reshape(d, s)
    return Mesh(arr, (DATA_AXIS, SAMPLE_AXIS))
