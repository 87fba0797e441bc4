"""Multi-host startup and cross-host image assembly.

The reference is a single process (SURVEY §2.12, "Communication backend:
none"); the TPU-native equivalent of scaling beyond one host is standard
JAX multi-controller SPMD: `jax.distributed.initialize` + a global
(data, sample) mesh over all devices, with XLA collectives riding ICI
within a slice and DCN across hosts. Nothing here invents transport —
that is the point (SURVEY §5, "no custom transport is required").
"""
from __future__ import annotations

import jax
import numpy as np

from .mesh import make_mesh

__all__ = ["initialize", "global_mesh", "assemble_image"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the multi-host runtime (idempotent on a single host).

    With no arguments, relies on the TPU environment variables the runtime
    sets on pod slices; explicit args support manual bring-up/testing.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError):
        # single-host (or already-initialized) environments
        pass


def global_mesh(sample_shards: int | None = None):
    """The (data, sample) mesh over ALL global devices; pass to
    dist.render_sharded / dist.make_train_step. Device order follows
    jax.devices(), so the data axis stays host-local first and collectives
    over it prefer ICI."""
    return make_mesh(jax.devices(), sample_shards=sample_shards)


def assemble_image(flat_local, cfg):
    """Host-local gather of a pixel-sharded render into a full (H, W, 3)
    numpy image via process_allgather (DCN)."""
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(flat_local)
    return np.asarray(gathered).reshape(cfg.height, cfg.width, 3)
