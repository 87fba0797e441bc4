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
    sets on pod slices and tolerates single-host environments where
    auto-detection fails. Explicit args are a manual bring-up (tests,
    bare-metal): failures there are real and raise.

    CPU rehearsal (tests/test_multihost.py): set
    ``jax.config.update("jax_cpu_collectives_implementation", "gloo")``
    before calling — cross-process CPU collectives then ride gloo exactly
    where DCN sits on a pod.
    """
    # NB: must not touch the backend here (jax.process_count() would
    # initialise XLA and make jax.distributed.initialize impossible)
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass  # single-host / no cluster env: stay single-process
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_mesh(sample_shards: int | None = None):
    """The (data, sample) mesh over ALL global devices; pass to
    dist.render_sharded / dist.make_train_step. Device order follows
    jax.devices(), so the data axis stays host-local first and collectives
    over it prefer ICI."""
    return make_mesh(jax.devices(), sample_shards=sample_shards)


def assemble_image(flat, cfg):
    """Gather a pixel-sharded render into a full (H, W, 3) numpy image on
    every host via process_allgather (DCN).

    Accepts either the global jax.Array render_sharded returns (tiled
    gather of the non-addressable shards) or an already host-local
    (npix_local, 3) array (stacked then flattened along pixels)."""
    from jax.experimental import multihost_utils

    is_global = isinstance(flat, jax.Array) and not flat.is_fully_addressable
    gathered = multihost_utils.process_allgather(flat, tiled=is_global)
    return np.asarray(gathered).reshape(cfg.height, cfg.width, 3)
