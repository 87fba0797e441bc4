"""Distributed layer: device mesh, sharded rendering, SPMD training.

See SURVEY.md §2.12 — the reference's only parallelism is one OpenMP row
loop; this package is its TPU-native replacement (jax.sharding Mesh +
shard_map + XLA collectives over ICI).
"""
from .mesh import DATA_AXIS, SAMPLE_AXIS, make_mesh, mesh_shape_for
from .sharded import render_sharded
from .tomography import fit_grid, make_grid_train_step
from .train import (apply_params, fit, make_train_step, project_params,
                    scene_params)
from .train_fast import (fit_geom, fit_geom_fd, fit_kernel, fit_multiview,
                         make_fd_geom_train_step, make_geom_train_step,
                         make_kernel_train_step, make_multiview_train_step,
                         make_sharded_fd_geom_train_step,
                         make_sharded_kernel_train_step)

__all__ = [
    "DATA_AXIS", "SAMPLE_AXIS", "make_mesh", "mesh_shape_for",
    "render_sharded", "scene_params", "apply_params", "project_params",
    "make_train_step", "fit",
    "make_kernel_train_step", "fit_kernel", "make_geom_train_step",
    "fit_geom", "make_fd_geom_train_step", "fit_geom_fd",
    "make_sharded_kernel_train_step", "make_sharded_fd_geom_train_step",
    "make_multiview_train_step", "fit_multiview",
    "make_grid_train_step", "fit_grid",
]
