"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY.md §4.5): sharded
render equivalence, SPMD train step, checkpoint/resume.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import vpt
from vpt.dist import (DATA_AXIS, SAMPLE_AXIS, make_mesh, make_train_step,
                      mesh_shape_for, render_sharded, scene_params)
from vpt.integrators import engine

SCENE = vpt.cornell_vpt()
CAM = vpt.default_camera()


def test_mesh_shape_factorization():
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(8, 4) == (2, 4)
    assert mesh_shape_for(1) == (1, 1)
    with pytest.raises(ValueError):
        mesh_shape_for(7, 2)


def test_sharded_render_runs_and_is_finite():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] * mesh.shape[SAMPLE_AXIS] == 8
    cfg = vpt.RenderConfig(width=16, height=16, spp=4, max_bounces=6)
    img = np.asarray(render_sharded(SCENE, CAM, cfg, mesh))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0


def test_sharded_matches_single_device_statistically():
    """Sharded and unsharded renders draw different streams but estimate the
    same image; compare means at moderate spp."""
    mesh = make_mesh()
    cfg = vpt.RenderConfig(width=12, height=12, spp=96, max_bounces=8,
                           chunk_pixels=144, renderer="scan")
    a = np.asarray(render_sharded(SCENE, CAM, cfg, mesh))
    b = np.asarray(vpt.render(SCENE, CAM, cfg))
    # compare on the display-clamped image: the raw mean is firefly-dominated
    # at this spp and not a stable statistic
    ca, cb = np.clip(a, 0, 1).mean(), np.clip(b, 0, 1).mean()
    assert np.isclose(ca, cb, rtol=0.15), (ca, cb)


def test_sharded_pallas_matches_engine_statistically():
    """The fused-kernel sharded path (dist/sharded_pallas.py, interpret mode
    on the CPU mesh) estimates the same image as the engine sharded path."""
    mesh = make_mesh()
    cfg = vpt.RenderConfig(width=16, height=12, spp=32, max_bounces=8)
    a = np.asarray(render_sharded(SCENE, CAM, cfg, mesh, backend="pallas",
                                  interpret=True))
    b = np.asarray(render_sharded(SCENE, CAM, cfg, mesh, backend="engine"))
    assert a.shape == b.shape == (12, 16, 3)
    assert np.isfinite(a).all()
    ca, cb = np.clip(a, 0, 1).mean(), np.clip(b, 0, 1).mean()
    assert np.isclose(ca, cb, rtol=0.15), (ca, cb)


def test_sharded_pallas_deterministic_and_covers_all_pixels():
    """Fixed (mesh, seed) => identical frames; every pixel rendered by
    exactly one data shard (no duplicated/missing tiles)."""
    from vpt.dist.sharded_pallas import render_pallas_sharded

    mesh = make_mesh()
    cfg = vpt.RenderConfig(width=20, height=10, spp=8, max_bounces=6)
    a = np.asarray(render_pallas_sharded(SCENE, CAM, cfg, mesh, interpret=True))
    b = np.asarray(render_pallas_sharded(SCENE, CAM, cfg, mesh, interpret=True))
    assert np.array_equal(a, b)
    assert np.isfinite(a).all()
    # each pixel got real samples: a fully-black frame or NaN row would
    # indicate a base-offset/tile-range bug
    assert (np.clip(a, 0, 1).reshape(-1, 3).mean(axis=1) >= 0).all()
    assert a.mean() > 0


def test_sharded_pallas_ld_sampler_finite_and_seeded():
    """sampler='ld' flows through the sharded fused path: deterministic
    per (mesh, seed), seed-sensitive, finite, nonzero."""
    import dataclasses as _dc

    from vpt.dist.sharded_pallas import render_pallas_sharded

    mesh = make_mesh()
    cfg = vpt.RenderConfig(width=20, height=10, spp=8, max_bounces=6,
                           sampler="ld")
    a = np.asarray(render_pallas_sharded(SCENE, CAM, cfg, mesh,
                                         interpret=True))
    b = np.asarray(render_pallas_sharded(SCENE, CAM, cfg, mesh,
                                         interpret=True))
    c = np.asarray(render_pallas_sharded(
        SCENE, CAM, _dc.replace(cfg, seed=cfg.seed + 1), mesh,
        interpret=True))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert np.isfinite(a).all() and a.mean() > 0


@pytest.mark.slow
def test_sharded_fd_geom_step_matches_single_device():
    """The psum'd sharded FD loss equals the single-device FD loss (global
    -lane-keyed PCG => identical draws, summation order aside), and the
    step moves only the enabled block."""
    import optax

    from vpt.dist import make_fd_geom_train_step, make_sharded_fd_geom_train_step
    from vpt.kernels.geom import pack_theta

    # sample_shards=1: pure data sharding must reproduce the single-device
    # loss exactly (sample shards > 1 average decorrelated secants instead)
    mesh = make_mesh(sample_shards=1)
    W, H, SPP, MB, LIGHT = 16, 8, 4, 4, 8
    target = np.zeros((W * H, 3), np.float32) + 0.05
    optimizer = optax.adam(0.3)
    theta = dict(pack_theta(SCENE, CAM, LIGHT))
    theta["center"] = theta["center"] + jnp.asarray([0.0, 4.0, 0.0])

    s1 = make_fd_geom_train_step(SCENE, CAM, W, H, SPP, optimizer,
                                 sphere=LIGHT, cam_grads=False,
                                 max_bounces=MB, interpret=True)
    s8 = make_sharded_fd_geom_train_step(SCENE, CAM, W, H, SPP, optimizer,
                                         mesh, sphere=LIGHT, cam_grads=False,
                                         max_bounces=MB, interpret=True)
    t1, _, l1 = s1(theta, optimizer.init(theta), jnp.asarray(target),
                   jnp.int32(5))
    t8, _, l8 = s8(theta, optimizer.init(theta), jnp.asarray(target),
                   jnp.int32(5))
    assert np.isfinite(float(l1)) and np.isfinite(float(l8))
    assert np.isclose(float(l1), float(l8), rtol=1e-5), (float(l1), float(l8))
    assert np.allclose(np.asarray(t1["center"]), np.asarray(t8["center"]),
                       rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(t8["cam_origin"]),
                       np.asarray(theta["cam_origin"]))

    # default (data, sample) mesh: sample shards average decorrelated
    # secants — still a valid step (finite loss, moves only the light)
    s42 = make_sharded_fd_geom_train_step(SCENE, CAM, W, H, SPP, optimizer,
                                          make_mesh(), sphere=LIGHT,
                                          cam_grads=False, max_bounces=MB,
                                          interpret=True)
    t42, _, l42 = s42(theta, optimizer.init(theta), jnp.asarray(target),
                      jnp.int32(5))
    assert np.isfinite(float(l42))
    assert not np.allclose(np.asarray(t42["center"]),
                           np.asarray(theta["center"]))
    assert np.allclose(np.asarray(t42["cam_origin"]),
                       np.asarray(theta["cam_origin"]))


def test_train_step_updates_and_replicates():
    mesh = make_mesh()
    spec = engine.IntegratorSpec(max_bounces=4)
    W = H = 8
    npix = W * H
    pixel_ids = jnp.arange(npix, dtype=jnp.int32)
    target = jnp.zeros((npix, 3))
    optimizer = optax.adam(1e-2)
    params = scene_params(SCENE, CAM)
    opt_state = optimizer.init(params)
    step = make_train_step(mesh, spec, W, H, spp=2, optimizer=optimizer)
    p2, opt_state, loss = step(params, opt_state, SCENE, CAM, target,
                               pixel_ids, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # params moved
    assert not np.allclose(np.asarray(p2["sigma_s"]), np.asarray(params["sigma_s"]))
    for v in jax.tree_util.tree_leaves(p2):
        assert np.isfinite(np.asarray(v)).all()


def test_train_step_stays_in_physical_domain():
    """Projected gradient descent (dist.project_params): with lr ~ 1e-2 and
    the reference's sigma ~ 1e-3, Adam's very first unconstrained update
    lands sigma NEGATIVE, after which the score-function sigma gradient
    (log sigma_t) is NaN while the loss stays finite — training silently
    diverges. Found by the 2-process DCN rehearsal; the step must keep every
    parameter inside its domain across repeated updates."""
    mesh = make_mesh()
    spec = engine.IntegratorSpec(max_bounces=4, sigma_score=True)
    W = H = 8
    npix = W * H
    pixel_ids = jnp.arange(npix, dtype=jnp.int32)
    target = jnp.full((npix, 3), 0.05)
    optimizer = optax.adam(1e-2)  # deliberately >> sigma's scale
    params = scene_params(SCENE, CAM)
    opt_state = optimizer.init(params)
    step = make_train_step(mesh, spec, W, H, spp=2, optimizer=optimizer)
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, SCENE, CAM, target,
                                       pixel_ids, jax.random.PRNGKey(10 + i))
        assert np.isfinite(float(loss)), i
    for k, v in params.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(params["sigma_a"]) > 0 and float(params["sigma_s"]) > 0
    assert (np.asarray(params["albedo"]) >= 0).all()
    assert (np.asarray(params["albedo"]) <= 1).all()
    assert (np.asarray(params["radiance"]) >= 0).all()


def test_checkpoint_resume_elastic_chunking(tmp_path):
    """Elastic resume: a checkpoint written under one chunk_pixels layout
    resumes under a different one (batches are keyed by (seed,
    sample-index), independent of the compute sharding) — the domain
    analogue of resuming on a different mesh. The resumed samples draw
    different (equally valid) uniforms, so agreement is statistical, not
    bitwise; the first `done` samples of the accumulator carry over
    exactly. Also exercises the preview-dump observability hook
    (SURVEY.md §5)."""
    import dataclasses
    from vpt.io.ppm import read_ppm, tonemap
    from vpt.utils.checkpoint import load_state, render_progressive

    W = H = 16
    cfg = vpt.RenderConfig(width=W, height=H, spp=32, max_bounces=4,
                           chunk_pixels=W * H)
    full = render_progressive(SCENE, CAM, cfg, str(tmp_path / "a.npz"),
                              log=None)

    half = dataclasses.replace(cfg, spp=16, chunk_pixels=64)
    p = str(tmp_path / "b.npz")
    render_progressive(SCENE, CAM, half, p, log=None)
    acc_half, done_half, _ = load_state(p)
    assert done_half == 16
    import shutil

    p2 = str(tmp_path / "b_copy.npz")
    shutil.copy(p, p2)
    prev = str(tmp_path / "prev.ppm")
    re_cfg = dataclasses.replace(cfg, chunk_pixels=128)
    resumed = render_progressive(SCENE, CAM, re_cfg, p, log=None,
                                 preview_path=prev, preview_every=8)
    # a re-chunked resume is deterministic given the checkpoint + layout
    resumed2 = render_progressive(SCENE, CAM, re_cfg, p2, log=None)
    assert np.array_equal(np.asarray(resumed), np.asarray(resumed2))
    assert int(load_state(p)[1]) == 32
    # and agrees with the uninterrupted render statistically
    f, r = np.asarray(full).mean(), np.asarray(resumed).mean()
    assert abs(f - r) < 0.25 * max(f, r), (f, r)
    # the last preview is the tonemapped final mean
    assert np.array_equal(read_ppm(prev), tonemap(np.asarray(resumed)))


def test_checkpoint_resume_bitstable(tmp_path):
    from vpt.utils.checkpoint import render_progressive

    cfg = vpt.RenderConfig(width=8, height=8, spp=4, max_bounces=4,
                           chunk_pixels=64)
    p = str(tmp_path / "ck.npz")
    full = render_progressive(SCENE, CAM, cfg, p, log=None)
    os.remove(p)
    import dataclasses
    half = dataclasses.replace(cfg, spp=2)
    render_progressive(SCENE, CAM, half, p, log=None)
    resumed = render_progressive(SCENE, CAM, cfg, p, log=None)
    assert np.allclose(np.asarray(full), np.asarray(resumed), atol=1e-7)


@pytest.mark.slow  # ~340s: interpret diff pair under shard_map
def test_sharded_kernel_train_step_runs():
    """Multi-chip kernel training (dist/train_fast.py): the fused fwd/bwd
    pair under shard_map with psum'd loss/grads executes on the CPU mesh
    (interpret mode) and moves the parameters."""
    from vpt.dist.train_fast import make_sharded_kernel_train_step
    from vpt.kernels.diff import pack_params

    mesh = make_mesh(jax.devices()[:4], sample_shards=1)
    W = H = 16
    optimizer = optax.adam(1e-2)
    params = pack_params(SCENE)
    opt_state = optimizer.init(params)
    target = jnp.zeros((W * H, 3), jnp.float32)
    step = make_sharded_kernel_train_step(
        SCENE, CAM, W, H, spp=4, optimizer=optimizer, mesh=mesh,
        max_bounces=6, tile_rows=8, interpret=True)
    p2, opt_state, loss = step(params, opt_state, target, 0)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(p2["sigma_s"]),
                           np.asarray(params["sigma_s"]))
    for v in jax.tree_util.tree_leaves(p2):
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_sharded_kernel_train_step_grid_voxel_grads():
    """Round 4: multi-chip differentiable tomography — diff_grid through
    make_shard (traced voxel table in, per-shard (C,128) grad table out)
    under shard_map. The D=4 step must reproduce the D=1 step (per-lane
    PCG streams are global-lane-keyed; the psum'd loss/grads make every
    device's update identical), and the voxel table must move."""
    import dataclasses

    from vpt.dist.train_fast import make_sharded_kernel_train_step
    from vpt.kernels.diff import pack_params
    from vpt.media import density as df
    from vpt.scene.scene import Medium, blob_cloud

    base = blob_cloud()
    n = 4
    vals = np.full((n, n, n), 0.4, np.float32)
    f = df.DensityField(params=jnp.asarray(vals), kind="grid",
                        majorant=1.0, grid_origin=(-28.0, -18.0, 150.0),
                        grid_spacing=(14.0, 10.0, 11.0), n_march=8)
    scene = dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s,
                            0.0, f))
    W = H = 16
    target = jnp.zeros((W * H, 3), jnp.float32)
    results = {}
    for nd in (1, 4):
        optimizer = optax.adam(1e-2)
        params = pack_params(scene, with_grid=True)
        opt_state = optimizer.init(params)
        mesh = make_mesh(jax.devices()[:nd], sample_shards=1)
        step = make_sharded_kernel_train_step(
            scene, CAM, W, H, spp=4, optimizer=optimizer, mesh=mesh,
            max_bounces=4, diff_grid=True, interpret=True)
        p2, opt_state, loss = step(params, opt_state, target, 0)
        assert np.isfinite(float(loss)), nd
        g2 = np.asarray(p2["grid"])
        assert np.isfinite(g2).all()
        assert np.abs(g2 - vals).max() > 0, "voxel table did not move"
        results[nd] = (float(loss), g2)
    l1, g1 = results[1]
    l4, g4 = results[4]
    assert np.isclose(l1, l4, rtol=1e-5, atol=1e-8), (l1, l4)
    assert np.allclose(g1, g4, rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_sharded_kernel_train_step_multi_active_shards_stay_replicated():
    """Round-5 regression for the missing grad all-reduce: under
    check_vma=False the loss psum's transpose does NOT re-reduce
    cotangents, so each device got only its own shard's partial gradient
    and the replicas silently diverged. Every earlier test used frames
    that fit ONE shard's tile (the other shards had no pixels and zero
    grads), which hid it; this frame spans 2 tiles so two shards carry
    real gradients. Asserts bitwise replica equality across devices and
    D=2 == D=1."""
    from vpt.dist.train_fast import make_sharded_kernel_train_step
    from vpt.kernels.diff import pack_params

    W, H = 64, 32          # 2048 px = 2 tiles at tile_rows=8
    params = pack_params(SCENE)
    target = jnp.zeros((W * H, 3), jnp.float32)
    out = {}
    for nd in (1, 2):
        optimizer = optax.adam(1e-2)
        opt_state = optimizer.init(params)
        mesh = make_mesh(jax.devices()[:nd], sample_shards=1)
        step = make_sharded_kernel_train_step(
            SCENE, CAM, W, H, spp=2, optimizer=optimizer, mesh=mesh,
            max_bounces=3, tile_rows=8, interpret=True)
        p2, opt_state, loss = step(params, opt_state, target, 0)
        out[nd] = (float(loss), p2)
    leaf = out[2][1]["albedo"]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert np.abs(shards[0] - shards[1]).max() == 0.0, \
        "device replicas diverged: grad psum missing"
    assert np.isclose(out[1][0], out[2][0], rtol=1e-6)
    for k in ("sigma_a", "sigma_s"):
        assert np.isclose(float(np.asarray(out[1][1][k])),
                          float(np.asarray(out[2][1][k])), rtol=1e-5), k
