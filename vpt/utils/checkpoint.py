"""Progressive rendering with checkpointed accumulation and resume.

The reference keeps its whole image in memory and writes once at the end
(src/rt.cpp:762, 812-820) — a crash loses the render (SURVEY.md §5,
"Checkpoint / resume: none"). Here rendering is a resumable accumulation:
the per-pixel radiance sum, the number of completed spp and the base seed
are saved as an .npz; re-running with the same path continues where the
last run stopped (and is robust to changing the target spp upward).

Sample batches are keyed by (seed, sample_index), so a resumed render
produces the SAME image as an uninterrupted one.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["save_state", "load_state", "render_progressive"]

_FORMAT = 2


def save_state(path: str, acc: np.ndarray, done_spp: int, seed: int,
               meta: dict | None = None) -> None:
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        format=np.int64(_FORMAT),
        acc=acc.astype(np.float64),
        done_spp=np.int64(done_spp),
        seed=np.int64(seed),
        **(meta or {}),
    )
    # numpy appends .npz to the tmp name
    src = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(src, path)


def load_state(path: str):
    with np.load(path) as z:
        return z["acc"], int(z["done_spp"]), int(z["seed"])


def render_progressive(scene, camera, cfg, path: str,
                       checkpoint_every: int = 0, log=print,
                       preview_path: str | None = None,
                       preview_every: int = 0):
    """Render cfg.spp samples per pixel, accumulating one spp batch at a
    time, checkpointing to `path` and resuming from it if present.
    Returns the averaged (H, W, 3) image.

    Resume is ELASTIC in the compute layout: batches are keyed by
    (seed, sample_index), so a checkpoint written under one chunk_pixels
    resumes under any other — the domain analogue of resuming a run on a
    different mesh. Same-layout resume is BIT-stable
    (tests/test_dist.py::test_checkpoint_resume_bitstable); a re-chunked
    resume draws different (equally valid) uniforms for the remaining
    samples because engine draws are positional within a chunk, so it is
    statistically identical, not bit-identical
    (tests/test_dist.py::test_checkpoint_resume_elastic_chunking).

    preview_path/preview_every: every N completed spp, tonemap the running
    mean and write it (PNG if the path ends .png, else P3 PPM) — the
    "image preview dumps" observability item of SURVEY.md §5."""
    import jax
    import numpy as np

    from ..api.render import _render_flat

    npix = cfg.width * cfg.height
    acc = np.zeros((npix, 3), np.float64)
    done = 0
    if path and os.path.exists(path):
        acc, done, seed = load_state(path)
        if acc.shape != (npix, 3):
            raise ValueError(
                f"checkpoint {path} is {acc.shape}, want {(npix, 3)} — "
                "refusing to resume a different resolution"
            )
        if seed != cfg.seed:
            raise ValueError(
                f"checkpoint {path} was rendered with seed {seed}, "
                f"config says {cfg.seed}"
            )
        if log:
            log(f"resuming {path}: {done}/{cfg.spp} spp done")

    base_key = jax.random.PRNGKey(cfg.seed)
    while done < cfg.spp:
        # batch key = fold(base, sample index) -> resume-stable streams
        key = jax.random.fold_in(base_key, done)
        flat = _render_flat(
            scene, camera, key,
            width=cfg.width, height=cfg.height, spp=1,
            chunk=min(cfg.chunk_pixels, npix), jitter=cfg.jitter,
            integrator=cfg.integrator,
            continue_prob=cfg.continue_prob, max_bounces=cfg.max_bounces,
            differentiable=False,
        )
        acc += np.asarray(flat, np.float64)
        done += 1
        if path and (
            done == cfg.spp
            or (checkpoint_every and done % checkpoint_every == 0)
        ):
            save_state(path, acc, done, cfg.seed)
            if log and done < cfg.spp:
                log(f"checkpoint {path}: {done}/{cfg.spp} spp")
        if preview_path and preview_every and (
            done % preview_every == 0 or done == cfg.spp
        ):
            _write_preview(preview_path, acc, done, cfg)
            if log:
                log(f"preview {preview_path}: {done}/{cfg.spp} spp")
    return (acc / max(done, 1)).reshape(cfg.height, cfg.width, 3)


def _write_preview(path: str, acc: np.ndarray, done: int, cfg) -> None:
    from ..io import ppm

    img = (acc / max(done, 1)).reshape(cfg.height, cfg.width, 3)
    if path.endswith(".png"):
        ppm.write_png(path, img)
    else:
        ppm.write_ppm(path, img)
