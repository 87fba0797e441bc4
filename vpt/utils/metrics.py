"""Observability: throughput metering, progress, variance, profiling.

The reference's entire observability stack is a stderr row-progress meter
(src/rt.cpp:771) and one wall-clock print (src/rt.cpp:824-827). The TPU
build (SURVEY.md §5) reports structured per-step metrics — paths/s,
samples done, running pixel-variance estimate — plus an optional
jax.profiler trace context for per-kernel analysis.
"""
from __future__ import annotations

import contextlib
import json
import math
import sys
import time

import numpy as np

__all__ = ["RenderMeter", "profile_trace", "progress",
           "mse", "rel_mse", "psnr"]


class RenderMeter:
    """Accumulates per-batch timing and image statistics.

    update(n_paths, image_batch) after each sample batch; summary() returns a
    JSON-able dict; log() writes one structured line to stderr.
    """

    def __init__(self):
        self.t0 = time.time()
        self.paths = 0
        self.batches = 0
        # Welford over batch means for a cheap convergence signal
        self._mean = None
        self._m2 = None

    def update(self, n_paths: int, image_batch=None) -> None:
        self.paths += int(n_paths)
        self.batches += 1
        if image_batch is not None:
            x = np.asarray(image_batch, np.float64)
            if self._mean is None:
                self._mean = x.copy()
                self._m2 = np.zeros_like(x)
            else:
                d = x - self._mean
                self._mean += d / self.batches
                self._m2 += d * (x - self._mean)

    @property
    def elapsed(self) -> float:
        return time.time() - self.t0

    def paths_per_sec(self) -> float:
        return self.paths / max(self.elapsed, 1e-9)

    def pixel_variance(self):
        """Mean per-pixel variance of the batch-mean estimator."""
        if self._m2 is None or self.batches < 2:
            return None
        return float(np.mean(self._m2) / (self.batches - 1) / self.batches)

    def summary(self) -> dict:
        out = {
            "paths": self.paths,
            "batches": self.batches,
            "elapsed_s": round(self.elapsed, 3),
            "paths_per_sec": round(self.paths_per_sec(), 1),
        }
        var = self.pixel_variance()
        if var is not None:
            out["est_pixel_variance"] = var
        return out

    def log(self, **extra) -> None:
        print(json.dumps({**self.summary(), **extra}), file=sys.stderr)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context — the TPU-native replacement for the
    reference's single chrono timer. View with TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def progress(fraction: float, stream=sys.stderr) -> None:
    """The reference's `\\r%5.2f%%` row meter (src/rt.cpp:771)."""
    stream.write(f"\r{100.0 * fraction:5.2f}%")
    stream.flush()


# --- image comparison metrics (no reference counterpart: its validation is
# visual, SURVEY.md §4) -----------------------------------------------------

def mse(img, ref) -> float:
    """Mean squared error over linear radiance."""
    a = np.asarray(img, np.float64)
    b = np.asarray(ref, np.float64)
    return float(np.mean((a - b) ** 2))


def rel_mse(img, ref, eps: float = 1e-2) -> float:
    """Relative MSE, (img-ref)^2 / (ref^2 + eps) — the standard
    brightness-weighted metric for Monte-Carlo renders (bright-pixel noise
    would otherwise dominate plain MSE)."""
    a = np.asarray(img, np.float64)
    b = np.asarray(ref, np.float64)
    return float(np.mean((a - b) ** 2 / (b * b + eps)))


def psnr(img, ref, peak: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB over linear radiance."""
    m = mse(img, ref)
    return float("inf") if m == 0 else 10.0 * math.log10(peak * peak / m)
