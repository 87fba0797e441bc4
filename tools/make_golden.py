"""Regenerate tests/data/golden_cornell_linear.npz from the reference.

Pipeline (tests/test_golden.py mirrors it on the vpt side): N independent
4-spp reference renders (probe render_run: the UNMODIFIED
iterativeVPTracerFree + reference camera, NaN-masked per-pixel linear mean
— the reference's int-abs microfacet bug emits ~0.5% NaN samples), each
clamp+gamma-2.2 quantized to bytes (mathUtilities.h:43-45) and decoded back
to linear, averaged over runs, then block-downsampled 16x (ds16: 48x64) and
8x (ds8: 96x128).

Usage:  sh tools/refprobe/build.sh && python tools/make_golden.py [runs]
"""
import ctypes
import os
import sys
import time

import numpy as np

PROBE = os.path.join(os.path.dirname(__file__), "..", ".refbuild",
                     "libprobe.so")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "golden_cornell_linear.npz")
W, H, SPP = 1024, 768, 4


def main(runs: int = 32) -> None:
    lib = ctypes.CDLL(os.path.abspath(PROBE),
                      mode=os.RTLD_LOCAL | os.RTLD_DEEPBIND)
    lib.render_run.argtypes = [ctypes.c_int, ctypes.c_uint64,
                               ctypes.POINTER(ctypes.c_double)]
    buf = np.zeros((H, W, 3), np.float64)
    acc = np.zeros_like(buf)
    for i in range(runs):
        t0 = time.time()
        lib.render_run(SPP, 1000 + i,
                       buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        # clamp + gamma quantize (toDisplayValue, mathUtilities.h:43-45),
        # then decode: the golden stores what survives the PPM round trip
        q = (np.power(np.clip(buf, 0.0, 1.0), 1.0 / 2.2) * 255.0
             + 0.5).astype(np.int32)
        acc += np.power(q / 255.0, 2.2)
        print(f"run {i + 1}/{runs}  {time.time() - t0:.1f}s  "
              f"mean {acc.mean() / (i + 1):.5f}", flush=True)
    mean = acc / runs
    ds16 = mean.reshape(H // 16, 16, W // 16, 16, 3).mean(axis=(1, 3))
    ds8 = mean.reshape(H // 8, 8, W // 8, 8, 3).mean(axis=(1, 3))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, ds16=ds16, ds8=ds8)
    print(f"wrote {os.path.abspath(OUT)}  ds16 {ds16.shape} mean "
          f"{ds16.mean():.5f}  ds8 {ds8.shape}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
