"""Image IO: ASCII PPM (P3) writer bit-compatible with the reference, plus a
PNG fallback.

The reference writes `P3\\n<w> <h>\\n255\\n` followed by space-separated
gamma-2.2-quantized ints, one trailing space after each triple
(src/rt.cpp:812-820), with the pixel buffer stored top row first (the
(h-y-1)*w+x flip at src/rt.cpp:773). Our images are already top-down.

A native C extension (vpt/io/_ppmio.c, build with
`python -m vpt.io.build_native`) provides the fast path — byte-identical
output, ~50x faster encode; the pure-Python implementation below is the
behavioral reference and the fallback.
"""
from __future__ import annotations

import numpy as np

__all__ = ["tonemap", "write_ppm", "read_ppm", "write_png",
           "native_available"]

try:
    from . import _ppmio  # noqa: F401  (built by vpt.io.build_native)
except ImportError:
    _ppmio = None


def native_available() -> bool:
    return _ppmio is not None


def tonemap(image) -> np.ndarray:
    """Linear (H, W, 3) float -> uint8-range ints via clamp + gamma 2.2
    (mathUtilities.h:43-45 applied at src/rt.cpp:817)."""
    img = np.ascontiguousarray(np.asarray(image, dtype=np.float64))
    if _ppmio is not None:
        q = np.frombuffer(_ppmio.tonemap_raw(img.tobytes()), dtype=np.intc)
        return q.reshape(img.shape).astype(np.int32)
    return (np.power(np.clip(img, 0.0, 1.0), 1.0 / 2.2) * 255.0 + 0.5).astype(np.int32)


def write_ppm(path: str, image, already_quantized: bool = False) -> None:
    """Write an ASCII P3 PPM matching the reference byte format."""
    q = np.asarray(image, np.int32) if already_quantized else tonemap(image)
    h, w, _ = q.shape
    if _ppmio is not None:
        _ppmio.write_p3_raw(
            path, np.ascontiguousarray(q, np.intc).tobytes(), h, w)
        return
    with open(path, "w") as f:
        f.write(f"P3\n{w} {h}\n255\n")
        flat = q.reshape(-1, 3)
        f.write("".join(f"{r} {g} {b} " for r, g, b in flat))


def write_png(path: str, image, already_quantized: bool = False) -> None:
    """Write an 8-bit RGB PNG of the tonemapped image. Dependency-free:
    stdlib zlib + the PNG container format (the reference has no PNG path;
    this is a viewer convenience next to the parity PPM writer)."""
    import struct
    import zlib

    q = np.asarray(image, np.int32) if already_quantized else tonemap(image)
    q = np.clip(q, 0, 255).astype(np.uint8)
    h, w, _ = q.shape
    # each scanline prefixed with filter byte 0
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), q.reshape(h, w * 3)], axis=1
    ).tobytes()

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)   # 8-bit RGB
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def read_ppm(path: str) -> np.ndarray:
    """Read an ASCII P3 PPM into (H, W, 3) int array (for golden tests)."""
    if _ppmio is not None:
        raw, w, h = _ppmio.read_p3(path)
        return np.frombuffer(raw, dtype=np.intc).reshape(h, w, 3).astype(np.int32)
    with open(path) as f:
        tokens = f.read().split()
    assert tokens[0] == "P3", f"not a P3 ppm: {path}"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    data = np.array(tokens[4 : 4 + w * h * 3], dtype=np.int32)
    return data.reshape(h, w, 3)
