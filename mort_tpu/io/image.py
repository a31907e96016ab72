"""Image output.

Replaces the reference's GL-interop display path (gpu_anim.h:43-150) with
PNG/NPZ writers.  The renderer's framebuffer has row 0 at the *bottom* (GL
convention); writers flip to top-down file order.
"""

from __future__ import annotations

import numpy as np


def save_png(path: str, img) -> None:
    """Write a [H,W,3] image (uint8, or float linear radiance which gets the
    reference's gamma-2 + clamp pipeline) to PNG, flipping to top-down."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        g = np.sqrt(np.maximum(arr, 0.0))
        arr = (256.0 * np.clip(g, 0.0, 0.999)).astype(np.uint8)
    arr = arr[::-1]  # bottom-up framebuffer -> top-down file
    try:
        from PIL import Image
        Image.fromarray(arr).save(path)
    except ImportError:
        _save_png_pure(path, arr)


def _save_png_pure(path: str, arr: np.ndarray) -> None:
    """Minimal dependency-free PNG encoder (8-bit RGB, no filtering)."""
    import struct
    import zlib

    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag, payload):
        out = struct.pack(">I", len(payload)) + tag + payload
        return out + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def save_npz(path: str, linear_img, **extra) -> None:
    """Save the float framebuffer (plus metadata) for accumulation/tests."""
    np.savez_compressed(path, image=np.asarray(linear_img), **extra)


def load_npz(path: str):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
