"""Image utilities: resize, block-average reduce, PNG export.

Reference component #8 (image.h — RGB/gray containers, pad-or-area-average resize
image.h:235-314, block-average reduce image.h:316-346, PNG export via png++
image.h:348-374).  The reference never actually compiles these in (SURVEY.md §2:
dormant), but they are part of its surface; here they are live: the apps' ``imglen``
parameter routes through :func:`resize`, and PNG export needs only stdlib zlib.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def resize(img: np.ndarray, new_len: int) -> np.ndarray:
    """Resize a square grayscale image [H, W] to [new_len, new_len].

    Upsizing pads with zeros around the centre; downsizing area-averages
    (the pad-or-average behavior of image.h:235-314).
    """
    img = np.asarray(img)
    h, w = img.shape
    if new_len == h and new_len == w:
        return img.copy()
    if new_len >= max(h, w):
        out = np.zeros((new_len, new_len), dtype=img.dtype)
        y0 = (new_len - h) // 2
        x0 = (new_len - w) // 2
        out[y0:y0 + h, x0:x0 + w] = img
        return out
    # area-average downscale (handles non-integer ratios by pixel-overlap weights)
    src = img.astype(np.float64)
    ys = np.linspace(0, h, new_len + 1)
    xs = np.linspace(0, w, new_len + 1)
    out = np.empty((new_len, new_len), dtype=np.float64)
    for i in range(new_len):
        y_lo, y_hi = ys[i], ys[i + 1]
        rows = slice(int(np.floor(y_lo)), int(np.ceil(y_hi)))
        wy = np.minimum(np.arange(rows.start, rows.stop) + 1, y_hi) - \
            np.maximum(np.arange(rows.start, rows.stop), y_lo)
        for j in range(new_len):
            x_lo, x_hi = xs[j], xs[j + 1]
            cols = slice(int(np.floor(x_lo)), int(np.ceil(x_hi)))
            wx = np.minimum(np.arange(cols.start, cols.stop) + 1, x_hi) - \
                np.maximum(np.arange(cols.start, cols.stop), x_lo)
            block = src[rows, cols]
            out[i, j] = (wy[:, None] * wx[None, :] * block).sum() / \
                ((y_hi - y_lo) * (x_hi - x_lo))
    if np.issubdtype(img.dtype, np.integer):
        return np.clip(np.round(out), 0, np.iinfo(img.dtype).max).astype(img.dtype)
    return out.astype(img.dtype)


def reduce(img: np.ndarray, factor: int) -> np.ndarray:
    """Block-average reduce by an integer factor (image.h:316-346)."""
    h, w = img.shape
    if h % factor or w % factor:
        raise ValueError(f"image {h}x{w} not divisible by factor {factor}")
    blocks = img.astype(np.float64).reshape(h // factor, factor,
                                            w // factor, factor)
    out = blocks.mean(axis=(1, 3))
    if np.issubdtype(img.dtype, np.integer):
        return np.clip(np.round(out), 0, np.iinfo(img.dtype).max).astype(img.dtype)
    return out.astype(img.dtype)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def write_gray(img: np.ndarray, path: str) -> None:
    """8-bit grayscale PNG export (writeGray, image.h:348-360); stdlib-only."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(np.asarray(arr, dtype=np.float64), 0, 255)
        if arr.max() <= 1.0 and np.asarray(img).dtype.kind == "f":
            arr = arr * 255.0
        arr = arr.astype(np.uint8)
    h, w = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))
    header = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    png = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", header)
           + _png_chunk(b"IDAT", zlib.compress(raw, 9))
           + _png_chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_color(img: np.ndarray, path: str) -> None:
    """8-bit RGB PNG export (writeColor, image.h:362-374)."""
    arr = np.asarray(img)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected [H, W, 3]")
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))
    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    png = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", header)
           + _png_chunk(b"IDAT", zlib.compress(raw, 9))
           + _png_chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
