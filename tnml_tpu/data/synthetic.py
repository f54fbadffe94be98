"""Deterministic synthetic digit images.

The execution environment has no MNIST image files (zero network egress; the reference
checkout ships only the label files).  To keep every training/eval path exercisable with a
*learnable* 10-class task of the same shape (28x28 grayscale, labels 0-9), this module
renders procedural digit glyphs: a 5x7 bitmap font is scaled up, jittered (shift, scale,
shear, thickness), and noised, all driven by a counter-based RNG so that sample ``i`` of a
split is bit-identical across runs and machines.

This replaces no reference component — it is a data *source* plugged underneath the
reference-parity loader (`tnml_tpu.data.mnist`), which prefers real IDX image files
whenever they exist.
"""

from __future__ import annotations

import numpy as np

# 5x7 bitmap font for digits 0..9 (rows top->bottom, '#' = on).
_FONT = {
    0: ["  ###",
        " #  #",
        "#   #",
        "#   #",
        "#   #",
        "#  # ",
        "###  "],
    1: ["  #  ",
        " ##  ",
        "# #  ",
        "  #  ",
        "  #  ",
        "  #  ",
        "#####"],
    2: [" ### ",
        "#   #",
        "    #",
        "   # ",
        "  #  ",
        " #   ",
        "#####"],
    3: ["#### ",
        "    #",
        "    #",
        " ### ",
        "    #",
        "    #",
        "#### "],
    4: ["#  # ",
        "#  # ",
        "#  # ",
        "#####",
        "   # ",
        "   # ",
        "   # "],
    5: ["#####",
        "#    ",
        "#    ",
        "#### ",
        "    #",
        "    #",
        "#### "],
    6: [" ### ",
        "#    ",
        "#    ",
        "#### ",
        "#   #",
        "#   #",
        " ### "],
    7: ["#####",
        "    #",
        "   # ",
        "   # ",
        "  #  ",
        "  #  ",
        "  #  "],
    8: [" ### ",
        "#   #",
        "#   #",
        " ### ",
        "#   #",
        "#   #",
        " ### "],
    9: [" ### ",
        "#   #",
        "#   #",
        " ####",
        "    #",
        "    #",
        " ### "],
}


def _glyphs() -> np.ndarray:
    g = np.zeros((10, 7, 5), dtype=np.float32)
    for digit, rows in _FONT.items():
        for r, row in enumerate(rows):
            for c, ch in enumerate(row):
                if ch == "#":
                    g[digit, r, c] = 1.0
    return g


_GLYPHS = _glyphs()


def _rng(split: str, index: int) -> np.random.Generator:
    # NOT Python hash(): str hashing is salted per process (PYTHONHASHSEED), so
    # hash-seeded streams differ between processes — with the image cache that
    # silently re-labels every cached image under a new label permutation
    # (images from the writer's stream, labels from the reader's).  crc32 is
    # stable everywhere.
    import zlib

    seed = zlib.crc32(f"tnml-synth-v2|{split}".encode())
    return np.random.Generator(np.random.Philox(key=int(seed), counter=index))


def render_digit(label: int, split: str, index: int, size: int = 28) -> np.ndarray:
    """Render one synthetic digit image, uint8 [size, size], deterministically."""
    rng = _rng(split, index)
    glyph = _GLYPHS[label]

    # Target glyph box: ~20x14 at size 28, scaled proportionally, with per-sample jitter.
    scale = (size / 28.0) * rng.uniform(2.4, 3.1)
    h = max(3, int(round(7 * scale)))
    w = max(2, int(round(5 * scale * rng.uniform(0.85, 1.15))))
    shear = rng.uniform(-0.25, 0.25)

    # Upsample with bilinear interpolation + shear, into a float canvas.
    canvas = np.zeros((size, size), dtype=np.float32)
    y0 = (size - h) // 2 + int(round(rng.uniform(-2.5, 2.5)))
    xc = (size - w) // 2 + int(round(rng.uniform(-2.5, 2.5)))
    ys = np.arange(h, dtype=np.float32)
    xs = np.arange(w, dtype=np.float32)
    gy = ys * (7 - 1) / max(h - 1, 1)
    for yi in range(h):
        row_y = gy[yi]
        iy0 = int(np.floor(row_y))
        iy1 = min(iy0 + 1, 6)
        fy = row_y - iy0
        xoff = shear * (yi - h / 2.0)
        gx = xs * (5 - 1) / max(w - 1, 1)
        ix0 = np.floor(gx).astype(np.int64)
        ix1 = np.minimum(ix0 + 1, 4)
        fx = gx - ix0
        row = ((1 - fy) * ((1 - fx) * glyph[iy0, ix0] + fx * glyph[iy0, ix1])
               + fy * ((1 - fx) * glyph[iy1, ix0] + fx * glyph[iy1, ix1]))
        ty = y0 + yi
        if ty < 0 or ty >= size:
            continue
        tx0 = xc + int(round(xoff))
        for xi in range(w):
            tx = tx0 + xi
            if 0 <= tx < size:
                canvas[ty, tx] = max(canvas[ty, tx], row[xi])

    # Thickness: one box-blur pass with random weight makes strokes fatter/thinner.
    blur = rng.uniform(0.45, 0.95)
    padded = np.pad(canvas, 1)
    neigh = (padded[:-2, 1:-1] + padded[2:, 1:-1] + padded[1:-1, :-2] + padded[1:-1, 2:])
    canvas = np.clip(canvas + blur * 0.35 * neigh, 0.0, 1.0)

    # Intensity variation + additive noise, then quantize like real MNIST (uint8).
    peak = rng.uniform(0.75, 1.0)
    noise = rng.normal(0.0, 0.04, size=canvas.shape).astype(np.float32)
    img = np.clip(canvas * peak + noise, 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(np.uint8)


def synth_images(labels: np.ndarray, split: str, size: int = 28) -> np.ndarray:
    """Render a batch of synthetic digits, uint8 [B, size, size]."""
    labels = np.asarray(labels)
    out = np.empty((labels.shape[0], size, size), dtype=np.uint8)
    for i, l in enumerate(labels):
        out[i] = render_digit(int(l), split, i, size=size)
    return out


def synth_labels(n: int, split: str) -> np.ndarray:
    """Balanced deterministic label sequence when no real label files exist."""
    rng = _rng(split, 0)
    labels = np.arange(n, dtype=np.int64) % 10
    return rng.permutation(labels)
