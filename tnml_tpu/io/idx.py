"""IDX (MNIST) binary file format reader/writer.

Format parity with the reference's vendored reader (mllib/mnist.h:38-101):
big-endian 32-bit header words, magic 0x00000803 for rank-3 image files and
0x00000801 for rank-1 label files.  The general IDX layout is::

    [0x00] [0x00] [dtype byte] [ndim byte] [dim0 be32] ... [dimK be32] [payload]

The reference only ever reads ubyte (dtype 0x08) rank-1/rank-3 files; this module
supports the full dtype table so the framework can also round-trip its own arrays.
"""

from __future__ import annotations

import gzip
import struct
from typing import Union

import numpy as np

_DTYPES = {
    0x08: np.dtype(">u1"),
    0x09: np.dtype(">i1"),
    0x0B: np.dtype(">i2"),
    0x0C: np.dtype(">i4"),
    0x0D: np.dtype(">f4"),
    0x0E: np.dtype(">f8"),
}
_CODES = {v.newbyteorder("="): k for k, v in _DTYPES.items()}

MAGIC_IMAGES = 0x00000803  # mllib/mnist.h:164
MAGIC_LABELS = 0x00000801  # mllib/mnist.h:206


def _open(path: str, mode: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_idx(path: str) -> np.ndarray:
    """Read an IDX file (optionally .gz) into a native-endian numpy array."""
    with _open(path, "rb") as f:
        header = f.read(4)
        if len(header) != 4 or header[0] != 0 or header[1] != 0:
            raise ValueError(f"{path}: not an IDX file (bad magic prefix)")
        dtype_code, ndim = header[2], header[3]
        if dtype_code not in _DTYPES:
            raise ValueError(f"{path}: unknown IDX dtype code 0x{dtype_code:02x}")
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        count = int(np.prod(dims)) if dims else 0
        dt = _DTYPES[dtype_code]
        payload = f.read(count * dt.itemsize)
        if len(payload) != count * dt.itemsize:
            raise ValueError(f"{path}: truncated IDX payload")
        arr = np.frombuffer(payload, dtype=dt, count=count).reshape(dims)
        return arr.astype(dt.newbyteorder("="))


def write_idx(path: str, arr: np.ndarray) -> None:
    """Write a numpy array as an IDX file (inverse of :func:`read_idx`)."""
    arr = np.asarray(arr)
    key = arr.dtype.newbyteorder("=")
    if key not in _CODES:
        raise ValueError(f"dtype {arr.dtype} not representable in IDX")
    code = _CODES[key]
    with _open(path, "wb") as f:
        f.write(bytes([0, 0, code, arr.ndim]))
        f.write(struct.pack(f">{arr.ndim}I", *arr.shape))
        f.write(arr.astype(_DTYPES[code]).tobytes())


def expected_magic(arr_or_ndim: Union[np.ndarray, int]) -> int:
    ndim = arr_or_ndim if isinstance(arr_or_ndim, int) else np.asarray(arr_or_ndim).ndim
    return (0x08 << 8) | ndim
