"""Checkpoint artifacts and runtime control files.

Artifact parity with the reference (SURVEY.md §5):
- ``sites``   — shared site metadata, written once at startup and required by every
  downstream app (fixedL.cc:618-632, fulltest.cc:33-40).  Here: a small JSON header.
- ``W`` / ``W%d`` — the weight MPS, written after every sweep and on demand
  (fixedL.cc:565-566, single.cc:53).  Here: an npz payload (ragged float64 cores)
  under the reference's extensionless filenames.
- control files polled during training: ``WRITE_WF`` (checkpoint now, then the file is
  consumed — fixedL.cc:542-548), ``LAMBDA`` (hot-reload the regularizer —
  fixedL.cc:550-559), ``STOP`` (early exit, linear.cc:80-85).
"""

from __future__ import annotations

import io
import json
import os
from typing import Optional

import numpy as np

from tnml_tpu.mps.core import MPS

SITES_FILE = "sites"
WRITE_WF = "WRITE_WF"
LAMBDA_FILE = "LAMBDA"
STOP_FILE = "STOP"


def write_sites(path: str, n: int, d: int) -> None:
    with open(path, "w") as f:
        json.dump({"format": "tnml-sites", "version": 1, "N": int(n), "d": int(d)}, f)


def read_sites(path: str) -> dict:
    with open(path) as f:
        meta = json.load(f)
    if meta.get("format") != "tnml-sites":
        raise ValueError(f"{path}: not a tnml sites file")
    return meta


def save_mps(path: str, mps: MPS) -> None:
    # Cores are stored at their native dtype (f32 off the engine — upcasting to
    # f64 doubles the payload for stored rounding noise) and UNCOMPRESSED:
    # zlib over the flagship's ~180 MB f64 stack cost ~2 s of the per-sweep
    # checkpoint write (round-5 timing split); plain npz is I/O-bound (~0.1 s).
    # load_mps reads either layout, so old f64-compressed checkpoints stay valid.
    payload = {"n": np.asarray(mps.n), "d": np.asarray(mps.d),
               "label_site": np.asarray(-1 if mps.label_site is None else mps.label_site)}
    for j, c in enumerate(mps.cores):
        c = np.asarray(c)
        payload[f"core_{j:05d}"] = c if c.dtype in (np.float32, np.float64) \
            else c.astype(np.float64)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_mps(path: str) -> MPS:
    with open(path, "rb") as f:
        raw = f.read()
    # npz payloads are zip files ("PK\x03\x04").  The reference writes ITensor
    # binary under the SAME extensionless names ("W", "sites") — catch a mixed
    # workdir with a clear message instead of a cryptic numpy error.
    if not raw.startswith(b"PK"):
        raise ValueError(
            f"{path}: not a tnml-tpu checkpoint (npz). This looks like a file "
            f"from another toolchain (e.g. an ITensor binary written by the "
            f"reference C++ programs) — tnml-tpu cannot read those; retrain or "
            f"start from a clean workdir.")
    z = np.load(io.BytesIO(raw))
    n = int(z["n"])
    ls = int(z["label_site"])
    cores = [z[f"core_{j:05d}"] for j in range(n)]
    return MPS(cores, label_site=None if ls < 0 else ls)


def save_vector(path: str, v: np.ndarray) -> None:
    """Dense parameter vector under an extensionless reference filename (V%d)."""
    buf = io.BytesIO()
    np.savez_compressed(buf, v=np.asarray(v, dtype=np.float64))
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_vector(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.load(io.BytesIO(f.read()))["v"]


def poll_control_files(cwd: str = ".") -> dict:
    """Check-and-consume the runtime control files; returns what was found."""
    out = {}
    wf = os.path.join(cwd, WRITE_WF)
    if os.path.exists(wf):
        os.remove(wf)
        out["write_wf"] = True
    lf = os.path.join(cwd, LAMBDA_FILE)
    if os.path.exists(lf):
        try:
            with open(lf) as f:
                out["lambda"] = float(f.read().strip())
        except ValueError:
            pass
        os.remove(lf)
    sf = os.path.join(cwd, STOP_FILE)
    if os.path.exists(sf):
        os.remove(sf)
        out["stop"] = True
    return out
