"""Batched environment tensors ("wings") on device.

The reference projects each training image into the frozen wings of W and spools the
resulting per-image tensors to disk in batches (TrainStates.init/shiftE,
fixedL.cc:122-233, files proj_images/B%03dE%05d).  Here environments are batched
arrays ``[B, K, m]`` (K = 10 when the wing contains the label core, else 1) that stay
device-resident and are *shifted* one site at a time, never rebuilt.

Numerical hygiene: the reference runs in float64 with ITensor scale bookkeeping; over
784 sites raw products under/overflow float32.  Every environment carries a per-image
log-scale ``sigma`` ([B]); after each extension the tensor is renormalized to max-abs 1
and ``sigma`` absorbs the log.  This is a uniform linear rescaling per image (NOT the
nonlinear normalization the reference warns against, single.h:705-708) — downstream
consumers multiply back ``exp(sigma_L + sigma_R)``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Env = Tuple[jnp.ndarray, jnp.ndarray]  # (arr [B, K, m], sigma [B])


def edge_env(batch: int, pad: int, dtype=jnp.float32) -> Env:
    """The trivial dim-1 boundary environment, padded: one-hot at bond index 0.

    Per-image log-scales are always float32, whatever the wing storage dtype."""
    arr = jnp.zeros((batch, 1, pad), dtype=dtype).at[:, 0, 0].set(1.0)
    return arr, jnp.zeros((batch,), jnp.float32)


@partial(jax.jit, static_argnames=("fromleft", "out_dtype"))
def env_extend(env: jnp.ndarray, sigma: jnp.ndarray, x: jnp.ndarray,
               core: jnp.ndarray, fromleft: bool, out_dtype=None) -> Env:
    """Extend a wing by one site: E' = E · (φ(x)·W_site)  (fixedL.cc:144-150,223-229).

    ``core`` rank 3 ([m,d,m]) keeps K; rank 4 ([m,d,m,L]) injects the label axis
    (K: 1 -> L).  ``fromleft=True`` grows a left wing (contract the core's left bond),
    else a right wing.  ``out_dtype`` (e.g. bfloat16) controls wing STORAGE only —
    contraction math stays in the compute dtype; per-image scales stay float32.
    """
    if core.ndim == 3:
        if fromleft:
            out = jnp.einsum("bka,bs,asr->bkr", env, x, core)
        else:
            out = jnp.einsum("bkr,bs,asr->bka", env, x, core)
    else:
        if env.shape[1] != 1:
            raise ValueError("wing already carries a label axis")
        if fromleft:
            out = jnp.einsum("bka,bs,asrl->bklr", env, x, core)
        else:
            out = jnp.einsum("bkr,bs,asrl->bkla", env, x, core)
        out = out.reshape(out.shape[0], -1, out.shape[-1])
    mx = jnp.max(jnp.abs(out), axis=(1, 2))
    safe = jnp.where(mx > 0, mx, 1.0)
    out = out / safe[:, None, None]
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out, sigma + jnp.log(safe)
