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
from jax import lax

Env = Tuple[jnp.ndarray, jnp.ndarray]  # (arr [B, K, m], sigma [B])


def squeeze_env(arr: jnp.ndarray) -> jnp.ndarray:
    """Storage form: drop a K=1 axis.  A [B, 1, m] array places the size-1 axis in
    the TPU sublane position, which tiling pads 8-16x in HBM; [B, m] tiles cleanly.
    """
    return arr[:, 0, :] if arr.ndim == 3 and arr.shape[1] == 1 else arr


def unsqueeze_env(arr: jnp.ndarray) -> jnp.ndarray:
    """Compute form: restore the K axis (free inside jit)."""
    return arr[:, None, :] if arr.ndim == 2 else arr


def edge_env(batch: int, pad: int, dtype=jnp.float32) -> Env:
    """The trivial dim-1 boundary environment, padded: one-hot at bond index 0.

    Returned in squeezed [B, pad] storage form; per-image log-scales are always
    float32, whatever the wing storage dtype."""
    arr = jnp.zeros((batch, pad), dtype=dtype).at[:, 0].set(1.0)
    return arr, jnp.zeros((batch,), jnp.float32)


@partial(jax.jit, static_argnames=("c", "env_dtype"))
def init_wing_table(cores_st, label_core, xs, c: int, env_dtype=None):
    """ALL right wings (sites 2..N-1) in ONE device call (TrainStates::init,
    fixedL.cc:122-157) — the fused replacement for N-2 sequential env_extend
    dispatches (~4 ms each through a networked TPU).

    ``cores_st`` [N, pad, d, pad] site-aligned plain cores (row c ignored when a
    label core is present); ``label_core`` [pad, d, pad, L] or None; ``c`` the
    label site (-1 when none).  Returns (site_tuple_of_arrs, site_tuple_of_sigs)
    for sites 2..N-1 in ascending order; wings covering the label core have K=L.
    The sequential recursion stays (it is the algorithm and is compute-trivial);
    what is removed is the per-site dispatch, not the chain.
    """
    n, pad = cores_st.shape[0], cores_st.shape[1]
    nb = xs.shape[2]
    dt = env_dtype or jnp.float32
    carry = edge_env(nb, pad, jnp.float32)

    def ext(cr, inp):
        core, x = inp
        # f32 carry; stored wings quantize ONCE at emission (per-site
        # re-quantization compounds bf16 rounding over the N-site chain)
        out = env_extend(cr[0], cr[1], x, core, fromleft=False)
        return out, (out[0].astype(dt), out[1])

    lo = c + 1 if (label_core is not None and c >= 2) else 2
    carry, (pe, ps) = lax.scan(ext, carry, (cores_st[lo:], xs[lo:]),
                               reverse=True)
    arrs = [pe[i] for i in range(n - lo)]      # site lo+i
    sigs = [ps[i] for i in range(n - lo)]
    if label_core is not None and c >= 2:
        lab = env_extend(carry[0], carry[1], xs[c], label_core,
                         fromleft=False)
        arrs.insert(0, lab[0].astype(dt))
        sigs.insert(0, lab[1])
        if c > 2:
            _, (le, ls) = lax.scan(ext, lab, (cores_st[2:c], xs[2:c]),
                                   reverse=True)
            arrs = [le[i] for i in range(c - 2)] + arrs
            sigs = [ls[i] for i in range(c - 2)] + sigs
    return tuple(arrs), tuple(sigs)


@partial(jax.jit, static_argnames=("fromleft", "out_dtype", "fast",
                                   "normalize"))
def env_extend(env: jnp.ndarray, sigma: jnp.ndarray, x: jnp.ndarray,
               core: jnp.ndarray, fromleft: bool, out_dtype=None,
               fast: bool = False, normalize: bool = True) -> Env:
    """Extend a wing by one site: E' = E · (φ(x)·W_site)  (fixedL.cc:144-150,223-229).

    ``core`` rank 3 ([m,d,m]) keeps K; rank 4 ([m,d,m,L]) injects the label axis
    (K: 1 -> L).  ``fromleft=True`` grows a left wing (contract the core's left bond),
    else a right wing.  ``out_dtype`` (e.g. bfloat16) controls wing STORAGE only —
    contraction math stays in the compute dtype; per-image scales stay float32.
    Accepts the squeezed [B, m] storage form; the output is returned SQUEEZED when
    K == 1 (see squeeze_env).  ``x`` arrives in [d, B] storage layout (lanes =
    batch; a [B, d] layout pads d=2 lanes to 128 — a 64x HBM waste).

    ``fast=True`` pins the contraction to DEFAULT matmul precision (single-pass
    bf16 operands, f32 accumulation) regardless of the global policy.  Used for
    the blocked engine's per-sweep wing REBUILDS, whose outputs feed bf16-
    quantized consumption anyway: under the global 'highest' policy the rebuild
    was 6-pass f32 work discarded by the storage rounding — 67% of the fixed
    full-set sweep (.bench/PROFILE_r3.md).  On CPU, precision is a no-op
    (contractions are always f32), so blocked==resident parity tests are
    unaffected.
    """
    prec = jax.lax.Precision.DEFAULT if fast else None
    env = unsqueeze_env(env)
    nb, K = env.shape[0], env.shape[1]
    d = x.shape[0]
    # Contraction written as d clean [B*K, m] @ [m, m_out] matmuls with the
    # per-image phi weights applied in the dots' elementwise epilogue.  The
    # einsum form ("bkr,bs,asr->bka") makes XLA materialize the [B, K, d, m]
    # outer-product intermediate in HBM — measured 13.1 ms/extend at full-set
    # labelled shapes vs 2.3 ms (f32) / 1.0 ms (bf16 wings) for this form, a
    # 6-13x HBM-traffic cut on the blocked engine's dominant op
    # (.bench/extend_micro.py, .bench/r4_quality_chain.log).
    if core.ndim == 3:
        mats = [core[:, s, :] if fromleft else core[:, s, :].T
                for s in range(d)]                      # [m_in, m_out]
    else:
        if K != 1:
            raise ValueError("wing already carries a label axis")
        L = core.shape[3]
        if fromleft:
            # out[b, (l), r]: env[b, a] @ core[a, s, :, l] with l MAJOR in cols
            mats = [core[:, s, :, :].transpose(0, 2, 1).reshape(core.shape[0], -1)
                    for s in range(d)]                  # [a, L*r]
        else:
            # out[b, (l), a]: env[b, r] @ core[:, s, r, l] with l MAJOR in cols
            mats = [core[:, s, :, :].transpose(1, 2, 0).reshape(core.shape[2], -1)
                    for s in range(d)]                  # [r, L*a]
    ef = env.reshape(nb * K, -1).astype(jnp.float32)
    acc = None
    for s in range(d):
        term = jnp.matmul(ef, mats[s], precision=prec).reshape(nb, K, -1)
        term = term * x[s][:, None, None]
        acc = term if acc is None else acc + term
    out = acc if core.ndim == 3 else acc.reshape(nb, L, -1)
    if normalize:
        # per-image max-normalization, scale tracked in sigma.  Skippable
        # (normalize=False) over short chains of near-isometric cores — the
        # scale rides in the values instead, mathematically identical, and
        # floating-point precision is scale-invariant; saves the full
        # [B, K, m] max+div passes per extend (blocked rebuilds).
        mx = jnp.max(jnp.abs(out), axis=(1, 2))
        safe = jnp.where(mx > 0, mx, 1.0)
        out = out / safe[:, None, None]
        sigma = sigma + jnp.log(safe)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return squeeze_env(out), sigma


@partial(jax.jit, static_argnames=("dtype",))
def cast_wing(arr: jnp.ndarray, dtype) -> jnp.ndarray:
    """Quantize a wing for table storage (one rounding; see SweepEngine._hot_or_get)."""
    return arr.astype(dtype)
