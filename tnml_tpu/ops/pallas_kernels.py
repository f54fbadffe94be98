"""Pallas TPU kernels for the hot ops.

Two kernels, each with a pure-jnp reference implementation used as fallback and in
tests (``interpret=True`` makes them runnable on CPU):

- ``phi_featurize``: the local feature map computed ON DEVICE from raw uint8 pixels.
  Hosts with thin device links (networked TPU) ship 1 byte/pixel instead of
  4*d bytes/feature — an 8x transfer cut for d=2 — and the cos/sin runs on the VPU.

- ``cg_pass``: one fused conjugate-gradient data pass for the travelling-label bond
  layout (wings [B,1,m]): pv = <v_b, p>, Ap = sum_b (pv_b sig_b^2) v_b, and pAp in a
  single batch-tiled sweep.  MEASURED RESULT (v5e, B=10000, m=120, L=10, bf16): the
  kernel runs at ~37 ms vs ~2.7 ms for the XLA einsum chain — XLA's fusion and MXU
  scheduling win decisively at these shapes, so this kernel is NOT wired into the hot
  path; it is kept (with interpret-mode tests) as the measured baseline for future
  kernel work.  The lesson matches the Pallas guide's own advice: let XLA fuse what
  it already fuses well.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# phi feature map on device
# ---------------------------------------------------------------------------


def _phi_kernel(px_ref, out_ref, *, feature: str, rescale: float, d: int):
    # Mosaic has no direct uint8->float32 cast; hop through int32
    x = px_ref[:].astype(jnp.int32).astype(jnp.float32) * jnp.float32(rescale / 255.0)
    if feature == "normal":
        out_ref[0] = jnp.cos(jnp.float32(np.pi / 2) * x)
        out_ref[1] = jnp.sin(jnp.float32(np.pi / 2) * x)
    else:  # series
        p = jnp.ones_like(x)
        x4 = x * jnp.float32(0.25)
        for k in range(d):
            out_ref[k] = p
            if k + 1 < d:
                p = p * x4
ALIGN_N, ALIGN_B = 8, 128


@partial(jax.jit, static_argnames=("feature", "d", "rescale", "interpret"))
def phi_featurize(pixels_u8, feature: str = "normal", d: int = 2,
                  rescale: float = 1.0, interpret: bool = False):
    """uint8 pixels [N, B] -> features [N, B, d] float32, computed on device.

    Matches ``tnml_tpu.ops.feature.phi`` on readMNIST-normalized data: the kernel
    divides by 255 internally, so pass ``rescale`` exactly as you would to ``phi``
    (1/255 reproduces the reference's double-normalization quirk).
    """
    n, b = pixels_u8.shape
    TN, TB = 16, 1024
    npad, bpad = _round_up(n, TN), _round_up(b, TB)
    px = jnp.pad(pixels_u8, ((0, npad - n), (0, bpad - b)))
    out = pl.pallas_call(
        partial(_phi_kernel, feature=feature, rescale=rescale, d=d),
        grid=(npad // TN, bpad // TB),
        in_specs=[pl.BlockSpec((TN, TB), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, TN, TB), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, npad, bpad), jnp.float32),
        interpret=interpret,
    )(px)
    return out[:, :n, :b].transpose(1, 2, 0)


def phi_featurize_reference(pixels_u8, feature="normal", d=2, rescale=1.0):
    x = np.asarray(pixels_u8, dtype=np.float64).T / 255.0 * rescale   # [B, N]
    if feature == "normal":
        out = np.stack([np.cos(np.pi / 2 * x), np.sin(np.pi / 2 * x)], axis=-1)
    else:
        out = (x[..., None] / 4.0) ** np.arange(d)
    return np.transpose(out, (1, 0, 2)).astype(np.float32)            # [N, B, d]


# ---------------------------------------------------------------------------
# fused CG data pass (travelling-label layout)
# ---------------------------------------------------------------------------


def _cg_pass_kernel(lphi_ref, rphi_ref, bmat_ref, sel_ref, sig2_ref,
                    pv_ref, ap_ref, pap_ref):
    """Grid over batch tiles; Ap/pAp accumulate across tiles in the outputs.

    Bmat arrives as [AS, L*TR] (label-major columns).  Mosaic has no
    lane-splitting reshapes, so the per-label segment reduction runs as one MXU
    matmul against a 0/1 selector ``sel [L*TR, L]`` (and its transpose for the
    broadcast back) — everything stays 2D and MXU-shaped.
    """
    t = pl.program_id(0)
    L = sel_ref.shape[1]
    lphi = lphi_ref[:]                         # [TB, AS]
    rphi32 = rphi_ref[:].astype(jnp.float32)   # [TB, TR]
    sig2 = sig2_ref[:]                         # [TB, 1]

    @pl.when(t == 0)
    def _():
        ap_ref[:] = jnp.zeros_like(ap_ref)
        pap_ref[0, 0] = 0.0

    u = jnp.dot(lphi, bmat_ref[:], preferred_element_type=jnp.float32)
    # tile rphi along the label-major columns: [TB, L*TR]
    rphi_rep = jnp.concatenate([rphi32] * L, axis=1)
    pv = jnp.dot(u * rphi_rep, sel_ref[:],
                 preferred_element_type=jnp.float32)          # [TB, L]
    pv_ref[:] = pv
    pvw = pv * sig2
    pvw_expand = jnp.dot(pvw, sel_ref[:].T,
                         preferred_element_type=jnp.float32)  # [TB, L*TR]
    m = rphi_rep * pvw_expand
    ap_ref[:] += jnp.dot(lphi.T.astype(jnp.float32), m,
                         preferred_element_type=jnp.float32)
    pap_ref[0, 0] += jnp.sum(pv * pvw)


@partial(jax.jit, static_argnames=("n_labels", "tb", "interpret"))
def cg_pass(Lphi, Rphi, Bmat, sig2, n_labels: int, tb: int = 256,
            interpret: bool = False):
    """Fused CG data pass.

    Lphi [B, AS], Rphi [B, TR] (phi-folded wings, any dtype), Bmat [AS, L*TR]
    (the search direction p, label-MAJOR columns: col = l*TR + t),
    sig2 [B] = exp(2*sigma).
    Returns (pv [B, L] f32, Ap [AS, L*TR] f32, pAp scalar f32) where
    pv = <v_b, p> (unscaled), Ap = sum_b sig2_b pv_b v_b, pAp = sum sig2 pv^2.
    """
    B, AS = Lphi.shape
    L = n_labels
    TR = Bmat.shape[1] // L
    bpad = _round_up(B, tb)
    if bpad != B:
        Lphi = jnp.pad(Lphi, ((0, bpad - B), (0, 0)))
        Rphi = jnp.pad(Rphi, ((0, bpad - B), (0, 0)))
        sig2 = jnp.pad(sig2, (0, bpad - B))
    sel = jnp.repeat(jnp.eye(L, dtype=jnp.float32), TR, axis=0)   # [L*TR, L]
    grid = (bpad // tb,)
    pv, ap, pap = pl.pallas_call(
        _cg_pass_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, AS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, TR), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AS, L * TR), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L * TR, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AS, L * TR), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bpad, L), jnp.float32),
            jax.ShapeDtypeStruct((AS, L * TR), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(Lphi, Rphi, Bmat, sel, sig2[:, None])
    return pv[:B], ap, pap[0, 0]


def cg_pass_reference(Lphi, Rphi, Bmat, sig2, n_labels: int):
    """jnp reference of cg_pass (what XLA runs without the kernel)."""
    B = Lphi.shape[0]
    L = n_labels
    TR = Bmat.shape[1] // L
    B3 = Bmat.astype(jnp.float32).reshape(-1, L, TR)
    U = jnp.einsum("ba,alt->blt", Lphi.astype(jnp.float32), B3)
    pv = jnp.einsum("blt,bt->bl", U, Rphi.astype(jnp.float32))
    pvw = pv * sig2[:, None]
    ap = jnp.einsum("bl,ba,bt->alt", pvw, Lphi.astype(jnp.float32),
                    Rphi.astype(jnp.float32))
    pap = jnp.sum(pv * pvw)
    return pv, ap.reshape(Bmat.shape), pap
