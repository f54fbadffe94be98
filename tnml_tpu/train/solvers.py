"""Direct solvers for the one-vs-rest (`single`) model family.

Reference: single.h.  These operate on the label-free bond problem
``min_B sum_b (y_b - <v_b, B>)^2 + lambda |B|^2`` where ``v_b`` is the per-image
effective tensor (wings x features), materialized here as a dense design matrix
``Xv [NT, D]`` — the batched analog of the reference's explicit ``Phi`` tensor
(single.h:129-139).

- ``exact_solve``: full SVD pseudo-inverse with spectral floor ``pcut`` and ridge
  ``s/(s^2+lambda)``  (single.h:116-157)
- ``pinv_solve``: rank-r subspace iteration (repeated polar decompositions of
  ``A·V``) then pseudo-inverse on the sketched subspace (single.h:403-517)
- ``noise_split``: density-matrix bond split with the DMRG noise term
  rho = B·B' + noise * sum_t (env-dressed dr·dr')  (single.h:638-672)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _design_matrix(B5, LE, sigL, RE, sigR, xc, x1):
    """Xv [NT, D] with D = a*s*t*r (label-free), rows scaled by exp(sigma)."""
    from tnml_tpu.train.env import unsqueeze_env
    LE, RE = unsqueeze_env(LE), unsqueeze_env(RE)
    xc, x1 = xc.T, x1.T          # [d, B] storage layout
    a, s, t, r, J = B5.shape
    if J != 1 or LE.shape[1] != 1 or RE.shape[1] != 1:
        raise ValueError("direct solvers support the label-free (single) model only")
    Lphi = LE[:, 0, :, None] * xc[:, None, :]        # [B, a, s]
    Rphi = x1[:, :, None] * RE[:, 0, None, :]        # [B, t, r]
    sig = jnp.exp(sigL + sigR)
    Xv = jnp.einsum("bas,btr->bastr", Lphi, Rphi).reshape(LE.shape[0], -1)
    return Xv * sig[:, None]


def exact_solve(B5, LE, sigL, RE, sigR, xc, x1, y, lam, pcut):
    """Full pseudo-inverse ridge solve (single.h:116-157). Returns the new B5."""
    shape = B5.shape
    Xv = _design_matrix(B5, LE, sigL, RE, sigR, xc, x1)
    U, sv, Vt = jnp.linalg.svd(Xv, full_matrices=False)
    sinv = jnp.where(sv > pcut, sv / (sv * sv + lam), 0.0)
    # B = Phi^+ y = V diag(sinv) U^T y
    Bvec = Vt.T @ (sinv * (U.T @ y))
    return Bvec.reshape(shape)


def pinv_solve(B5, LE, sigL, RE, sigR, xc, x1, y, lam, pcut, V0,
               npass: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rank-r sketched pseudo-inverse (single.h:403-517).

    ``V0`` [D, r]: the random start (passed in — no RNG inside jit).  Subspace
    iteration: E = A·V with A = Xv^T Xv, V <- polar(E); stop on |tr(V^T E)| change
    < 1e-4 (single.h:497-504).  Returns (new B5, final V·E trace).
    """
    shape = B5.shape
    Xv = _design_matrix(B5, LE, sigL, RE, sigR, xc, x1)

    def polar(M):
        F, s, G = jnp.linalg.svd(M, full_matrices=False)
        return F @ G

    V = polar(V0)

    def body(carry):
        V, lastVE, i, done = carry
        E = Xv.T @ (Xv @ V)
        F, s, G = jnp.linalg.svd(E, full_matrices=False)
        Vn = F @ G
        VE = jnp.sum(Vn * E)
        done = jnp.abs(VE - lastVE) < 1e-4
        return Vn, VE, i + 1, done

    def cond(carry):
        _, _, i, done = carry
        return (i < npass) & (~done)

    E0 = Xv.T @ (Xv @ V)
    VE0 = jnp.sum(V * E0)
    V, VE, _, _ = jax.lax.while_loop(cond, body, (V, VE0, jnp.int32(0),
                                                  jnp.bool_(False)))
    E = Xv.T @ (Xv @ V)
    F, s, G = jnp.linalg.svd(E, full_matrices=False)
    sinv = jnp.where(s > pcut, s / (s * s + lam), 0.0)
    Einv = F @ (sinv[:, None] * G)            # [D, r]
    yUS = (y[:, None] * (Xv @ V)).sum(axis=0)  # sum over own-label rows: y in {0,1}
    Bvec = Einv @ yUS
    return Bvec.reshape(shape), VE


@partial(jax.jit, static_argnames=("iso_left",))
def noise_split(B5, env, env_sig, cutoff, maxm, minm, noise, iso_left: bool):
    """Density-matrix split with the DMRG noise term (single.h:638-672).

    ``env`` is the wing adjacent to the isometric side (LE when sweeping right, RE
    when sweeping left); ``rho = M M^T + noise * sum_t f_t (E_t E_t^T) x (q_t q_t^T)``
    where ``q_t = E_t · M`` and f_t the per-image scale (the reference dresses dr with
    the same env twice, single.h:651-659).  Returns (wl, wr, rank, truncerr) with the
    isometric side from the top eigenvectors of rho.
    """
    from tnml_tpu.train.env import unsqueeze_env
    env = unsqueeze_env(env)
    a, s, t, r, J = B5.shape
    if J != 1:
        raise ValueError("noise split supports the label-free model only")
    pad = a
    if iso_left:
        M = B5[..., 0].reshape(a * s, t * r)           # rows = (a,s)
        E = env[:, 0, :]                               # [B, a]
        q = jnp.einsum("ba,asC->bsC", E, B5[..., 0].reshape(a, s, t * r))
        G = jnp.einsum("bsC,buC->bsu", q, q)           # [B, d, d]
        f = jnp.exp(4.0 * env_sig)
        rho_noise = jnp.einsum("b,ba,bc,bsu->ascu", f, E, E, G).reshape(a * s, a * s)
    else:
        M = B5[..., 0].reshape(a * s, t * r)           # cols = (t,r): rows of rho
        E = env[:, 0, :]                               # [B, r]
        q = jnp.einsum("br,Ctr->bCt", E, B5[..., 0].reshape(a * s, t, r))
        G = jnp.einsum("bCt,bCu->btu", q, q)
        f = jnp.exp(4.0 * env_sig)
        rho_noise = jnp.einsum("b,btu,br,bc->truc", f, G, E, E).reshape(t * r, t * r)
        M = M.T                                        # rho side = (t,r)

    rho = M @ M.T + noise * rho_noise
    lam_, U = jnp.linalg.eigh(rho)                     # ascending
    lam_ = lam_[::-1]
    U = U[:, ::-1]
    p = jnp.maximum(lam_, 0.0)
    total = jnp.sum(p)
    k = p.shape[0]
    tail = total - jnp.cumsum(p)
    ok = tail <= cutoff * total
    rank = jnp.where(jnp.any(ok), jnp.argmax(ok) + 1, k)
    rank = jnp.maximum(rank, jnp.minimum(minm, k))
    rank = jnp.minimum(rank, maxm)
    mask = jnp.arange(k) < rank
    kept = jnp.sum(jnp.where(mask, p, 0.0))
    truncerr = jnp.where(total > 0, (total - kept) / total, 0.0)
    Um = U * mask[None, :]

    def fit_cols(Mx):
        return Mx[:, :pad] if k >= pad else jnp.pad(Mx, ((0, 0), (0, pad - k)))

    Um = fit_cols(Um)
    other = Um.T @ M                                   # [pad, other-group]
    if iso_left:
        wl = Um.reshape(a, s, pad)
        wr = other.reshape(pad, t, r)
    else:
        wr = Um.reshape(t, r, pad).transpose(2, 0, 1)
        wl = other.reshape(pad, a, s).transpose(1, 2, 0)
    rank = jnp.minimum(rank, pad)
    return wl, wr, rank, truncerr
