"""Pallas TPU kernel: the ENTIRE per-bond CG solve in one fused kernel.

Why.  Per bond, the XLA path (bond.cg_bond) runs ``2 + 2*npass`` batched data
passes; each materializes a ``[B, m*d*L]`` f32 intermediate (~565 MB at the
full 58,862-image set) to HBM — measured ~1 ms per stage, ~5.4 ms per bond,
plus ~1 ms of small-op overhead from the while_loop machinery.  This kernel
holds the CG state (B, r, p, Ap — [240, 2400] f32 at m=120) in VMEM across a
``(npass+2, batch-tiles)`` grid: per pass the only HBM traffic is the wing
tiles themselves (bf16 [TB, m]), the intermediates never leave VMEM, and the
scalar recurrence (alpha/beta/|r|^2) runs in SMEM at row boundaries.

Scope: label-on-core layouts (moving-label fixedL: J=10; label-free `single`
and fixed-mode segments: J=1) with the `fast_conj_exact` recurrence
(bond.cg_bond fast_exact=True), bf16 MXU operands + f32 accumulation — the
headline configuration (precision='default').  Other methods, wing-label
layouts, and precision='highest' use the XLA path (bond.cg_bond).

Matrix layout (Mosaic-friendly: all lane-dim reshapes are static concats over
the tiny physical dim d and label dim J):
  row  x = (s, a):    x = s*m + a                      X = d*m
  col  z = (j, t, r): z = (j*d + t)*m + r              Z = J*d*m
  Bmat[x, z] = B5[a, s, t, r, j]   (B5 <-> Bmat via transpose(1,0,4,2,3))
  Lphi[b, x] = xc[b, s] * LE[b, a]     (built in-kernel per tile)
  Rphi[b, (t,r)] = x1[b, t] * RE[b, r];  Rrep = Rphi tiled J times over lanes

Semantics mirror bond.cg_bond (fixedL.cc:349-445 parity: un-NT-normalized
gradient, A = sum_b sig_b^2 v_b v_b^T + lam, exact recurrence
r <- r - a(Ap + lam p), Fletcher-Reeves beta, cconv early exit).

MEASURED (v5e, B=58862, m=120, J=10, npass=4, honest in-jit chain timing —
block_until_ready does not sync through the axon tunnel): 5.3 ms/solve at
tb=1024 vs ~4.4 ms for the XLA path measured in-scan.  The kernel is
VPU-bound on the per-tile [TB, Z] elementwise work (P reduction + U build,
~3 passes/row) while the MXU floor is 1.7 ms; Mosaic executes grid steps
sequentially so VPU and MXU do not overlap across tiles.  NOT wired into the
hot path yet — kept with interpret-mode tests (tests/test_pallas.py) as the
measured baseline; the XLA sweep got its win from shifted cost reporting and
lazy writeback instead (train/step.py, train/engine.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


# stats vector slots (second output, [1, O_NS + 2*npass])
O_R0, O_PASSES, O_COST0, O_FCOST, O_DONE, O_NS = 0, 1, 2, 3, 4, 8


def _cg_kernel(le_ref, re_ref, xc_ref, x1_ref, sig_ref, y_ref, bmat_ref,
               hyp_ref, bout_ref, stats_ref,
               matb, ps, rs, aps, acc,
               *, npass: int, d: int, J: int, check_r0: bool):
    """Grid (npass+2, T), row-major (all tiles of row s before row s+1).

    Row 0 accumulates the initial gradient; rows 1..npass accumulate Ap/pAp
    for the current direction p; row npass+1 only applies the final B update.
    Row boundaries (t == 0) consume the previous row's accumulators.

    bout_ref doubles as the resident f32 B state.  matb is the bf16 operand
    the tile matmuls read (B during row 0, p during rows 1..npass) — cast
    once per row instead of once per tile.
    acc (SMEM): 0=rr, 1=pAp-acc, 2=cost0-acc, 3=done, 4=passes, 5=fcost.
    """
    s = pl.program_id(0)
    t = pl.program_id(1)
    lam = hyp_ref[0, 0]
    cconv = hyp_ref[0, 1]

    # ---------------- row boundaries (t == 0) ----------------
    @pl.when((s == 0) & (t == 0))
    def _init():
        bout_ref[:] = bmat_ref[:]
        matb[:] = bmat_ref[:].astype(jnp.bfloat16)
        acc[0] = 0.0
        acc[1] = 0.0
        acc[2] = 0.0
        acc[3] = 0.0
        acc[4] = 0.0
        for i in range(npass):
            stats_ref[0, O_NS + i] = 0.0          # fast mode: costs report 0
            stats_ref[0, O_NS + npass + i] = 0.0

    @pl.when((s == 1) & (t == 0))
    def _after_grad():
        # finish r0 = g - lam*B; cost0 = sum dP^2 + lam|B|^2; p = r
        Bv = bout_ref[:]
        r = rs[:] - lam * Bv
        rs[:] = r
        rr0 = jnp.sum(r * r)
        acc[0] = rr0
        cost0 = acc[2] + lam * jnp.sum(Bv * Bv)
        stats_ref[0, O_COST0] = cost0
        acc[5] = cost0
        stats_ref[0, O_R0] = jnp.sqrt(rr0)
        if check_r0:
            acc[3] = jnp.where(jnp.sqrt(rr0) < cconv, 1.0, 0.0)
        ps[:] = r
        matb[:] = r.astype(jnp.bfloat16)
        acc[1] = 0.0

    @pl.when((s >= 2) & (t == 0))
    def _after_pass():
        done = acc[3] > 0.5
        last_row = s == (npass + 1)

        @pl.when(jnp.logical_not(done))
        def _():
            rr = acc[0]
            p = ps[:]
            pAp = acc[1] + lam * jnp.sum(p * p)
            alpha = rr / pAp
            bout_ref[:] = bout_ref[:] + alpha * p
            acc[5] = acc[5] - alpha * rr          # exact line-search identity
            acc[4] = acc[4] + 1.0
            idx = s - 2                           # completed pass index

            @pl.when(jnp.logical_not(last_row))
            def _tail():
                nr = rs[:] - alpha * (aps[:] + lam * p)
                rs[:] = nr
                nrr = jnp.sum(nr * nr)
                beta = nrr / rr
                pn = nr + beta * p
                ps[:] = pn
                matb[:] = pn.astype(jnp.bfloat16)
                acc[0] = nrr
                acc[3] = jnp.where(jnp.sqrt(nrr) < cconv, 1.0, 0.0)
                stats_ref[0, O_NS + npass + idx] = jnp.sqrt(nrr)

            @pl.when(last_row)
            def _last():
                stats_ref[0, O_NS + npass + idx] = jnp.sqrt(rr)

        acc[1] = 0.0

    @pl.when((s == npass + 1) & (t == 0))
    def _finish():
        stats_ref[0, O_PASSES] = acc[4]
        stats_ref[0, O_FCOST] = acc[5]
        stats_ref[0, O_DONE] = acc[3]

    # ---------------- tile work ----------------
    @pl.when((s <= npass) & (acc[3] < 0.5))
    def _tile():
        le = le_ref[:]
        re_ = re_ref[:]
        xc = xc_ref[:]
        x1 = x1_ref[:]
        Lphi = jnp.concatenate([xc[:, k:k + 1] * le for k in range(d)],
                               axis=1).astype(jnp.bfloat16)    # [TB, X]
        Rphi = jnp.concatenate([x1[:, k:k + 1] * re_ for k in range(d)],
                               axis=1).astype(jnp.bfloat16)    # [TB, dm]
        sig = sig_ref[:]                                       # [TB, 1] f32
        T1 = jnp.dot(Lphi, matb[:],
                     preferred_element_type=jnp.float32)       # [TB, Z]
        ZJ = T1.shape[1] // J
        # P[b, j] = sum_z T1[b, (j,:)] * Rphi[b, :] — multiply fused into the
        # per-label reduction, no [TB, Z] product materialized
        Rf = Rphi.astype(jnp.float32)
        P = jnp.concatenate(
            [jnp.sum(T1[:, j * ZJ:(j + 1) * ZJ] * Rf, axis=1, keepdims=True)
             for j in range(J)], axis=1)                       # [TB, J]
        P = P * sig
        # w: row 0 -> dP*sig (gradient weights); rows >=1 -> pv*sig (Ap)
        dP = y_ref[:] - P
        w = jnp.where(s == 0, dP, P) * sig

        @pl.when(s == 0)
        def _():
            acc[2] += jnp.sum(dP * dP)

        @pl.when(s != 0)
        def _():
            acc[1] += jnp.sum(P * P)

        # U[:, (j,:)] = w[:, j] * Rphi — built directly in bf16, one pass
        wb = w.astype(jnp.bfloat16)
        U = jnp.concatenate([wb[:, j:j + 1] * Rphi for j in range(J)],
                            axis=1)                            # [TB, Z] bf16
        g = jnp.dot(Lphi.T, U, preferred_element_type=jnp.float32)  # [X, Z]

        @pl.when(s == 0)
        def _acc_r():
            @pl.when(t == 0)
            def _():
                rs[:] = g
            @pl.when(t != 0)
            def _():
                rs[:] = rs[:] + g

        @pl.when(s != 0)
        def _acc_ap():
            @pl.when(t == 0)
            def _():
                aps[:] = g
            @pl.when(t != 0)
            def _():
                aps[:] = aps[:] + g


@partial(jax.jit, static_argnames=("npass", "check_r0", "tb", "interpret"))
def cg_solve(B5, LE, sigL, RE, sigR, xc, x1, Y, lam, cconv,
             npass: int, check_r0: bool = False, tb: int = 256,
             interpret: bool = False):
    """Fused CG solve (fast_conj_exact recurrence), label-on-core layouts.

    Args mirror bond.cg_bond: B5 [a,s,t,r,J]; LE/RE [B, m] label-free squeezed
    wings (any float dtype); sigL/sigR [B] log-scales; xc/x1 [d, B] features;
    Y [B, J] targets.  Returns the CGResult fields
    (B5', passes, r0norm, costs[npass], rnorms[npass], cost0, est_cost).
    """
    a, s_, t_, r_, J = B5.shape
    m, d = a, s_
    X, Z = d * m, J * d * m
    B = LE.shape[0]
    Bp = _ceil(B, tb) * tb

    Bmat = B5.transpose(1, 0, 4, 2, 3).reshape(X, Z)
    sig2 = jnp.exp((sigL + sigR).astype(jnp.float32))[:, None]

    def padb(arr):
        if Bp == B:
            return arr
        return jnp.pad(arr, ((0, Bp - B),) + ((0, 0),) * (arr.ndim - 1))

    args = (padb(LE), padb(RE),
            padb(xc.T.astype(jnp.float32)), padb(x1.T.astype(jnp.float32)),
            padb(sig2), padb(Y.astype(jnp.float32).reshape(B, J)),
            Bmat, jnp.array([[lam, cconv]], jnp.float32))

    T = Bp // tb
    NS = O_NS + 2 * npass
    tspec = lambda w: pl.BlockSpec((tb, w), lambda s, t: (t, 0),
                                   memory_space=pltpu.VMEM)
    out, stats = pl.pallas_call(
        partial(_cg_kernel, npass=npass, d=d, J=J, check_r0=check_r0),
        grid=(npass + 2, T),
        in_specs=[
            tspec(m), tspec(m), tspec(d), tspec(d), tspec(1), tspec(J),
            pl.BlockSpec((X, Z), lambda s, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda s, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((X, Z), lambda s, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NS), lambda s, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((X, Z), jnp.float32),
            jax.ShapeDtypeStruct((1, NS), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((X, Z), jnp.bfloat16),   # matb: B (row 0) / p (rows 1+)
            pltpu.VMEM((X, Z), jnp.float32),    # ps
            pltpu.VMEM((X, Z), jnp.float32),    # rs
            pltpu.VMEM((X, Z), jnp.float32),    # aps
            pltpu.SMEM((8,), jnp.float32),      # acc
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    B5_out = out.reshape(d, m, J, d, m).transpose(1, 0, 3, 4, 2)
    st = stats[0]
    return (B5_out, st[O_PASSES].astype(jnp.int32), st[O_R0],
            st[O_NS:O_NS + npass], st[O_NS + npass:O_NS + 2 * npass],
            st[O_COST0], st[O_FCOST])
