"""Batched evaluators — the reference's fulltest / separate_fulltest programs.

Where the reference contracts one test image at a time through ``toverlap``
(util.h:19-40) inside a round-robin loop (util.h:123-200), the whole test set is
contracted in one batched device sweep over sites: the running state is a
``[B, K, m]`` wing identical to the training environments, so it reuses
``env_extend`` (same kernels, same log-scale hygiene).

Decision rules are reference-exact: weights = |P| per label, predict argmax
(util.h:160-181); separate_fulltest scores per-label MPS overlaps and accumulates
(o-1)^2 / o^2 costs (separate_fulltest.cc:36-44).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tnml_tpu.mps.core import MPS
from tnml_tpu.mps.pack import PackedMPS, pack
from tnml_tpu.train.env import edge_env, env_extend


@jax.jit
def _scan_plain(arr, sig, cores, xs):
    """Sweep a [B,K,m] wing through stacked label-free cores in ONE scan call.

    ``cores``: [k, m, d, m]; ``xs``: [k, d, B].  Same per-site math and log-scale
    hygiene as env_extend(fromleft=True) — including its epilogue-fused matmul
    form: the einsum "bka,bs,asr->bkr" makes XLA materialize the [B,K,d,m]
    outer-product intermediate in HBM (the round-4 env_extend finding,
    .bench/extend_micro.py); d clean [B·K, m] @ [m, m] dots with the per-image
    φ weights in the elementwise epilogue measured 1.8x faster end-to-end on
    the 10k-image eval at m=120 (2162 -> 1193 ms/call, 8,381 images/s;
    .bench/eval_throughput.py, log in .bench/eval_throughput_r4.log)."""

    def body(state, inp):
        a, s = state
        core, x = inp
        nb, K = a.shape[0], a.shape[1]
        d = core.shape[1]
        ef = a.reshape(nb * K, -1)
        acc = None
        for si in range(d):
            term = jnp.matmul(ef, core[:, si, :],
                              preferred_element_type=jnp.float32)
            term = term.reshape(nb, K, -1) * x[si][:, None, None]
            acc = term if acc is None else acc + term
        mx = jnp.max(jnp.abs(acc), axis=(1, 2))
        safe = jnp.where(mx > 0, mx, 1.0).astype(jnp.float32)
        # carry storage dtype = the Evaluator's dtype (bf16 halves the wing
        # traffic for serving; accumulation above stays f32 either way)
        out = (acc / safe[:, None, None]).astype(a.dtype)
        return (out, s + jnp.log(safe)), None

    (arr, sig), _ = lax.scan(body, (arr, sig), (cores, xs))
    return arr, sig


@jax.jit
def _contract_labeled(pre, wlab, post, xs_pre, x_lab, xs_post, edge_arr, edge_sig):
    """Two-sided contraction of a labeled MPS against a batch — the reference's
    own toverlap order (util.h:19-40: site N down to cent, then 1 up to cent).
    Both wings stay label-FREE [B, 1, m]; the nl-dim label axis appears only in
    the single bilinear at the label core.  A left-to-right pass instead drags a
    [B, nl, m] wing through every post-label site — 10x the HBM traffic on half
    the chain; going two-sided measured 5.9x end-to-end on the 10k-image eval
    (1193 -> 203 ms/call, .bench/eval_throughput_r4.log)."""
    from tnml_tpu.train.env import unsqueeze_env
    arrL, sigL = _scan_plain(unsqueeze_env(edge_arr), edge_sig, pre, xs_pre)
    # right wing: same scan body on reversed, index-transposed cores
    arrR, sigR = _scan_plain(unsqueeze_env(edge_arr), jnp.zeros_like(edge_sig),
                             jnp.flip(post, axis=0).transpose(0, 3, 2, 1),
                             jnp.flip(xs_post, axis=0))
    aL, aR = arrL[:, 0, :], arrR[:, 0, :]
    m, d, L = wlab.shape[0], wlab.shape[1], wlab.shape[3]
    acc = None
    for si in range(d):
        term = jnp.matmul(aL, wlab[:, si, :, :].reshape(m, -1),
                          preferred_element_type=jnp.float32)
        term = term.reshape(aL.shape[0], -1, L) * x_lab[si][:, None, None]
        acc = term if acc is None else acc + term
    P = jnp.sum(acc * aR.astype(jnp.float32)[:, :, None], axis=1)
    return P, sigL + sigR


def contract_batch(packed: PackedMPS, X: np.ndarray, dtype=jnp.float32):
    """Contract the MPS against every image: returns (P [B, L or 1], logscale [B]).

    True model outputs are ``P * exp(logscale)[:, None]``; argmax decisions are
    scale-free per image.  Fused: the whole test-set contraction is at most three
    device calls (scan | label core | scan), not N sequential env_extend dispatches.
    """
    if X.shape[1] != packed.n:
        raise ValueError("X length mismatch")
    nb = X.shape[0]
    xs = jnp.asarray(np.ascontiguousarray(np.transpose(X, (1, 2, 0))), dtype=dtype)
    return _contract_packed(packed, xs, nb, dtype)


def _contract_packed(packed: PackedMPS, xs, nb: int, dtype=jnp.float32):
    from tnml_tpu.train.env import unsqueeze_env
    from tnml_tpu.utils.precision import matmul_precision_scope
    ls = packed.label_site
    edge = edge_env(nb, packed.pad, dtype)
    # evaluation needs true-f32 contractions (the near-degenerate overlap
    # signal, utils/precision.py) — pinned as a trace-local SCOPE so it never
    # rewrites the process-global precision an engine configured
    with matmul_precision_scope():
        if ls is None:
            cores = jnp.stack(packed.cores)
            arr, sig = _scan_plain(unsqueeze_env(edge[0]), edge[1], cores, xs)
            return arr[:, :, 0], sig
        pre = jnp.stack(packed.cores[:ls]) if ls > 0 else \
            jnp.zeros((0, packed.pad, packed.d, packed.pad), dtype)
        post = jnp.stack(packed.cores[ls + 1:]) if ls + 1 < packed.n else \
            jnp.zeros((0, packed.pad, packed.d, packed.pad), dtype)
        return _contract_labeled(pre, packed.cores[ls], post,
                                 xs[:ls], xs[ls], xs[ls + 1:], edge[0], edge[1])


@dataclass
class TestReport:
    n_total: int
    n_correct: int
    per_digit_total: np.ndarray
    per_digit_correct: np.ndarray
    predictions: np.ndarray
    costs: Optional[np.ndarray] = None   # separate_fulltest per-digit costs

    @property
    def accuracy(self) -> float:
        return self.n_correct / max(self.n_total, 1)

    def print_summary(self) -> None:
        """Same shape of output as util.h:186-199."""
        ninc = self.n_total - self.n_correct
        print(f"{self.n_correct}/{self.n_total} correct "
              f"({100.0 * self.accuracy:.2f}%), {ninc}/{self.n_total} incorrect "
              f"({100.0 * ninc / max(self.n_total, 1):.2f}%)")
        for l in range(len(self.per_digit_total)):
            nt = int(self.per_digit_total[l])
            if nt == 0:
                continue
            nc = int(self.per_digit_correct[l])
            ni = nt - nc
            print(f"  Digit {l} {nc}/{nt} correct ({100.0 * nc / nt:.2f}%), "
                  f"{ni}/{nt} incorrect ({100.0 * ni / nt:.2f}%)")
        print(f"Total # test images = {self.n_total}")
        if self.costs is not None:
            print("Cost functions:")
            tc = 0.0
            for l in range(len(self.costs)):
                tc += float(self.costs[l])
                print(f"  Digit {l} C = {self.costs[l]:.20f}")
            print(f"Total C = {tc:.20f}")


def full_test(w: MPS, X: np.ndarray, labels: np.ndarray,
              pad: Optional[int] = None) -> TestReport:
    """Multiclass evaluation of a labeled MPS (fulltest.cc / util.h fullTest)."""
    if w.label_site is None:
        raise ValueError("full_test expects a labeled MPS (fixedL-style)")
    packed = pack(w, pad or max(w.max_bond(), 2))
    P, _ = contract_batch(packed, X)
    return _report(np.abs(np.asarray(P)), labels)


def _report(weights: np.ndarray, labels: np.ndarray) -> TestReport:
    pred = weights.argmax(axis=1)              # fabs scoring, util.h:167
    correct = pred == labels
    nl = max(weights.shape[1], int(labels.max()) + 1 if len(labels) else 1)
    per_tot = np.bincount(labels, minlength=nl)
    per_cor = np.bincount(labels[correct], minlength=nl)
    return TestReport(n_total=len(labels), n_correct=int(correct.sum()),
                      per_digit_total=per_tot, per_digit_correct=per_cor,
                      predictions=pred)


class Evaluator:
    """Reusable test-set evaluator: features upload once; evaluate device-resident
    cores (e.g. ``engine.packed()``) without any host round-trip of the model.

    The in-training analog of running fulltest between sweeps.
    """

    def __init__(self, X: np.ndarray, labels: np.ndarray, dtype=jnp.float32):
        self.xs = jnp.asarray(np.ascontiguousarray(np.transpose(X, (1, 2, 0))),
                              dtype=dtype)
        self.dtype = dtype
        self.labels = np.asarray(labels)
        self.nb = X.shape[0]

    def evaluate(self, packed: PackedMPS) -> TestReport:
        P, _ = _contract_packed(packed, self.xs, self.nb, self.dtype)
        return _report(np.abs(np.asarray(P)), self.labels)

    def evaluate_engine(self, eng) -> TestReport:
        """Evaluate a live engine; after fused sweeps this contracts the
        stacked DEVICE buffers directly (no 180 MB core fetch + re-upload per
        evaluation — the dotest-per-sweep path at full scale)."""
        stacks = None
        if hasattr(eng, "fused_eval_stacks"):
            stacks = eng.fused_eval_stacks()
        if stacks is None:
            return self.evaluate(eng.packed())
        from tnml_tpu.utils.precision import matmul_precision_scope
        pre, wlab, post = stacks
        k = pre.shape[0]
        edge = edge_env(self.nb, eng.pad, self.dtype)
        with matmul_precision_scope():
            P, _ = _contract_labeled(pre, wlab, post, self.xs[:k], self.xs[k],
                                     self.xs[k + 1:], edge[0], edge[1])
        return _report(np.abs(np.asarray(P)), self.labels)


def separate_full_test(ws: Sequence[MPS], X: np.ndarray,
                       labels: np.ndarray) -> TestReport:
    """One-vs-rest evaluation of 10 label-free MPS (separate_fulltest.cc:7-84)."""
    nb = X.shape[0]
    outs = np.zeros((nb, len(ws)))
    for n, w in enumerate(ws):
        if w.label_site is not None:
            raise ValueError(f"W{n}: separate_full_test expects label-free MPS")
        packed = pack(w, max(w.max_bond(), 2))
        P, sig = contract_batch(packed, X)
        outs[:, n] = np.asarray(P)[:, 0] * np.exp(np.asarray(sig))
    weights = np.abs(outs)
    pred = weights.argmax(axis=1)
    correct = pred == labels
    onehot = np.eye(len(ws))[labels]
    costs = ((outs - onehot) ** 2).sum(axis=0)  # (o-1)^2 own label, o^2 others
    per_tot = np.bincount(labels, minlength=len(ws))
    per_cor = np.bincount(labels[correct], minlength=len(ws))
    return TestReport(n_total=nb, n_correct=int(correct.sum()),
                      per_digit_total=per_tot, per_digit_correct=per_cor,
                      predictions=pred, costs=costs)
