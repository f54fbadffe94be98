"""single: one-vs-rest MPS for one target label, scalar output (reference:
single.cc / single.h).

The model has no label index; its output should be ~1 on images of the target label
and ~0 otherwise (single.h:103).  Supports all four optimizers (conj, fast_conj,
exact, pinv) and the DMRG noise-term update.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from tnml_tpu.io import checkpoint as ckpt
from tnml_tpu.mps.core import MPS
from tnml_tpu.mps.ops import mps_sum, product_state
from tnml_tpu.mps.pack import pack, unpack
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.schedule import Sweeps


@dataclass
class SingleConfig:
    label: int = 0
    nsweep: int = 50
    maxm: int = 5000
    minm: Optional[int] = None
    cutoff: float = 1e-8
    noise: float = 0.0
    lam: float = 0.0
    alpha: float = 1.0   # bond-update damping (see FixedLConfig.alpha)
    npass: int = 4
    cconv: float = 1e-10
    method: str = "conj"
    ntarget: int = 10
    pcut: float = 1e-8
    ninitial: int = 100
    monotone: bool = False    # reject-on-regress bond acceptance (FixedLConfig)
    report_cost: bool = True
    pad: Optional[int] = None
    pause_steps: bool = False  # interactive per-bond gate (the reference's
                               # pause_steps PAUSE macro, single.cc:28, single.h:684)
    env_dtype: Optional[str] = None   # 'bf16' stores wings in bfloat16 — at the
                                      # full 58,862-image set the label-free wing
                                      # table is ~18 GB f32 at m=100, over HBM;
                                      # bf16 halves it (same knob as FixedLConfig)
    precision: Optional[str] = None   # matmul precision (default 'highest' —
                                      # the one-vs-rest targets are the same
                                      # near-degenerate overlaps as fixedL's)

    def resolved_minm(self) -> int:
        return self.minm if self.minm is not None else max(10, self.maxm // 2)

    @property
    def wname(self) -> str:
        return f"W{self.label}"   # format("W%d", L), single.cc:53


def single_cold_start(X: np.ndarray, labels: np.ndarray, target: int,
                      ninitial: int, seed: int = 0, verbose: bool = True) -> MPS:
    """Sum ninitial random target-label product states; orthogonalize; normalize
    the first core (single.cc:112-124)."""
    from tnml_tpu.utils.sampling import rand_imgs

    rng = np.random.default_rng(seed)
    # randImg rejection-sampling parity (util.h:104-121), as in cold_start
    pick = rand_imgs(rng, labels, target, ninitial)
    if verbose:
        print(f"Summing {len(pick)} random label {target} states")
    w = mps_sum([product_state(X[i]) for i in pick], cutoff=1e-10, maxm=10)
    w.cores[0] = w.cores[0] / np.linalg.norm(w.cores[0])
    return w


class SingleModel:
    def __init__(self, w: MPS, label: int):
        if w.label_site is not None:
            raise ValueError("single model must be label-free")
        self.w = w
        self.label = label

    @classmethod
    def initialize(cls, X: np.ndarray, labels: np.ndarray, cfg: SingleConfig,
                   workdir: str = ".", verbose: bool = True) -> "SingleModel":
        path = os.path.join(workdir, cfg.wname)
        if os.path.exists(path):
            if verbose:
                print(f"Reading {cfg.wname} from file")
            return cls(ckpt.load_mps(path), cfg.label)
        return cls(single_cold_start(X, labels, cfg.label, cfg.ninitial,
                                     verbose=verbose), cfg.label)

    def make_engine(self, X, labels, cfg: SingleConfig, sharding=None,
                    pad: Optional[int] = None) -> SweepEngine:
        if pad is None:
            pad = cfg.pad or min(cfg.maxm, max(16, 2 * self.w.max_bond()))
        pad = max(pad, self.w.max_bond())
        from tnml_tpu.models.fixedl import FixedLConfig
        return SweepEngine(pack(self.w, pad), X, labels,
                           lam=cfg.lam, alpha=cfg.alpha, npass=cfg.npass, cconv=cfg.cconv,
                           method=cfg.method, pcut=cfg.pcut, ntarget=cfg.ntarget,
                           target_label=cfg.label, report_cost=cfg.report_cost,
                           monotone=cfg.monotone,
                           env_dtype=FixedLConfig._dtype(cfg.env_dtype),
                           precision=cfg.precision or "highest",
                           sharding=sharding)

    def train(self, X, labels, cfg: SingleConfig, workdir: Optional[str] = ".",
              sharding=None, verbose: bool = True):
        eng = self.make_engine(X, labels, cfg, sharding=sharding)
        # label-free CG sweeps without noise fold into the scan-fused engine;
        # the interactive pause gate is per-bond, so it forces the per-bond path
        fused = (cfg.method in ("conj", "fast_conj", "fast_conj_exact")
                 and cfg.noise < 1e-14 and not cfg.pause_steps)
        if not fused:
            eng.init_envs()
        if verbose and not fused:
            cost, _, _, _ = eng.quadcost(0)
            print(f"Before DMRG, Cost = {float(cost) / eng.nt:.10f}")
        history = []

        def control_hook(b, direction):
            if cfg.pause_steps:
                # the reference's per-bond PAUSE gate (single.h:684)
                input(f"PAUSE at bond {b + 1} (Enter to continue) ")
            if workdir is None:
                return
            ctl = ckpt.poll_control_files(workdir)
            if ctl.get("write_wf"):
                print(f"File WRITE_WF found\nWriting {cfg.wname} to disk")
                ckpt.save_mps(os.path.join(workdir, cfg.wname), unpack(eng.packed()))
            if "lambda" in ctl:
                print(f"new lambda = {ctl['lambda']}")
                eng.set_lambda(ctl["lambda"])

        for sw in range(cfg.nsweep):
            maxm_sw = min(cfg.maxm, eng.pad)
            sweeps1 = Sweeps.constant(1, min(cfg.resolved_minm(), maxm_sw),
                                      maxm_sw, cfg.cutoff, noise=cfg.noise)
            if fused:
                history += eng.run_fused(sweeps1, verbose=verbose)
                control_hook(0, +1)
            else:
                history += eng.run(sweeps1, per_bond_hook=control_hook,
                                   verbose=verbose)
            self.w = unpack(eng.packed())
            if workdir is not None:
                ckpt.save_mps(os.path.join(workdir, cfg.wname), self.w)
            if int(eng.ranks.max()) >= eng.pad and eng.pad < cfg.maxm:
                new_pad = min(cfg.maxm, eng.pad * 2)
                if verbose:
                    print(f"[pad] bond ranks reached {eng.pad}; repacking to {new_pad}")
                eng = self.make_engine(X, labels, cfg, sharding=sharding, pad=new_pad)
                if not fused:
                    eng.init_envs()
        return history

    def save(self, path: str) -> None:
        ckpt.save_mps(path, self.w)
