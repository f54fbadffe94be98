"""Matmul precision policy for TPU.

On TPU, JAX's DEFAULT matmul precision computes float32 contractions by rounding the
operands to bfloat16 (one MXU pass, f32 accumulation) — an 8-bit mantissa.  The MPS
classifier's flagship regime (series map + double-/255, fixedL.cc:637-642) is nearly
degenerate: per-pixel features are [1, x/4] with x <= 1/255, so the class signal
lives in tiny differences between near-identical product states.  Rounding operands
to bf16 destroys that signal — measured: the reference smoke config stalls at ~15%
train accuracy under DEFAULT precision but converges under full-f32 contractions
(see tests/test_engine.py and STATUS.md round-2 notes).

The framework therefore defaults every *implicit-precision* matmul to "highest"
(true f32, bf16_6x passes on the MXU).  Throughput paths opt back into bf16
explicitly via ``mxu_dtype=bf16`` / ``env_dtype=bf16`` — explicit bf16 operands are
a single exact MXU pass and are unaffected by this setting.

Override with TNML_MATMUL_PRECISION = default | high | highest (or any value
jax_default_matmul_precision accepts, e.g. bfloat16_3x).
"""

from __future__ import annotations

import os

_configured = [None]


def configure_matmul_precision(mode: str | None = None) -> str:
    """Set jax_default_matmul_precision once per process (idempotent).

    Called from the sweep engine, the evaluators, and every CLI app; the env var
    TNML_MATMUL_PRECISION wins over the ``mode`` argument.
    """
    import jax

    mode = os.environ.get("TNML_MATMUL_PRECISION") or mode or "highest"
    if _configured[0] == mode:
        return mode
    # "default" must be SET explicitly too: another component (e.g. an
    # evaluator constructed first) may already have configured "highest" in
    # this process, and skipping the update would silently leave it in force
    # (round 4: a precision=default quality run reproduced the highest
    # trajectory bit-for-bit until this was fixed)
    jax.config.update("jax_default_matmul_precision", mode)
    _configured[0] = mode
    return mode


def matmul_precision_scope(mode: str | None = None):
    """Context manager pinning matmul precision for the enclosed traces ONLY.

    Components with a fixed precision requirement that differs from the
    training engine's configured mode (the evaluators need true-f32
    contractions — the near-degenerate product-state overlaps lose their class
    signal to bf16 operand rounding) must NOT rewrite the process-global
    ``jax_default_matmul_precision``: a global write after an engine
    configured 'default'/'high' silently flips every later engine trace back
    to 'highest' (and vice versa).  The config context manager participates
    in jit cache keys, so repeated scoped calls never retrace and the global
    stays whatever ``configure_matmul_precision`` set.
    """
    import jax

    mode = os.environ.get("TNML_MATMUL_PRECISION") or mode or "highest"
    return jax.default_matmul_precision(mode)
