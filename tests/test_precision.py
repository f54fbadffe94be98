"""configure_matmul_precision contract (utils/precision.py).

Round-4 regression: requesting 'default' after another component had already
configured 'highest' was silently ignored (the old code only called
jax.config.update for non-default modes), so a precision=default engine ran
at highest — reproduced bit-for-bit identical trajectories
(.bench/quality_fixn_def_r4.log vs quality_fixn_hst_r4.log).
"""

import tests.conftest  # noqa: F401

import jax

from tnml_tpu.utils import precision as prec


def _reset():
    prec._configured[0] = None


def test_default_overrides_prior_highest(monkeypatch):
    monkeypatch.delenv("TNML_MATMUL_PRECISION", raising=False)
    _reset()
    assert prec.configure_matmul_precision("highest") == "highest"
    assert jax.config.jax_default_matmul_precision == "highest"
    assert prec.configure_matmul_precision("default") == "default"
    assert jax.config.jax_default_matmul_precision == "default"
    # and back — the cache only skips same-mode repeats
    assert prec.configure_matmul_precision(None) == "highest"
    assert jax.config.jax_default_matmul_precision == "highest"


def test_env_var_wins(monkeypatch):
    monkeypatch.setenv("TNML_MATMUL_PRECISION", "high")
    _reset()
    assert prec.configure_matmul_precision("highest") == "high"
    assert jax.config.jax_default_matmul_precision == "high"
    monkeypatch.delenv("TNML_MATMUL_PRECISION")
    _reset()
    prec.configure_matmul_precision(None)   # restore the suite default
