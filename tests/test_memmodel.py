"""The fixed-layout memory model has exactly ONE copy (train/memmodel.py):
the model-level router (models/fixedl.py::_use_fused), the engine variant
choice (engine.py::_fixed_variant), and the resident preflight
(engine.py::_fused_init_fixed) must agree bit-for-bit on sizing and budget.
Round-3 review found three divergent copies; these tests pin the contract."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax

from tnml_tpu.mps.pack import pack
from tnml_tpu.train import memmodel
from tnml_tpu.train.engine import SweepEngine

from tests.test_engine import make_problem


def test_fixed_layout_bytes_full_set():
    # the documented full-MNIST numbers: ~55 GB labelled + ~11 GB plain at
    # B=58,862, N=784, c=392, pad=120, bf16 wings (README / BENCH_r03 story)
    sz = memmodel.fixed_layout_bytes(58862, 120, 10, 392, 784, 2)
    assert 50e9 < sz["labelled"] < 60e9
    assert 9e9 < sz["plain"] < 13e9
    assert sz["total"] == sz["labelled"] + sz["plain"]
    assert sz["rows"] == max(392 - 1, 784 - 2 - 392)
    # and the blocked engine's sqrt-memory residency fits a 13 GiB budget
    K = 20
    blocked = memmodel.blocked_layout_bytes(sz["rows"], sz["row_bytes"], K)
    assert blocked < 13 * 2**30


def test_budget_env_override(monkeypatch):
    monkeypatch.setenv("TNML_FUSED_FIXED_MAX_BYTES", "123456")
    assert memmodel.fused_budget_bytes() == 123456.0
    monkeypatch.delenv("TNML_FUSED_FIXED_MAX_BYTES")
    # no env: derived from the device or the 13 GiB fallback — either way sane
    b = memmodel.fused_budget_bytes()
    assert 1e9 < b < 1e12


class _FakeTpu:
    platform = "tpu"
    device_kind = "fake v5e"

    def memory_stats(self):
        return {"bytes_limit": 16 * 2**30}


def _engine(n=8, batch=10, c=3, seed=7):
    W, X, labels = make_problem(n=n, batch=batch, label_site=c, seed=seed)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    return SweepEngine(pack(W, pad=8), X, labels, label_mode="fixed")


def test_router_and_preflight_agree(monkeypatch):
    """_fixed_variant routes to 'blocked' exactly when _fused_init_fixed's
    preflight would refuse the resident buffers — same function, same knob."""
    eng = _engine()
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_FakeTpu()])

    monkeypatch.setenv("TNML_FUSED_FIXED_MAX_BYTES", "10")   # absurdly small
    assert eng._fixed_variant() == "blocked"
    with pytest.raises(ValueError, match="wing budget"):
        eng._fused_init_fixed()

    monkeypatch.setenv("TNML_FUSED_FIXED_MAX_BYTES", "1e18")
    assert eng._fixed_variant() == "resident"
    eng._fused_init_fixed()   # same budget → preflight passes


def test_budget_derived_from_device(monkeypatch):
    """Advisor finding (round 3): the budget must track the detected chip's
    HBM, not a hardcoded 16 GB assumption."""
    monkeypatch.delenv("TNML_FUSED_FIXED_MAX_BYTES", raising=False)

    class Big(_FakeTpu):
        def memory_stats(self):
            return {"bytes_limit": 95 * 2**30}   # v5p-class

    assert memmodel.fused_budget_bytes(device=_FakeTpu()) == \
        pytest.approx(memmodel._HEADROOM * 16 * 2**30)
    assert memmodel.fused_budget_bytes(device=Big()) == \
        pytest.approx(memmodel._HEADROOM * 95 * 2**30)
    # the blocked fallback allowance keeps the larger share (no transient
    # double of the labelled stack applies to the blocked residency)
    assert memmodel.blocked_budget_bytes(device=_FakeTpu()) == \
        pytest.approx(memmodel._HEADROOM_BLOCKED * 16 * 2**30)
    assert memmodel.blocked_budget_bytes(device=_FakeTpu()) > \
        memmodel.fused_budget_bytes(device=_FakeTpu())

    class NoStats(_FakeTpu):
        def memory_stats(self):
            raise NotImplementedError

    assert memmodel.fused_budget_bytes(device=NoStats()) == \
        pytest.approx(memmodel._HEADROOM * memmodel._FALLBACK_LIMIT)


def test_shard_count_and_per_chip():
    assert memmodel.shard_count(None) == 1
    devs = jax.devices()
    if len(devs) >= 2:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec
        mesh = Mesh(np.array(devs), ("dp",))
        sh = NamedSharding(mesh, PartitionSpec("dp"))
        assert memmodel.shard_count(sh) == len(devs)
        one = memmodel.per_chip_total(800, 16, 10, 4, 10, 2, None)
        split = memmodel.per_chip_total(800, 16, 10, 4, 10, 2, sh)
        assert split == pytest.approx(one / len(devs))


def test_router_sizes_at_final_pad(monkeypatch):
    """Round-4 OOM regression: a ramped run starting at a small adaptive pad
    must size the variant choice at the FINAL pad (cfg.maxm) — the first
    full-set recipe run picked the resident engine at pad=20 ('fits') and
    OOMed with a 20.7 GB program (.bench/quality_fullset_fixed_r4_oom.log)."""
    from tnml_tpu.models.fixedl import FixedLConfig, FixedLModel
    from tnml_tpu.mps.pack import unpack

    # big enough that the blocked residency (boundaries + rebuild rows) is
    # clearly below the resident stacks — at toy scale its constant overhead
    # (2K+6 working rows) dominates and the comparison is meaningless
    W, X, labels = make_problem(n=100, batch=400, label_site=50, seed=3)
    model = FixedLModel(unpack(pack(W, pad=8)))
    cfg = FixedLConfig(nsweep=1, maxm=64, cutoff=1e-10, pad=None,
                       method="fast_conj_exact", label_mode="fixed")
    eng = model.make_engine(X, labels, cfg)
    assert eng.pad < 64                       # adaptive start
    assert eng.sizing_pad == 64               # but sized at the final pad

    sz_final = memmodel.fixed_layout_bytes(400, 64, 10, 50, 100, 4)
    sz_start = memmodel.fixed_layout_bytes(400, eng.pad, 10, 50, 100, 4)
    # budget between start-pad and final-pad totals: the old current-pad
    # sizing would pick resident and OOM once the pad regrows
    budget = (sz_start["total"] + sz_final["total"]) / 2
    assert sz_start["total"] < budget < sz_final["total"]
    monkeypatch.setenv("TNML_FUSED_FIXED_MAX_BYTES", str(budget))
    assert model._use_fused(eng, cfg) is True
    assert eng.fused_variant == "blocked"
    assert eng._fixed_variant() == "blocked"  # engine agrees via sizing_pad
