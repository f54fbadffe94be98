"""Out-of-core wing stores: training with offload == training fully on device."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from tnml_tpu.io import native
from tnml_tpu.mps.pack import pack
from tnml_tpu.train.engine import SweepEngine
from tnml_tpu.train.envstore import DeviceEnvStore, OffloadEnvStore
from tnml_tpu.train.schedule import Sweeps

from tests.test_engine import make_problem


def _train(store, tmp=None):
    W, X, labels = make_problem(n=10, batch=12, label_site=5, seed=4)
    X = X / np.linalg.norm(X, axis=2, keepdims=True)
    eng = SweepEngine(pack(W, pad=8), X, labels, lam=1e-4, npass=3,
                      env_store=store)
    eng.init_envs()
    h = eng.run(Sweeps.constant(2, 2, 8, 1e-10), verbose=False)
    return h[-1].cost, eng


def test_host_offload_matches_device():
    cost_dev, _ = _train(None)
    cost_off, eng = _train(OffloadEnvStore(keep=3))
    assert cost_off == pytest.approx(cost_dev, rel=1e-5)
    # the hot window must actually be small
    assert eng.env.device_resident() <= 2 * 3 + 3
    assert len(eng.env) > eng.env.device_resident()


@pytest.mark.skipif(not native.available(), reason="native library unavailable")
def test_spool_offload_matches_device(tmp_path):
    cost_dev, _ = _train(None)
    cost_sp, eng = _train(OffloadEnvStore(keep=2, spool_dir=str(tmp_path)))
    assert cost_sp == pytest.approx(cost_dev, rel=1e-5)
    assert list(tmp_path.glob("wings.*.spool"))


def test_offload_via_nbatch_app(tmp_path, capsys):
    from tests.test_apps import run_in, write_input
    from tnml_tpu.apps import fixedL
    from tnml_tpu.data.synthetic import synth_images
    from tnml_tpu.io.idx import write_idx

    d = tmp_path / "data"
    d.mkdir()
    labels = np.tile(np.arange(10), 10)
    write_idx(str(d / "train-images-idx3-ubyte"), synth_images(labels, "train", size=8))
    write_idx(str(d / "train-labels-idx1-ubyte"), labels.astype(np.uint8))
    inp = write_input(tmp_path / "inp", datadir=str(d), Ntrain=5, maxm=8,
                      Nsweep=1, Npass=2, ninitial=2, Nbatch=4,
                      rescale="fixed", feature="normal")
    assert run_in(tmp_path, fixedL.main, inp) == 0
    out = capsys.readouterr().out
    assert "[tnml] wing offload: host" in out
