"""End-to-end app tests: fixedL -> checkpoint artifacts -> fulltest, control files."""

import os

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from tnml_tpu.data.synthetic import synth_images
from tnml_tpu.io import checkpoint as ckpt
from tnml_tpu.io.idx import write_idx
from tnml_tpu.mps.core import MPS


@pytest.fixture()
def small_datadir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    for split, prefix, n in (("train", "train", 400), ("test", "t10k", 50)):
        labels = np.tile(np.arange(10), n // 10)
        imgs = synth_images(labels, split, size=8)
        write_idx(str(d / f"{prefix}-images-idx3-ubyte"), imgs)
        write_idx(str(d / f"{prefix}-labels-idx1-ubyte"), labels.astype(np.uint8))
    return str(d)


def write_input(path, **kv):
    body = "\n".join(f"{k} = {v}" for k, v in kv.items())
    path.write_text("input\n{\n" + body + "\n}\n")
    return str(path)


def run_in(tmp_path, module_main, inp):
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        return module_main(["app", inp])
    finally:
        os.chdir(old)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cores = [rng.normal(size=(1, 2, 3)), rng.normal(size=(3, 2, 4, 10)),
             rng.normal(size=(4, 2, 1))]
    w = MPS(cores, label_site=1)
    p = str(tmp_path / "W")
    ckpt.save_mps(p, w)
    back = ckpt.load_mps(p)
    assert back.label_site == 1
    for a, b in zip(w.cores, back.cores):
        np.testing.assert_array_equal(a, b)


def test_sites_roundtrip_and_mismatch(tmp_path):
    p = str(tmp_path / "sites")
    ckpt.write_sites(p, 64, 2)
    meta = ckpt.read_sites(p)
    assert meta["N"] == 64 and meta["d"] == 2


def test_control_files(tmp_path):
    (tmp_path / "WRITE_WF").touch()
    (tmp_path / "LAMBDA").write_text("0.005\n")
    out = ckpt.poll_control_files(str(tmp_path))
    assert out == {"write_wf": True, "lambda": 0.005}
    assert not (tmp_path / "WRITE_WF").exists()
    assert not (tmp_path / "LAMBDA").exists()
    assert ckpt.poll_control_files(str(tmp_path)) == {}


def test_fixedl_then_fulltest_end_to_end(tmp_path, small_datadir, capsys):
    from tnml_tpu.apps import fixedL, fulltest

    # 40 imgs/label + lambda=1E-3: test accuracy ~33/50 solo, comfortably above
    # the assert; the earlier 20/label config scored ~17-21 and flaked in-suite
    # (FP-fusion-level perturbations flip outcomes in this small chaotic regime)
    inp = write_input(tmp_path / "inp", datadir=small_datadir, Ntrain=40,
                      maxm=16, Nsweep=4, Npass=4, ninitial=8,
                      cutoff="1E-10", **{"lambda": "1E-3"},
                      rescale="fixed", feature="normal")
    assert run_in(tmp_path, fixedL.main, inp) == 0
    assert (tmp_path / "W").exists() and (tmp_path / "sites").exists()
    out = capsys.readouterr().out
    assert "Before starting DMRG Cost" in out

    assert run_in(tmp_path, fulltest.main, inp) == 0
    out = capsys.readouterr().out
    assert "Running full test of W" in out
    assert "Total # test images = 50" in out
    # must beat chance comfortably on this easy-ish split
    import re
    m = re.search(r"(\d+)/50 correct", out)
    assert m and int(m.group(1)) >= 20


def test_fixedl_reference_default_path_learns(tmp_path, small_datadir, capsys):
    """The parity-default configuration — series map WITH the double-/255 quirk
    (fixedL.cc:637-642) — must itself learn, not just the 'fixed' variant the
    other e2e tests use.  8x8 images keep the near-degeneracy mild (VERDICT
    round-1 item 7)."""
    from tnml_tpu.apps import fixedL, fulltest

    # lambda matters a lot in this nearly-degenerate regime (features
    # (1, x/4/255) are almost constant): 1E-3 over-regularizes to ~10/50
    # held-out; the scan in .bench notes puts 1E-5..1E-7 with Npass=4 at
    # 12-15/50 from sweep 1 on
    inp = write_input(tmp_path / "inp", datadir=small_datadir, Ntrain=40,
                      maxm=16, Nsweep=3, Npass=4, ninitial=2,
                      cutoff="1E-12", **{"lambda": "1E-5"})
    assert run_in(tmp_path, fixedL.main, inp) == 0
    out = capsys.readouterr().out
    assert "Before starting DMRG Cost" in out
    import re
    cor = [int(m.group(1)) for m in
           re.finditer(r"correct (\d+)/400", out)]
    assert cor and cor[-1] > 2 * 40, f"train correct trajectory {cor}"

    assert run_in(tmp_path, fulltest.main, inp) == 0
    out = capsys.readouterr().out
    m = re.search(r"(\d+)/50 correct", out)
    assert m and int(m.group(1)) > 10   # > 2x chance on held-out


def test_fixedl_warm_restart(tmp_path, small_datadir, capsys):
    from tnml_tpu.apps import fixedL

    inp = write_input(tmp_path / "inp", datadir=small_datadir, Ntrain=5,
                      maxm=8, Nsweep=1, Npass=2, ninitial=2,
                      rescale="fixed", feature="normal")
    run_in(tmp_path, fixedL.main, inp)
    capsys.readouterr()
    run_in(tmp_path, fixedL.main, inp)
    out = capsys.readouterr().out
    assert "Reading W from disk" in out


def test_fulltest_requires_sites(tmp_path, small_datadir):
    from tnml_tpu.apps import fulltest

    inp = write_input(tmp_path / "inp", datadir=small_datadir)
    with pytest.raises(SystemExit, match="sites"):
        run_in(tmp_path, fulltest.main, inp)


def test_keep_best_and_maxm_schedule(tmp_path, small_datadir, capsys):
    from tnml_tpu.apps import fixedL

    inp = write_input(tmp_path / "inp", datadir=small_datadir, Ntrain=10,
                      maxm=16, Nsweep=3, Npass=3, ninitial=2,
                      maxm_schedule="6,10,16", keep_best="yes",
                      label_mode="moving", method="fast_conj_exact",
                      rescale="fixed", feature="normal")
    assert run_in(tmp_path, fixedL.main, inp) == 0
    out = capsys.readouterr().out
    assert "max m = 6" in out           # first sweep capped by the schedule
    assert "[keep_best] restoring" in out
    assert (tmp_path / "W").exists()


def test_fixedl_dotest_keep_best_and_profile(tmp_path, small_datadir, capsys):
    """dotest=yes evaluates the held-out set per sweep; keep_best then selects
    the best-test-accuracy sweep checkpoint; profile=<dir> writes a
    jax.profiler trace artifact covering the sweeps."""
    from tnml_tpu.apps import fixedL

    prof = tmp_path / "prof"
    inp = write_input(tmp_path / "inp", datadir=small_datadir, Ntrain=10,
                      maxm=8, Nsweep=2, Npass=2, ninitial=2,
                      cutoff="1E-10", **{"lambda": "1E-4"},
                      dotest="yes", keep_best="yes", Ntest=30,
                      profile=str(prof))
    assert run_in(tmp_path, fixedL.main, inp) == 0
    out = capsys.readouterr().out
    import re
    accs = re.findall(r"Sweep \d+ test accuracy = ([\d.]+)%", out)
    assert len(accs) == 2, out
    assert "keep_best" in out
    # a trace artifact landed under the profile dir
    found = [p for p in prof.rglob("*") if p.is_file()]
    assert found, f"no profiler artifacts in {prof}"
