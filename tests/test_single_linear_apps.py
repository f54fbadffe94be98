"""End-to-end: single -> separate_fulltest, linear -> W%d -> fixedL merge init."""

import os
import re

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from tests.test_apps import run_in, small_datadir, write_input  # noqa: F401


def test_single_then_separate_fulltest(tmp_path, small_datadir, capsys):
    from tnml_tpu.apps import separate_fulltest, single

    for l in range(10):
        inp = write_input(tmp_path / f"inp{l}", datadir=small_datadir, label=l,
                          Ntrain=15, maxm=8, Nsweep=2, Npass=3, ninitial=3,
                          cutoff="1E-9", **{"lambda": "1E-6"},
                          rescale="fixed", feature="normal")
        assert run_in(tmp_path, single.main, inp) == 0
        assert (tmp_path / f"W{l}").exists()
        (tmp_path / f"L{l}").mkdir(exist_ok=True)
        os.replace(tmp_path / f"W{l}", tmp_path / f"L{l}" / f"W{l}")
    out = capsys.readouterr().out
    assert "training images with selected label L=0" in out

    inp = write_input(tmp_path / "inp_eval", datadir=small_datadir,
                      rescale="fixed", feature="normal")
    assert run_in(tmp_path, separate_fulltest.main, inp) == 0
    out = capsys.readouterr().out
    assert "Cost functions:" in out
    m = re.search(r"(\d+)/50 correct", out)
    assert m and int(m.group(1)) >= 10  # above the 5/50 chance line


def test_single_warm_restart_and_methods(tmp_path, small_datadir, capsys):
    from tnml_tpu.apps import single

    inp = write_input(tmp_path / "inp", datadir=small_datadir, label=3,
                      Ntrain=8, maxm=6, Nsweep=1, Npass=4, ninitial=2,
                      method="fast_conj", rescale="fixed", feature="normal")
    run_in(tmp_path, single.main, inp)
    capsys.readouterr()
    run_in(tmp_path, single.main, inp)
    out = capsys.readouterr().out
    assert "Reading W3 from file" in out


def test_linear_then_fixedl_merge_init(tmp_path, small_datadir, capsys):
    from tnml_tpu.apps import fixedL, linear

    for l in range(10):
        inp = write_input(tmp_path / f"linp{l}", datadir=small_datadir, label=l,
                          Ntrain=20, Nlinear_iter=60, **{"lambda": "1E-4"})
        assert run_in(tmp_path, linear.main, inp) == 0
        assert (tmp_path / f"V{l}").exists()
        assert (tmp_path / f"W{l}").exists()
    out = capsys.readouterr().out
    assert "Percent correct" in out
    # linear one-vs-rest should separate train decently (it hits 100% at 8x8)
    accs = [float(x) for x in re.findall(r"Percent correct = ([\d.]+)%", out)]
    assert max(accs) > 80.0

    # fixedL must pick the merge-init path (fixedL.cc:682-701)
    finp = write_input(tmp_path / "finp", datadir=small_datadir, Ntrain=10,
                       maxm=10, Nsweep=1, Npass=2, ninitial=2,
                       rescale="fixed", feature="normal")
    assert run_in(tmp_path, fixedL.main, finp) == 0
    out = capsys.readouterr().out
    assert "Found separate W0,W1,...,W9 MPS: summing" in out


def test_linear_warm_restart(tmp_path, small_datadir, capsys):
    from tnml_tpu.apps import linear

    inp = write_input(tmp_path / "inp", datadir=small_datadir, label=1,
                      Ntrain=10, Nlinear_iter=5)
    run_in(tmp_path, linear.main, inp)
    capsys.readouterr()
    run_in(tmp_path, linear.main, inp)
    out = capsys.readouterr().out
    assert "Reading parameters from disk" in out
