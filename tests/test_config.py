import pytest

from tnml_tpu.config import Config, ConfigError, parse_input_text, read_input_file

SAMPLE = """
input
{
datadir = /some/path/MNIST

Ntrain = 100
imglen = 28

cutoff = 1E-12
maxm = 40
Nsweep = 50
lambda = 1E-3

Npass = 2

nthread = 2
Nbatch = 4

ninitial = 2
}
"""

INDENTED = """
input
    {
    label = 3
    maxm = 20   // inline comment
    # full-line comment
    precalc = yes
    }
"""


def test_parse_sample_fixedl():
    cfg = Config(parse_input_text(SAMPLE))
    assert cfg.get_int("Ntrain") == 100
    assert cfg.get_real("cutoff") == 1e-12
    assert cfg.get_real("lambda") == 1e-3
    assert cfg.get_int("maxm") == 40
    assert cfg.get_string("datadir") == "/some/path/MNIST"


def test_parse_real_reference_sample_inputs():
    """The actual files shipped by the reference must parse verbatim."""
    import os
    base = "/root/reference/sample_inputs"
    if not os.path.isdir(base):
        pytest.skip("reference sample_inputs not present")
    fx = read_input_file(os.path.join(base, "input_fixedL"))
    assert fx.get_int("Ntrain") == 100
    assert fx.get_int("maxm") == 40
    assert fx.get_int("Nsweep") == 50
    assert fx.get_real("lambda") == 1e-3
    assert fx.get_real("cutoff") == 1e-12
    assert fx.get_int("Npass") == 2
    assert fx.get_int("Nbatch") == 4
    assert fx.get_int("ninitial") == 2
    sg = read_input_file(os.path.join(base, "input_single"))
    assert sg.get_int("label") == 3
    assert sg.get_int("maxm") == 20
    assert sg.get_int("Nsweep") == 10


def test_parse_indented_with_comments():
    cfg = Config(parse_input_text(INDENTED))
    assert cfg.get_int("label") == 3
    assert cfg.get_int("maxm") == 20
    assert cfg.get_yesno("precalc") is True


def test_defaults_match_reference():
    cfg = Config({})
    # fixedL.cc:588-608 defaulting rules
    assert cfg.get_int("Ntrain", 60000) == 60000
    maxm = cfg.get_int("maxm", 5000)
    assert cfg.get_int("minm", max(10, maxm // 2)) == 2500
    assert cfg.get_string("method", "conj") == "conj"
    with pytest.raises(ConfigError):
        cfg.get_int("label")


def test_yesno_variants():
    cfg = Config({"a": "yes", "b": "no", "c": "bogus"})
    assert cfg.get_yesno("a") and not cfg.get_yesno("b")
    with pytest.raises(ConfigError):
        cfg.get_yesno("c")


def test_read_input_file(tmp_path):
    p = tmp_path / "inp"
    p.write_text(SAMPLE)
    cfg = read_input_file(str(p))
    assert cfg.get_int("Nbatch") == 4
    assert cfg.source == str(p)
