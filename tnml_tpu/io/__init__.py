from tnml_tpu.io.idx import read_idx, write_idx  # noqa: F401
