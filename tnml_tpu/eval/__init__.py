from tnml_tpu.eval.fulltest import contract_batch, full_test, separate_full_test  # noqa: F401
