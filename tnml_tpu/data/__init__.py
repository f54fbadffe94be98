from tnml_tpu.data.mnist import Dataset, read_mnist  # noqa: F401
