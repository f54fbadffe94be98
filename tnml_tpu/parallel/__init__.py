from tnml_tpu.parallel.mesh import DataParallel, make_mesh  # noqa: F401
