"""tnml-tpu: TPU-native MPS (matrix product state) classifier framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of emstoudenmire/TNML
("Supervised Learning with Quantum-Inspired Tensor Networks", arXiv:1605.05775):

- ``models.fixedl``  — multiclass MPS with a fixed label index on the central core
  (reference: fixedL.cc)
- ``models.single``  — one-vs-rest MPS per label, scalar output (reference: single.cc/.h)
- ``models.linear``  — linear baseline + exact bond-dim-2 MPS embedding (reference: linear.cc)
- ``eval.fulltest``  — batched evaluators (reference: fulltest.cc, separate_fulltest.cc)

Design (TPU-first, not a translation):
- per-image ITensor objects become batched dense arrays with static padded shapes
- the pthread ``ParallelDo`` data-parallel loop becomes vmapped/sharded contractions,
  with bond-gradient reductions as XLA collectives over a ``jax.sharding.Mesh``
- disk-spooled environment tensors (proj_images/) become HBM-resident stacks with an
  optional host-offload path
- adaptive-rank truncated SVD runs on device with static shapes + rank masks
"""

__version__ = "0.1.0"

from tnml_tpu.config import Config, read_input_file  # noqa: F401
