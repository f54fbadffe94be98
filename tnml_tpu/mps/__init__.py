from tnml_tpu.mps.core import MPS, svd_truncate  # noqa: F401
from tnml_tpu.mps.ops import (mps_add, mps_sum, overlap, product_state,  # noqa: F401
                              embed_linear)
