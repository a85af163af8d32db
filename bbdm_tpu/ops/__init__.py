"""TPU compute primitives: fused norms and attention.

XLA implementations are the reference semantics; Pallas kernels (when enabled
and running on TPU) are drop-in replacements for the hot paths.
"""

from bbdm_tpu.ops.group_norm import group_norm  # noqa: F401
from bbdm_tpu.ops.attention import multi_head_attention  # noqa: F401
