"""Native (C++) host-side runtime components, loaded via ctypes.

The extension is compiled on first use with the system toolchain into
``~/.cache/bbdm_tpu/``; everything gracefully falls back to the pure-Python
path when no compiler is available (``fastimage_available()``).
"""

from bbdm_tpu.native.build import fastimage_available, get_fastimage  # noqa: F401
from bbdm_tpu.native.fastimage import preprocess_image  # noqa: F401
