"""Native runtime components (C++), loaded via ctypes with a pure-Python
fallback. Build on first use: ``python -m glfusion_tpu.native.build`` or
automatically when the shared object is missing and a compiler is present.
"""

from glfusion_tpu.native.loader import (  # noqa: F401
    native_available,
    read_nifti_batch_native,
    read_nifti_native,
)
