"""Native (C++) host-side kernels with on-demand compilation + ctypes
bindings.

These serve the *host* paths — offline patch materialisation for
reference interop and fast symmetric padding — the device paths use
XLA/Pallas.  Falls back to NumPy transparently if no compiler is
available.
"""

from cmlpl_tpu.native.binding import (  # noqa: F401
    extract_patches_native,
    pad_symmetric_native,
    native_available,
)
