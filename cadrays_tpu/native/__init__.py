"""Native (C++) host-side components, bound via ctypes.

The reference's host-side heavy lifting (BVH builds, mesh processing) is
native C++ [OCCT-contract]; so is ours. Each component degrades
gracefully to its Python implementation when the shared library hasn't
been compiled (`python -m cadrays_tpu.native.build`).
"""
from cadrays_tpu.native.build import load_library, native_available  # noqa: F401
