"""Native (C++) runtime components, built on demand with g++ + ctypes.

The reference's only first-party-adjacent native code path is the vendored
pycocotools' `_mask` C extension (SURVEY §2.4); this package holds the
framework's equivalents.  Every native entry point has a pure-python fallback
so the framework works without a toolchain.
"""

from neuralnetworklibrary_tpu.native.build import load_library  # noqa: F401
