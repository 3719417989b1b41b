"""Native (C++) runtime components, bound via ctypes.

Built on demand with g++ (no pip, no pybind11): the first import compiles
``libqst_wordpiece.so`` next to the sources; failures degrade gracefully to
the pure-Python implementations.
"""

from qst_tpu.native.fast_wordpiece import (
    FastWordPieceTokenizer,
    native_available,
)

__all__ = ["FastWordPieceTokenizer", "native_available"]
