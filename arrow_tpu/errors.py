"""Exception hierarchy (reference: cpp/src/arrow/status.h Status codes,
surfaced in python as pyarrow.lib.Arrow* exceptions).

``ArrowInvalid`` / ``ArrowNotImplementedError`` predate this module in
compute.registry; they are re-exported here so every error type has one
canonical import point.
"""

from .compute.registry import (  # noqa: F401
    ArrowInvalid, ArrowNotImplementedError)


class ArrowException(Exception):
    """Base for Arrow errors that don't map to a builtin."""


class ArrowTypeError(TypeError):
    pass


class ArrowKeyError(KeyError):
    pass


class ArrowIndexError(IndexError):
    pass


class ArrowMemoryError(MemoryError):
    pass


class ArrowCapacityError(ArrowException):
    pass


class ArrowSerializationError(ArrowException):
    pass


from .cancel import CancelledError as ArrowCancelled  # noqa: F401,E402

ArrowIOError = IOError
