"""Error taxonomy for the TPU-native compression framework.

Mirrors the reference error enum (rusty-compression ``src/types.rs:11-23``):
``LinalgError``, ``CompressionError`` (requested tolerance unreachable),
``LayoutError``, ``PivotedQRError`` — surfaced here as a small Python
exception hierarchy so call sites can catch either the base class or a
specific failure mode.
"""

from __future__ import annotations

__all__ = [
    "RustyCompressionError",
    "LinalgError",
    "CompressionError",
    "LayoutError",
    "PivotedQRError",
]


class RustyCompressionError(Exception):
    """Base class for all errors raised by this framework."""


class LinalgError(RustyCompressionError):
    """A dense linear-algebra primitive failed (non-finite result, ...)."""


class CompressionError(RustyCompressionError):
    """Could not compress to the desired tolerance.

    Raised when a tolerance-driven truncation finds no diagonal/singular
    value below the requested relative tolerance (reference semantics:
    ``qr.rs:186-200``, ``svd.rs:87-101`` return an error rather than
    silently keeping full rank).
    """


class LayoutError(RustyCompressionError):
    """Incompatible array layout or shape."""


class PivotedQRError(RustyCompressionError):
    """The pivoted QR factorization failed."""
