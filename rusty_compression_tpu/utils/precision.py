"""Matmul precision policy.

On TPU, XLA lowers f32 matrix multiplies to the MXU's bf16 datapath by
default (`Precision.DEFAULT`), which floors every downstream accuracy
contract at ~1e-3 — silently. The reference library's contracts (and
BASELINE.md's tol-1e-8 workloads) require true f32/f64 products, so all
framework entry points trace their matmuls under an explicit precision
context:

* ``"highest"`` — full f32 accuracy (bf16x6 passes on TPU MXU). The
  default: every numerical contract in the test suite holds.
* ``"high"`` — bf16x3 (~f32 accuracy for most magnitudes, 2x faster).
* ``"default"`` — raw bf16 MXU passes; the fast mode for loose
  tolerances (>= ~1e-2).

Controlled globally via the ``RC_MATMUL_PRECISION`` env var or per-call
where pipelines expose a ``precision`` argument. On CPU the setting is a
no-op (CPU always computes in the array dtype).
"""

from __future__ import annotations

import functools
import os

import jax

__all__ = ["default_precision", "matmul_precision", "with_precision"]

_VALID = ("highest", "high", "default")


def default_precision() -> str:
    """The framework-wide default ('highest' unless overridden by the
    ``RC_MATMUL_PRECISION`` env var)."""
    p = os.environ.get("RC_MATMUL_PRECISION", "highest")
    if p not in _VALID:
        raise ValueError(
            f"RC_MATMUL_PRECISION={p!r}; expected one of {_VALID}")
    return p


def matmul_precision(precision: str | None = None):
    """Context manager pinning matmul precision for ops traced inside."""
    return jax.default_matmul_precision(precision or default_precision())


def with_precision(fn):
    """Decorator: trace ``fn`` under the framework's precision policy.

    The wrapped function gains an optional keyword-only ``precision``
    argument (``"highest" | "high" | "default"``; None = policy
    default).
    """

    @functools.wraps(fn)
    def wrapper(*args, precision: str | None = None, **kwargs):
        with matmul_precision(precision):
            return fn(*args, **kwargs)

    return wrapper
