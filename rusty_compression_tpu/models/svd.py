"""SVD container, compression, and conversions.

TPU-native equivalent of rusty-compression ``src/svd.rs``: the SVD
factors as a pytree, rank/tolerance truncation on the singular values,
the SVD→QR conversion, and the randomized sketch-then-SVD entry point
``compute_from_range_estimate`` (svd.rs:171-183), which is the production
path on TPU (the dense SVD only ever runs on a small (k, n) sketch while
the big products stay on the MXU).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..linop import as_linear_operator
from ..ops.svd import compute_svd
from ..utils.dtypes import herm
from ..utils.errors import CompressionError
from ..utils.precision import with_precision
from .compression import Adaptive, CompressionType, Rank

__all__ = ["SVD"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SVD:
    """Singular value decomposition ``A = U diag(s) Vt`` (svd.rs:13-20).

    u: (m, k); s: (k,) real, descending; vt: (k, n).
    """

    u: jnp.ndarray
    s: jnp.ndarray
    vt: jnp.ndarray

    def tree_flatten(self):
        return (self.u, self.s, self.vt), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def nrows(self) -> int:
        return self.u.shape[-2]

    @property
    def ncols(self) -> int:
        return self.vt.shape[-1]

    @property
    def rank(self) -> int:
        return self.u.shape[-1]

    # -- construction --------------------------------------------------------
    @classmethod
    def compute_from(cls, a, method: str = "direct") -> "SVD":
        """Economy SVD of a dense matrix (svd.rs:165-169)."""
        u, s, vt = compute_svd(a, method=method)
        return cls(u, s, vt)

    @classmethod
    @with_precision
    def compute_from_range_estimate(cls, range_, op,
                                    method: str = "direct") -> "SVD":
        """Randomized SVD from an orthonormal range estimate
        (svd.rs:171-183): SVD the small sketch ``B = (A^H Q)^H`` and lift
        ``U = Q Uhat``. ``method="gram"`` uses the MXU-resident Gram-EVD
        small SVD (see ops.svd) — appropriate when the target tolerance
        is well above ``sqrt(eps)``."""
        op = as_linear_operator(op)
        from ..utils.backend import use_host_complex

        range_ = (np.asarray(range_) if use_host_complex(range_)
                  else jnp.asarray(range_))
        b = herm(op.conj_matmat(range_))
        svd_b = cls.compute_from(b, method=method)
        return cls(range_ @ svd_b.u, svd_b.s, svd_b.vt)

    # -- conversions ----------------------------------------------------------
    @with_precision
    def to_mat(self):
        """``U @ (s * Vt)`` with the row scaling fused (svd.rs:42-54)."""
        return self.u @ (self.s.astype(self.vt.dtype)[:, None] * self.vt)

    @with_precision
    def to_qr(self):
        """Convert to a pivoted QR: scale Vt rows by s, pivoted-QR that,
        and set ``Q = U Qhat`` (svd.rs:150-163)."""
        from .qr import QR  # deferred import to avoid a cycle

        scaled_vt = self.s.astype(self.vt.dtype)[:, None] * self.vt
        qr = QR.compute_from(scaled_vt)
        return QR(self.u @ qr.q, qr.r, qr.ind)

    def compress_svd_rank(self, max_rank: int) -> "SVD":
        """Keep the leading ``max_rank`` singular triplets (clamped;
        svd.rs:68-84)."""
        max_rank = min(int(max_rank), self.s.shape[-1])
        return SVD(self.u[:, :max_rank], self.s[:max_rank],
                   self.vt[:max_rank, :])

    def compress_svd_tolerance(self, tol: float) -> "SVD":
        """Truncate before the first ``s_i / s_0 < tol``; raise
        ``CompressionError`` if the spectrum never drops below ``tol``
        (svd.rs:87-101)."""
        from .qr import _tolerance_position  # shared scan (qr.rs:190-194)

        pos = _tolerance_position(np.asarray(self.s / self.s[0]), tol)
        if pos is None:
            raise CompressionError(
                f"Could not compress to relative tolerance {tol!r}")
        return self.compress_svd_rank(pos)

    def compress_svd_tolerance_masked(self, tol):
        """jit/vmap-safe tolerance truncation: mask instead of slice.

        Returns ``(rank, svd_masked, ok)``; singular triplets at index
        >= rank are zeroed in place of the host API's slicing (see
        ``QR.compress_qr_tolerance_masked`` for the contract). Because
        the masked triplets are zero, ``to_mat``/``apply`` of the
        masked container equal the truncated factorization exactly.
        """
        from .qr import _tolerance_rank_device  # shared device scan

        rank, ok = _tolerance_rank_device(self.s, tol)
        keep = (jnp.arange(self.s.shape[-1]) < rank)
        masked = SVD(self.u * keep.astype(self.u.dtype),
                     self.s * keep.astype(self.s.dtype),
                     self.vt * keep[:, None].astype(self.vt.dtype))
        return rank, masked, ok

    def compress(self, compression_type: CompressionType) -> "SVD":
        """Dispatch on the compression selector (svd.rs:60-65)."""
        if isinstance(compression_type, Adaptive):
            return self.compress_svd_tolerance(compression_type.tol)
        if isinstance(compression_type, Rank):
            return self.compress_svd_rank(compression_type.rank)
        raise TypeError(f"unknown compression type: {compression_type!r}")

    # -- application -----------------------------------------------------------
    @with_precision
    def apply(self, x):
        """Factored product ``U (s * (Vt x))``."""
        return self.u @ (self.s.astype(self.vt.dtype)[:, None] * (self.vt @ x))

    @with_precision
    def conj_apply(self, x):
        """Factored adjoint product ``V (s * (U^H x))``."""
        return herm(self.vt) @ (self.s.astype(self.vt.dtype)[:, None] * (herm(self.u) @ x))
