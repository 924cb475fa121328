"""rusty_compression_tpu — TPU-native low-rank compression framework.

A from-scratch JAX/XLA + Pallas framework with the capabilities of the
Rust ``rusty-compression`` library (see SURVEY.md): pivoted
(rank-revealing) QR, truncated SVD, one- and two-sided interpolative
decompositions, and randomized range sampling (fixed-rank,
power-iteration, and adaptive tolerance-driven), generic over
f32/f64/c64/c128, exposed through a matrix-free linear-operator
protocol, and scaled out by compressing independent operator blocks
data-parallel over a ``jax.sharding.Mesh``.

The flat re-export below mirrors the reference's prelude-style API
surface (rusty-compression ``lib.rs:90-102``).
"""

from .linop import (AdjointOperator, CompositeOperator, DenseOperator,
                    FactoredOperator, FunctionOperator, LinearOperator,
                    ScaledOperator, SparseOperator, SumOperator,
                    as_linear_operator)
from .config import CompressionConfig, compress
from .models.compression import Adaptive, CompressionType, Rank
from .models.interp_decomp import ColumnID, RowID, TwoSidedID
from .models.qr import LQ, QR
from .models.svd import SVD
from .ops.pivoted_qr import pivoted_lq, pivoted_qr
from .ops.svd import compute_svd
from .ops.orthogonalize import (
    cholesky_qr,
    cholesky_qr2,
    orthonormalize,
    shifted_cholesky_qr3,
)
from .sampling import (
    HMT_TOL_FACTOR,
    adaptive_range_finder,
    max_col_norm,
    nystrom_svd,
    randomized_adaptive_qr,
    randomized_adaptive_svd,
    range_finder,
    sample_range_adaptive,
    sample_range_by_rank,
    sample_range_power_iteration,
    sketched_column_id,
    sketched_row_id,
    sketched_two_sided_id,
)
from .highacc import (
    refined_capture,
    refined_rsvd,
    refined_rsvd_planar,
    refined_rsvd_fused,
    refined_rsvd_fused_batch,
)
from .planarc import (
    planar_range_capture,
    planar_rsvd,
    planar_column_id,
    planar_row_id,
    planar_two_sided_id,
)
from .highacc_id import (
    refined_column_id,
    refined_row_id,
    refined_two_sided_id,
)
from .utils.errors import (
    CompressionError,
    LayoutError,
    LinalgError,
    PivotedQRError,
    RustyCompressionError,
)
from .utils.metrics import rel_diff_fro, rel_diff_l2
from .utils.permutation import (
    MatrixPermutationMode,
    VectorPermutationMode,
    apply_matrix_permutation,
    apply_vector_permutation,
    invert_permutation_vector,
)
from .utils.random_matrix import (
    random_approximate_low_rank_matrix,
    random_gaussian,
    random_orthogonal_matrix,
)

from . import io, native  # noqa: E402  (submodule conveniences)
from .utils.logging import MetricsLogger
from .utils.precision import default_precision, matmul_precision
from .utils.profiling import sync, timeit_slope, trace

__version__ = "0.1.0"

__all__ = [
    # operators
    "LinearOperator", "DenseOperator", "FactoredOperator",
    "FunctionOperator", "CompositeOperator", "SumOperator",
    "ScaledOperator", "AdjointOperator", "SparseOperator",
    "as_linear_operator",
    # containers & conversions
    "QR", "LQ", "SVD", "ColumnID", "RowID", "TwoSidedID",
    # compression config
    "CompressionType", "Rank", "Adaptive",
    "CompressionConfig", "compress",
    # kernels
    "pivoted_qr", "pivoted_lq", "compute_svd",
    # sampling
    "sample_range_by_rank", "sample_range_power_iteration",
    "sample_range_adaptive", "adaptive_range_finder", "range_finder",
    "randomized_adaptive_qr", "randomized_adaptive_svd",
    "nystrom_svd",
    "sketched_column_id", "sketched_row_id", "sketched_two_sided_id",
    "max_col_norm", "HMT_TOL_FACTOR",
    # high-accuracy (tol <= 1e-8) pipelines
    "refined_capture", "refined_rsvd", "refined_rsvd_fused",
    "refined_rsvd_fused_batch", "refined_rsvd_planar",
    "refined_column_id", "refined_row_id", "refined_two_sided_id",
    "planar_range_capture", "planar_rsvd", "planar_column_id",
    "planar_row_id", "planar_two_sided_id",
    "orthonormalize", "cholesky_qr", "cholesky_qr2", "shifted_cholesky_qr3",
    # utils
    "rel_diff_fro", "rel_diff_l2",
    "MatrixPermutationMode", "VectorPermutationMode",
    "apply_matrix_permutation", "apply_vector_permutation",
    "invert_permutation_vector",
    "random_gaussian", "random_orthogonal_matrix",
    "random_approximate_low_rank_matrix",
    # errors
    "RustyCompressionError", "CompressionError", "LinalgError",
    "LayoutError", "PivotedQRError",
    # aux subsystems
    "io", "native", "MetricsLogger",
    "default_precision", "matmul_precision",
    "sync", "timeit_slope", "trace",
]
