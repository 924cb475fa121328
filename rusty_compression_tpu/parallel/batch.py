"""Batched block compression — ``vmap`` over same-shape operator blocks.

The reference library (rusty-compression) compresses one matrix at a
time in a single thread. The TPU-native scale-out story (SURVEY.md §7,
layer B5) is *block data-parallelism*: many independent operator blocks
(e.g. the off-diagonal blocks of an H-matrix) compressed concurrently.
The first level of that hierarchy is on-chip batching: a stack of
same-shape blocks goes through one ``vmap``-ed, ``jit``-ed pipeline, so
the MXU sees one big batched GEMM stream instead of many small ones.

All batched entry points take a leading ``(B, m, n)`` block stack plus a
single PRNG key (split per block — every block gets an independent
sketch) and return factor containers whose leaves carry the leading
batch axis. Fixed-rank paths only: static output shapes are what make
batching (and sharding, see ``parallel.mesh``) compile once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..linop import as_linear_operator
from ..models.interp_decomp import ColumnID, RowID, TwoSidedID
from ..models.qr import LQ, QR
from ..models.svd import SVD
from ..sampling import range_finder
from ..utils.metrics import rel_diff_fro
from ..utils.precision import with_precision

__all__ = [
    "rsvd_block",
    "nystrom_block",
    "column_id_block",
    "row_id_block",
    "two_sided_id_block",
    "sketched_two_sided_id_block",
    "batched_rsvd",
    "batched_nystrom",
    "batched_column_id",
    "batched_row_id",
    "batched_two_sided_id",
    "batched_sketched_two_sided_id",
    "batched_rel_diff_fro",
    "adaptive_rsvd_block",
    "batched_adaptive_rsvd",
]


# ---------------------------------------------------------------------------
# Single-block fixed-rank pipelines (the vmap bodies)
# ---------------------------------------------------------------------------


@with_precision
def rsvd_block(a, key, rank: int, oversample: int = 5,
               power_iters: int = 0, ortho: str = "auto",
               small_svd: str = "direct",
               sketch_precision: str | None = None) -> SVD:
    """Fixed-rank randomized SVD of one dense block.

    Sketch-then-factorize (random_sampling.rs:58-126 feeding
    svd.rs:171-183), production fast path: the HMT ``range_finder``
    keeps the full oversampled ``k + p`` basis (all-GEMM, no sequential
    pivoting anywhere), the dense SVD runs only on the small
    ``(k+p, n)`` projection, and truncation to ``rank`` happens on the
    singular values. Jit/vmap-traceable; all shapes static.

    ``sketch_precision`` (opt-in) lowers only the sampling GEMMs — see
    ``sampling.range_finder``; valid when the target residual sits
    above the sketch noise (tail-dominated spectra).
    """
    op = as_linear_operator(a)
    q = range_finder(op, key, rank + oversample, power_iters, ortho,
                     sketch_precision=sketch_precision)
    svd = SVD.compute_from_range_estimate(q, op, method=small_svd)
    return svd.compress_svd_rank(rank)


@with_precision
def nystrom_block(a, key, rank: int, oversample: int = 8,
                  small_svd: str = "direct", **nystrom_kwargs) -> SVD:
    """Single-pass generalized Nystrom SVD of one block — the
    bandwidth-optimal fixed-rank path (2 operator passes; see
    sampling.nystrom_svd for the accuracy trade)."""
    from ..sampling import nystrom_svd

    return nystrom_svd(a, key, k=rank, oversample=oversample,
                       small_svd=small_svd, **nystrom_kwargs)


@with_precision
def column_id_block(a, key, rank: int, **qr_kwargs) -> ColumnID:
    """Fixed-rank column interpolative decomposition of one block.

    Truncated pivoted QR (``max_rank=rank`` — the cheap path: the
    factorization itself stops at ``rank`` steps) followed by the
    rank-deficient ``column_id`` conversion (qr.rs:282-308). ``key``
    seeds the blocked RRQR's pivot sketch.
    """
    qr = QR.compute_from(a, max_rank=rank, key=key, **qr_kwargs)
    return qr.column_id()


@with_precision
def row_id_block(a, key, rank: int, **qr_kwargs) -> RowID:
    """Fixed-rank row interpolative decomposition of one block
    (qr.rs:363-403 through the truncated pivoted LQ)."""
    lq = LQ.compute_from(a, max_rank=rank, key=key, **qr_kwargs)
    return lq.row_id()


@with_precision
def two_sided_id_block(a, key, rank: int, **qr_kwargs) -> TwoSidedID:
    """Fixed-rank two-sided interpolative decomposition of one block
    (col_interp_decomp.rs:116-130 route: QR → ColumnID → TwoSidedID)."""
    return column_id_block(a, key, rank, **qr_kwargs).two_sided_id()


@with_precision
def sketched_two_sided_id_block(a, key, rank: int, oversample: int = 8,
                                **qr_kwargs) -> TwoSidedID:
    """One-read fixed-rank two-sided ID of one block: the whole RRQR is
    replaced by a QRCP-of-sketch + k-column gather, so the block is
    read from HBM once instead of twice (sampling.sketched_two_sided_id
    — the bandwidth-optimal route for small ranks)."""
    from ..sampling import sketched_two_sided_id

    return sketched_two_sided_id(a, key, rank, oversample, **qr_kwargs)


# ---------------------------------------------------------------------------
# Batched (vmap) entry points
# ---------------------------------------------------------------------------


def _batched(block_fn, blocks, key, rank, static_kwargs):
    blocks = jnp.asarray(blocks)
    if blocks.ndim != 3:
        raise ValueError(
            f"expected a (B, m, n) block stack, got shape {blocks.shape}")
    keys = jax.random.split(key, blocks.shape[0])
    fn = functools.partial(block_fn, rank=rank, **static_kwargs)
    return jax.vmap(fn)(blocks, keys)


def batched_rsvd(blocks, key, rank: int, oversample: int = 5,
                 power_iters: int = 0, **qr_kwargs) -> SVD:
    """Randomized SVD of a ``(B, m, n)`` block stack; one compiled
    pipeline, per-block independent sketches. Returns an ``SVD`` whose
    leaves have a leading batch axis (u: (B, m, k), s: (B, k),
    vt: (B, k, n))."""
    return _batched(rsvd_block, blocks, key, rank,
                    dict(oversample=oversample, power_iters=power_iters,
                         **qr_kwargs))


def batched_nystrom(blocks, key, rank: int, **kwargs) -> SVD:
    """Single-pass Nystrom SVD of a block stack (leading batch axis)."""
    return _batched(nystrom_block, blocks, key, rank, kwargs)


def batched_column_id(blocks, key, rank: int, **qr_kwargs) -> ColumnID:
    """Column ID of a block stack (leaves carry a leading batch axis)."""
    return _batched(column_id_block, blocks, key, rank, qr_kwargs)


def batched_row_id(blocks, key, rank: int, **qr_kwargs) -> RowID:
    """Row ID of a block stack (leaves carry a leading batch axis)."""
    return _batched(row_id_block, blocks, key, rank, qr_kwargs)


def batched_two_sided_id(blocks, key, rank: int, **qr_kwargs) -> TwoSidedID:
    """Two-sided ID of a block stack (leaves carry a leading batch axis)."""
    return _batched(two_sided_id_block, blocks, key, rank, qr_kwargs)


def batched_sketched_two_sided_id(blocks, key, rank: int,
                                  **kwargs) -> TwoSidedID:
    """One-read two-sided ID of a block stack (half the HBM traffic of
    ``batched_two_sided_id``; see ``sketched_two_sided_id_block``)."""
    return _batched(sketched_two_sided_id_block, blocks, key, rank, kwargs)


def batched_rel_diff_fro(factors, blocks):
    """Per-block relative Frobenius reconstruction error (B,).

    ``factors`` is any batched container with a ``to_mat`` method.
    """
    recon = jax.vmap(type(factors).to_mat)(factors)
    return rel_diff_fro(recon, jnp.asarray(blocks))


# ---------------------------------------------------------------------------
# Batched adaptive-rank compression
# ---------------------------------------------------------------------------


@with_precision
def adaptive_rsvd_block(a, key, rel_tol: float, sample_size: int,
                        max_rank: int | None = None, ortho: str = "auto",
                        small_svd: str = "direct"):
    """Tolerance-driven randomized SVD of one block, fully on device.

    Runs the adaptive range finder (``lax.while_loop`` with HMT
    residual-norm stopping, sampling.py) and factorizes the padded
    sketch. Static output shapes (padded to ``max_rank`` rounded up to
    whole blocks): rows of the sketch beyond the achieved rank are zero,
    so the trailing singular triplets come out as exact zeros — the
    mask-and-pad discipline.

    Returns ``(svd_padded, rank, history)`` where ``rank`` is the
    achieved (data-dependent) rank and ``history[i]`` the estimated
    relative residual after block ``i`` (zero-padded).
    """
    from ..models.svd import SVD
    from ..ops.svd import compute_svd
    from ..sampling import _adaptive_loop

    op = as_linear_operator(a)
    if max_rank is None:
        max_rank = min(op.shape)
    max_iters = max(1, -(-int(max_rank) // int(sample_size)))
    q, b_mat, ncols, _, hist = _adaptive_loop(
        op, key, rel_tol, int(sample_size), max_iters, ortho)
    u_b, s, vt = compute_svd(b_mat, method=small_svd)
    return SVD(q @ u_b, s, vt), ncols, hist


def batched_adaptive_rsvd(blocks, key, rel_tol: float, sample_size: int,
                          max_rank: int | None = None, **kwargs):
    """Adaptive-rank randomized SVD of a ``(B, m, n)`` stack in ONE
    compiled program: every block runs the device-side while-loop and
    stops at its own rank (lanes that converge early are masked while
    stragglers continue — no host round trips, no per-block dispatch).

    The reference can only do this as B sequential library calls; here
    it is a single ``vmap`` over the ``lax.while_loop``.

    Returns ``(svd_padded, ranks, histories)``: svd leaves carry the
    batch axis at padded rank; ``ranks`` (B,) are achieved ranks;
    ``histories`` (B, max_iters) the per-block residual curves
    (zero beyond each block's iteration count).
    """
    blocks = jnp.asarray(blocks)
    if blocks.ndim != 3:
        raise ValueError(
            f"expected a (B, m, n) block stack, got shape {blocks.shape}")
    keys = jax.random.split(key, blocks.shape[0])
    fn = functools.partial(adaptive_rsvd_block, rel_tol=rel_tol,
                           sample_size=sample_size, max_rank=max_rank,
                           **kwargs)
    return jax.vmap(fn)(blocks, keys)
