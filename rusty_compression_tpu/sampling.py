"""Randomized range sampling.

TPU-native equivalent of rusty-compression ``src/random_sampling.rs``:

* ``sample_range_by_rank`` — one Gaussian sketch GEMM + truncated
  pivoted QR (random_sampling.rs:58-126).
* ``sample_range_power_iteration`` — subspace (power) iteration with
  per-step QR re-orthogonalization. This implements the *documented*
  semantics (random_sampling.rs:74-81): each iteration refines the
  previous iterate. (The reference implementation shadows its loop
  variable at random_sampling.rs:150 so every iteration restarts from the
  initial sketch — a bug SURVEY.md §2/#21 says not to reproduce.)
* ``sample_range_adaptive`` — HMT-style blocked adaptive sampling
  (random_sampling.rs:202-282) with the 10·sqrt(2/pi) probabilistic
  tolerance factor, block Gram–Schmidt re-orthogonalization, and the
  residual history output. On TPU the whole loop runs device-side as a
  ``lax.while_loop`` over preallocated (m, max_rank) buffers with
  residual-norm stopping — no host round-trips per block.

All routines are matrix-free: they only touch the operator through
``matmat`` / ``conj_matmat`` (the ``LinearOperator`` protocol).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .linop import DenseOperator, LinearOperator, as_linear_operator
from .ops.orthogonalize import cholesky_qr2, orthonormalize
from .ops.pivoted_qr import pivoted_qr
from .utils.dtypes import eps as _dtype_eps, herm, real_dtype
from .utils.precision import with_precision
from .utils.random_matrix import random_gaussian

__all__ = [
    "max_col_norm",
    "range_finder",
    "sample_range_by_rank",
    "sample_range_power_iteration",
    "sample_range_adaptive",
    "adaptive_range_finder",
    "randomized_adaptive_qr",
    "randomized_adaptive_svd",
    "nystrom_svd",
    "sketched_column_id",
    "sketched_row_id",
    "sketched_two_sided_id",
]

#: HMT probabilistic bound factor 10 * sqrt(2/pi)
#: (Halko–Martinsson–Tropp §4.3; random_sampling.rs:229-234).
HMT_TOL_FACTOR = 10.0 * math.sqrt(2.0 / math.pi)


def max_col_norm(a):
    """Maximum Euclidean column norm (random_sampling.rs:175-199)."""
    return jnp.max(jnp.linalg.norm(jnp.asarray(a), axis=-2), axis=-1)


@with_precision
def sample_range_by_rank(op, key, k: int, p: int = 5, **qr_kwargs):
    """Orthonormal basis for the dominant rank-``k`` range of ``op``.

    Sketch ``Y = A @ Omega`` with ``Omega`` Gaussian (n, k+p), pivoted-QR
    the sketch, keep the first ``k`` Q columns (random_sampling.rs:103-119).
    The oversampling ``p`` should stay small; p=5 is typical
    (random_sampling.rs:63-65).
    """
    op = as_linear_operator(op)
    omega = random_gaussian(key, (op.ncols, k + p), dtype=op.dtype)
    y = op.matmat(omega)
    q, _, _ = pivoted_qr(y, max_rank=min(k, *y.shape), **qr_kwargs)
    return q


@with_precision
def sample_range_power_iteration(op, key, k: int, p: int = 5,
                                 it_count: int = 0, ortho: str = "auto",
                                 **qr_kwargs):
    """Rank-``k`` range basis refined by ``it_count`` subspace iterations.

    Per documented reference semantics (random_sampling.rs:74-98): apply
    ``(A A^H)`` ``it_count`` times with a re-orthogonalization after
    each half-step, then pivoted-QR the final iterate and keep ``k``
    columns. ``it_count=0`` reduces to ``sample_range_by_rank``.
    ``ortho`` selects the re-orthogonalization kernel (Householder on
    CPU, shifted CholeskyQR3 on TPU by default — see ops.orthogonalize).
    """
    op = as_linear_operator(op)
    omega = random_gaussian(key, (op.ncols, k + p), dtype=op.dtype)
    y = op.matmat(omega)
    for _ in range(it_count):
        q = orthonormalize(y, ortho)
        w = orthonormalize(op.conj_matmat(q), ortho)
        y = op.matmat(w)
    q, _, _ = pivoted_qr(y, max_rank=min(k, *y.shape), **qr_kwargs)
    return q


@with_precision
def range_finder(op, key, size: int, power_iters: int = 0,
                 ortho: str = "auto", sketch_precision: str | None = None,
                 mid_ortho: str | None = None,
                 final_passes: int | None = None):
    """HMT range finder: the full ``size``-column orthonormal sketch basis.

    The production fast path for randomized factorizations: one Gaussian
    sketch, optional power iterations, *unpivoted* all-GEMM
    orthonormalization — no sequential pivoting anywhere, every FLOP on
    the MXU. Unlike ``sample_range_by_rank`` (reference parity,
    random_sampling.rs:103-119) it keeps all ``size = k + p`` columns;
    downstream truncation (``SVD.compress_svd_rank``) then benefits from
    the oversampled basis (standard HMT; tighter than trimming Q first).

    ``sketch_precision`` overrides the matmul precision of the
    *operator applications only* (orthonormalization and everything
    downstream keep the session policy). HMT theory lets the sketch run
    at low precision — the sampling products only steer the subspace;
    the residual is set by the final projection — so on TPU
    ``"default"`` (1-pass bf16) runs the 2q+1 big GEMMs at ~6x the
    f32-highest rate. Use ONLY when the target residual is above the
    sketch noise (~eps_bf16 ~ 1e-2 relative for "default", ~1e-4 for
    "high"): for sharply decaying spectra the basis steering error
    floors the capture there. Measured: identical error (tail-
    dominated, sigma_{k+1}/sigma_1 = 3e-2) at 8192^2 k=100 q=2 across
    "default"/"high"/"highest".
    """
    op = as_linear_operator(op)
    omega = random_gaussian(key, (op.ncols, size), dtype=op.dtype)

    import contextlib

    def sketch_ctx():  # fresh instance per use (jax ctx managers are one-shot)
        return (jax.default_matmul_precision(sketch_precision)
                if sketch_precision else contextlib.nullcontext())

    with sketch_ctx():
        y = op.matmat(omega)
    mid = mid_ortho or ortho
    for _ in range(power_iters):
        # Mid-iteration re-orths only stabilize the iterate; a single
        # svqb pass suffices (see ops.orthogonalize) and saves 2 of the
        # 3 small eighs per stage — the serial cost that dominates the
        # TPU rSVD wall once GEMMs run at MXU rate. ``mid_ortho="nsqb"``
        # goes further (no eigh at all mid-loop): the iterate only needs
        # bounded conditioning before the next operator application, and
        # the FINAL basis still gets the full ``ortho`` treatment.
        q = orthonormalize(y, mid, passes=1)
        with sketch_ctx():
            w_raw = op.conj_matmat(q)
        w = orthonormalize(w_raw, mid, passes=1)
        with sketch_ctx():
            y = op.matmat(w)
    return orthonormalize(y, ortho, passes=final_passes)


# ---------------------------------------------------------------------------
# Adaptive sampling (device-side while loop)
# ---------------------------------------------------------------------------


def _adaptive_loop(op, key, rel_tol, sample_size: int, max_iters: int,
                   ortho: str = "auto"):
    """Device-side adaptive range finder.

    Carries preallocated buffers ``q`` (m, max_iters*b) and ``b_mat``
    (max_iters*b, n); each iteration appends exactly ``sample_size``
    orthonormal columns (written via dynamic_update_slice) so every shape
    stays static. Columns/rows beyond ``ncols`` are zero, which makes the
    full-buffer GEMMs exact — the mask-and-pad discipline of SURVEY.md §7.
    """
    m, n = op.shape
    dt = op.dtype
    rdt = real_dtype(dt)
    blk = sample_size
    cap = max_iters * blk

    tol_factor = jnp.asarray(HMT_TOL_FACTOR, dtype=rdt)
    rel_tol = jnp.asarray(rel_tol, dtype=rdt)

    key, k0 = jax.random.split(key)
    y = op.matmat(random_gaussian(k0, (n, blk), dtype=dt))
    # Randomized estimate of the operator norm from the first probe block
    # (random_sampling.rs:241).
    op_norm = tol_factor * max_col_norm(y)
    safe_op_norm = jnp.where(op_norm > 0, op_norm, 1.0)

    q0 = jnp.zeros((m, cap), dtype=dt)
    b0 = jnp.zeros((cap, n), dtype=dt)
    hist0 = jnp.zeros((max_iters,), dtype=rdt)
    state = (key, y, q0, b0, jnp.int32(0), op_norm, hist0, jnp.int32(0))

    def cond(state):
        _, _, _, _, it, max_norm, _, stall = state
        return jnp.logical_and(
            max_norm / safe_op_norm >= rel_tol,
            jnp.logical_and(it < max_iters, stall < 2))

    def body(state):
        key, y, q, b_mat, it, prev_norm, hist, stall = state
        ncols = it * blk
        # Block Gram–Schmidt against the existing basis
        # (random_sampling.rs:250-252); zero columns make this exact.
        # Two passes ("twice is enough"): after heavy deflation a single
        # pass leaves the probe visibly non-orthogonal to the basis in
        # f32, and appending it degrades Q — the reference's single pass
        # diverges when the tolerance sits near the dtype's noise floor.
        y = y - q @ (herm(q) @ y)
        y = y - q @ (herm(q) @ y)
        q_new = orthonormalize(y, ortho)
        # Append rows (A^H Q_new)^H to B and columns Q_new to Q
        # (random_sampling.rs:256-262).
        b_new = herm(op.conj_matmat(q_new))
        zero = jnp.int32(0)
        q = jax.lax.dynamic_update_slice(q, q_new, (zero, ncols))
        b_mat = jax.lax.dynamic_update_slice(b_mat, b_new, (ncols, zero))
        # Fresh probe of the residual A - Q B (random_sampling.rs:265-266).
        key, k1 = jax.random.split(key)
        omega = random_gaussian(k1, (n, blk), dtype=dt)
        y = op.matmat(omega) - q @ (b_mat @ omega)
        max_norm = tol_factor * max_col_norm(y)
        # Noise-floor detector: stop when the residual estimate has BOTH
        # stopped shrinking AND sits within ~50 eps of the operator norm
        # — i.e. at the dtype's roundoff floor. The floor condition is
        # essential: slowly decaying spectra legitimately shrink by only
        # a few percent per block far above the floor and must keep
        # iterating toward the tolerance.
        at_floor = max_norm / safe_op_norm < 50.0 * jnp.asarray(
            _dtype_eps(rdt), dtype=rdt)
        no_progress = max_norm > 0.9 * prev_norm
        stall = jnp.where(jnp.logical_and(at_floor, no_progress),
                          stall + 1, jnp.int32(0))
        hist = hist.at[it].set(max_norm / safe_op_norm)
        return key, y, q, b_mat, it + 1, max_norm, hist, stall

    key, y, q, b_mat, it, max_norm, hist, _ = jax.lax.while_loop(
        cond, body, state)
    return q, b_mat, it * blk, it, hist


_adaptive_loop_jit = jax.jit(
    _adaptive_loop, static_argnames=("sample_size", "max_iters", "ortho"))


@with_precision
def adaptive_range_finder(op, key, rel_tol, sample_size: int,
                          max_rank: int | None = None,
                          ortho: str = "auto"):
    """Jittable adaptive range finder with padded outputs.

    Returns ``(q_padded, b_padded, ncols, n_iters, history)`` where only
    the first ``ncols`` columns of ``q_padded`` (and rows of ``b_padded``
    = ``Q^H A``) are meaningful, and ``history[i]`` is the estimated
    relative residual after ``(i+1) * sample_size`` columns. This is the
    in-``jit`` building block; ``sample_range_adaptive`` is the host-level
    API with reference semantics.
    """
    op = as_linear_operator(op)
    if max_rank is None:
        max_rank = min(op.shape)
    max_iters = max(1, -(-int(max_rank) // int(sample_size)))
    fn = _adaptive_loop_jit if isinstance(op, DenseOperator) else _adaptive_loop
    return fn(op, key, rel_tol, int(sample_size), max_iters, ortho)


@with_precision
def sample_range_adaptive(op, key, rel_tol: float, sample_size: int,
                          max_rank: int | None = None, ortho: str = "auto"):
    """Adaptively sample the range of ``op`` to relative tolerance.

    Reference semantics (random_sampling.rs:202-282): returns
    ``(q, residuals)`` where ``q`` (m, rank) holds the orthonormalized
    range columns actually accepted and ``residuals`` is the convergence
    history ``[(rank, rel_res), ...]`` — the estimated relative residual
    after each appended block. The error check is probabilistic (HMT
    bound with factor 10·sqrt(2/pi)).

    This is a host-boundary API (it concretizes the achieved rank to
    slice the padded buffers); inside ``jit`` use
    ``adaptive_range_finder`` and the mask-and-pad outputs.
    """
    q, _, ncols, n_iters, hist = adaptive_range_finder(
        op, key, rel_tol, sample_size, max_rank, ortho)
    ncols = int(ncols)
    n_iters = int(n_iters)
    residuals = [((i + 1) * int(sample_size), float(hist[i]))
                 for i in range(n_iters)]
    return q[:, :ncols], residuals


# ---------------------------------------------------------------------------
# Adaptive-compression convenience wrappers
# ---------------------------------------------------------------------------


@with_precision
def randomized_adaptive_qr(op, key, rel_tol: float, sample_size: int,
                           max_rank: int | None = None, ortho: str = "auto",
                           **qr_kwargs):
    """Adaptively sample, then factorize: the convenience wrapper the
    reference intended but shipped commented out
    (random_sampling.rs:302-326 ``randomized_adaptive_qr``).

    Returns ``(qr, residual_history)`` with ``qr`` a pivoted QR of the
    discovered range (rank = achieved sampling rank).
    """
    from .models.qr import QR  # deferred: models layer sits above

    q, hist = sample_range_adaptive(op, key, rel_tol, sample_size,
                                    max_rank, ortho)
    return QR.compute_from_range_estimate(q, op, **qr_kwargs), hist


@with_precision
def randomized_adaptive_svd(op, key, rel_tol: float, sample_size: int,
                            max_rank: int | None = None, ortho: str = "auto",
                            small_svd: str = "direct"):
    """Adaptive sampling followed by sketch-SVD (the commented-out
    ``randomized_adaptive_svd`` of random_sampling.rs:328-352).

    Returns ``(svd, residual_history)``.
    """
    from .models.svd import SVD  # deferred: models layer sits above

    q, hist = sample_range_adaptive(op, key, rel_tol, sample_size,
                                    max_rank, ortho)
    return SVD.compute_from_range_estimate(q, op, method=small_svd), hist


# ---------------------------------------------------------------------------
# Generalized Nystrom (single-pass) factorization
# ---------------------------------------------------------------------------


@with_precision
def nystrom_svd(op, key, k: int, oversample: int = 8,
                psi_oversample: float = 1.5, small_svd: str = "direct",
                stabilize: bool = True):
    """Single-pass randomized SVD via the generalized Nystrom method.

    ``A ~= (A Omega) (Psi A Omega)^+ (Psi A)`` with Gaussian sketches
    ``Omega`` (n, l) and ``Psi`` (l2, m), l = k + p, l2 ~ 1.5 l
    (Nakatsukasa, "Fast and stable randomized low-rank matrix
    approximation", arXiv:2009.11392 — the oversized second sketch is
    what makes the pseudoinverse stable).

    The operator is touched exactly twice — one ``matmat`` and one
    ``conj_matmat`` — versus ``2q + 2`` passes for power-iterated HMT:
    this is the bandwidth-optimal path when the spectrum decays fast
    enough that power iteration isn't needed. Everything else is
    small-matrix work. Beyond the reference (no analog); the HMT routes
    above mirror the reference's API.

    Returns an ``SVD`` container truncated to rank ``k``.
    """
    from .models.svd import SVD  # deferred: models layer sits above
    from .ops.svd import compute_svd

    op = as_linear_operator(op)
    m, n = op.shape
    l = k + oversample
    l2 = max(int(l * psi_oversample), l + 4)
    k_om, k_ps = jax.random.split(key)
    omega = random_gaussian(k_om, (n, l), dtype=op.dtype)
    psi_h = random_gaussian(k_ps, (m, l2), dtype=op.dtype)  # Psi^H

    y = op.matmat(omega)              # (m, l)   — HBM pass 1
    w = herm(op.conj_matmat(psi_h))   # (l2, n) = Psi A — HBM pass 2
    core = w @ omega                  # (l2, l) = Psi A Omega (small)

    if stabilize:
        # QR-based pseudoinverse application (the numerically stable
        # formulation): A ~= Y pinv(core) W = Y R^+ Q^H W.
        q_c, r_c = jnp.linalg.qr(core, mode="reduced")   # (l2, l), (l, l)
        z = herm(q_c) @ w                                # (l, n)
        from .ops.triangular import triangular_solve

        yr = triangular_solve(r_c, y, left_side=False,
                              lower=False)               # Y R^{-1} (m, l)
    else:
        yr = y @ jnp.linalg.pinv(core)
        z = w
    u_z, s, vt = compute_svd(z, method=small_svd)
    u = yr @ u_z
    # yr columns are not orthonormal; re-orthonormalize the lifted factor
    q_u, r_u = cholesky_qr2(u)
    u_r, s2, vt2 = compute_svd(
        r_u * s[None, :].astype(r_u.dtype), method=small_svd)
    return SVD((q_u @ u_r)[:, :k], s2[:k], (vt2 @ vt)[:k, :])


# ---------------------------------------------------------------------------
# One-read sketched interpolative decompositions
# ---------------------------------------------------------------------------


@with_precision
def sketched_column_id(op, key, rank: int | None = None,
                       oversample: int = 8, tol: float | None = None,
                       max_rank: int | None = None, **qr_kwargs):
    """Column interpolative decomposition from ONE read of the operator.

    Semantics of the reference's ``QRTraits::column_id``
    (qr.rs:270-309) — ``A ~= C Z`` with ``C`` literal columns of ``A``
    — but built from a row sketch ``S = G A`` ((k+p, n), Gaussian
    ``G``) instead of a pivoted QR of ``A`` itself:

    * pivots: QRCP of the *sketch* (the HQRRP pivot rule — the same
      randomized panel selection ops/pivoted_qr.py's blocked mode uses,
      here applied once to the whole problem);
    * coefficients: ``Z = R11^{-1} [R11 | R12]`` from the sketch's QR —
      algebraically the least-squares solution
      ``argmin_Z ||G C Z - G A||_F`` (Voronin & Martinsson,
      arXiv:1412.8447 §4: the sketched ID), since Q_s is orthonormal;
    * ``C = A[:, col_ind[:rank]]`` — a k-column gather, bitwise columns
      of ``A`` (stronger than the reconstruction-grade columns of the
      QR route).

    The operator is touched ONCE with a full-width product (the sketch)
    plus one k-column gather — versus two full reads for the blocked
    RRQR route (sketch + R-row projection). For an (n, n) block this
    halves HBM traffic; it is the bandwidth-optimal fixed-rank ID.
    Accuracy: the sketched LS coefficients carry the usual Gaussian
    subspace-embedding multiple of the RRQR-route error — tested
    against the same gates (test_sampling.py).

    **Tolerance mode** (``tol=`` instead of ``rank=``, VERDICT r4 next
    #6): the sketch QRCP's diagonal carries the residual-decay signal —
    for a Gaussian row sketch, ``|r_jj|`` tracks ``sigma_j(A)`` to
    within the subspace-embedding distortion — so the truncation rank
    comes from the reference's ``|r_jj / r_00| < tol`` rule
    (qr.rs:186-200) applied to the *sketch*, with the cut tightened by
    2x to absorb the sketched-LS error multiple. ``max_rank`` bounds
    the sketch width (keeps tolerance mode one-read-cheap; default =
    full ``min(m, n)``, the reference's factor-then-truncate shape).
    A diagonal that never crosses the tightened cut raises
    ``CompressionError`` (qr.rs:198 semantics).

    Returns a ``ColumnID``; fixed-rank mode is jit/vmap-clean (static
    shapes); tolerance mode slices at the host boundary.
    """
    from .models.interp_decomp import ColumnID  # deferred: models layer
    from .models.qr import QR                   # sits above sampling

    if (rank is None) == (tol is None):
        raise ValueError("pass exactly one of rank= or tol=")
    op = as_linear_operator(op)
    m, n = op.shape
    if tol is not None:
        cap = min(m, n) if max_rank is None else min(int(max_rank), m, n)
        l = min(cap + oversample, m, n)
    else:
        l = min(rank + oversample, m, n)
    # independent subkeys for the sketch and the QRCP's randomized
    # panel selection (ADVICE r4: a shared key correlates the two
    # Gaussian streams the sketched-ID analysis assumes independent);
    # an explicit caller key= wins for the QRCP
    k_sketch, k_qr = jax.random.split(key)
    k_qr = qr_kwargs.pop("key", k_qr)
    g_h = random_gaussian(k_sketch, (m, l), dtype=op.dtype)  # G^H
    s = herm(op.conj_matmat(g_h))                            # (l, n) = G A
    qr_s = QR.compute_from(s, max_rank=(l if tol is not None
                                        else min(rank, l)),
                           key=k_qr, **qr_kwargs)
    if tol is not None:
        # reference spectral-cut rule on the sketch diagonal; the 0.5x
        # tightening covers the sketched-LS multiple so the assembled
        # ID still meets the 5*tol reconstruction gate. The cut may
        # land in the oversample margin — clamp to the max_rank cap
        # (qr.rs:172-174 clamp semantics).
        qr_s = qr_s.compress_qr_tolerance(0.5 * float(tol))
        if max_rank is not None:
            qr_s = qr_s.compress_qr_rank(int(max_rank))
    cid_s = qr_s.column_id()   # z + col_ind from the sketch; c discarded
    piv = cid_s.col_ind[:cid_s.rank]
    if op.has_cheap_dense():
        c = jnp.take(op.to_dense(), piv, axis=1)
    else:
        # matrix-free: k columns via a one-hot selector product — a
        # k-column read instead of a second full-operator
        # materialization (ADVICE r4: hasattr(op, 'to_dense') was
        # always True — the base protocol derives a dense fallback —
        # so this branch was unreachable and matvec-only operators
        # paid a second full read)
        sel = jax.nn.one_hot(piv, n, dtype=op.dtype).T  # (n, k)
        c = op.matmat(sel)
    return ColumnID(c=c, z=cid_s.z, col_ind=cid_s.col_ind)


@with_precision
def sketched_row_id(op, key, rank: int | None = None, oversample: int = 8,
                    tol: float | None = None, max_rank: int | None = None,
                    **qr_kwargs):
    """Row interpolative decomposition from one read (mirror of
    ``sketched_column_id`` on ``A^H``; row_interp_decomp.rs semantics:
    ``A ~= X R`` with ``R`` literal rows of ``A``). ``tol=`` runs the
    sketch-diagonal tolerance rule (see ``sketched_column_id``)."""
    from .linop import AdjointOperator
    from .models.interp_decomp import RowID  # deferred: models layer

    op = as_linear_operator(op)
    cid = sketched_column_id(AdjointOperator(op), key, rank, oversample,
                             tol=tol, max_rank=max_rank, **qr_kwargs)
    return RowID(x=herm(cid.z), r=herm(cid.c), row_ind=cid.col_ind)


@with_precision
def sketched_two_sided_id(op, key, rank: int | None = None,
                          oversample: int = 8, tol: float | None = None,
                          max_rank: int | None = None, **qr_kwargs):
    """Two-sided interpolative decomposition from ONE read of the
    operator: ``sketched_column_id`` (one full-width sketch + k-column
    gather) followed by the standard LQ→row-ID of the (m, k) ``C``
    panel (col_interp_decomp.rs:116-130) — the row side only ever
    touches the k gathered columns. Skeleton/permutation contracts are
    those of ``TwoSidedID`` (two_sided_interp_decomp.rs:9-10).
    ``tol=`` runs the sketch-diagonal tolerance rule (see
    ``sketched_column_id``)."""
    return sketched_column_id(op, key, rank, oversample, tol=tol,
                              max_rank=max_rank,
                              **qr_kwargs).two_sided_id()
