"""Matrix-free linear operator protocol.

TPU-native equivalent of the reference operator traits
(rusty-compression ``src/types.rs:40-101``): an operator exposes the
action ``A @ X`` (``matmat``) and ``A^H @ X`` (``conj_matmat``); all
randomized sampling routines are written against this protocol, so users
never need an explicit dense matrix.

Design inversion vs. the reference: the Rust library requires ``matvec``
and derives ``matmat`` by a per-column loop (``types.rs:60-71,90-101``)
— a BLAS-2 pattern that starves the MXU. Here ``matmat`` is the
*required* primitive (batched by construction: one big GEMM), and
``matvec`` is derived by treating a vector as a single-column matrix.

Operators must be jax-traceable: ``matmat`` is called inside ``jit`` /
``lax.while_loop`` (the adaptive sampler) and under ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils.dtypes import herm

__all__ = ["LinearOperator", "DenseOperator", "FactoredOperator",
           "FunctionOperator", "CompositeOperator", "SumOperator",
           "ScaledOperator", "AdjointOperator", "SparseOperator",
           "as_linear_operator"]


class LinearOperator:
    """Base class for matrix-free operators.

    Subclasses must implement ``matmat`` and (for adjoint-requiring
    algorithms such as power iteration, adaptive sampling, and the
    range-estimate factorizations) ``conj_matmat``, plus the ``shape``
    and ``dtype`` properties.
    """

    @property
    def shape(self) -> tuple[int, int]:
        raise NotImplementedError

    @property
    def dtype(self):
        raise NotImplementedError

    @property
    def nrows(self) -> int:
        return self.shape[0]

    @property
    def ncols(self) -> int:
        return self.shape[1]

    # -- required protocol -------------------------------------------------
    def matmat(self, x):
        """Return ``A @ x`` for a (ncols, k) matrix ``x``."""
        raise NotImplementedError

    def conj_matmat(self, x):
        """Return ``A^H @ x`` for a (nrows, k) matrix ``x``."""
        raise NotImplementedError

    # -- derived conveniences ----------------------------------------------
    def matvec(self, x):
        """``A @ x`` for a vector ``x`` (derived from ``matmat``)."""
        return self.matmat(x[:, None])[:, 0]

    def conj_matvec(self, x):
        """``A^H @ x`` for a vector ``x`` (derived from ``conj_matmat``)."""
        return self.conj_matmat(x[:, None])[:, 0]

    def to_dense(self):
        """Materialize the operator as a dense matrix (A @ I)."""
        return self.matmat(jnp.eye(self.ncols, dtype=self.dtype))

    def has_cheap_dense(self) -> bool:
        """True when ``to_dense`` is a cheap view/gather rather than the
        derived full-read fallback ``matmat(eye(n))``.

        Dispatch point for bandwidth-sensitive consumers (the one-read
        sketched IDs gather k columns via a one-hot product when this
        is False instead of materializing the operator). A subclass
        that overrides ``to_dense`` is cheap by definition; wrappers
        whose dense view delegates (``AdjointOperator``) override this
        to ask the wrapped operator.
        """
        return type(self).to_dense is not LinearOperator.to_dense

    # -- operator algebra sugar ---------------------------------------------
    def __matmul__(self, other):
        if isinstance(other, LinearOperator) or (
                hasattr(other, "apply") and hasattr(other, "conj_apply")):
            return CompositeOperator(self, other)
        return self.matmat(other)

    def __add__(self, other):
        return SumOperator(self, other)

    def __mul__(self, alpha):
        return ScaledOperator(alpha, self)

    __rmul__ = __mul__

    @property
    def H(self):
        """The adjoint operator ``A^H``."""
        return AdjointOperator(self)


@jax.tree_util.register_pytree_node_class
class DenseOperator(LinearOperator):
    """Adapter wrapping a dense (m, n) array as a ``LinearOperator``.

    Equivalent of the reference's dense ``ArrayBase`` operator impls
    (``types.rs:103-133``), but with gemm-based products (the reference
    ships with the gemm impls commented out and loops per column —
    ``types.rs:135-160`` — a performance wart deliberately not
    reproduced).

    Registered as a pytree so it can cross ``jit``/``vmap`` boundaries.
    """

    def __init__(self, a):
        import numpy as np

        if np.iscomplexobj(a) and not isinstance(a, jnp.ndarray):
            from .utils.backend import backend_accepts_complex

            if not backend_accepts_complex():
                # transparent complex dispatch: the device rejects
                # complex dtypes, so the operator stays a host numpy
                # array and every product runs on host (the factor
                # containers it feeds are host-backed too)
                self.a = np.asarray(a)
                return
        self.a = jnp.asarray(a)

    @property
    def shape(self) -> tuple[int, int]:
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def matmat(self, x):
        return self.a @ x

    def conj_matmat(self, x):
        return herm(self.a) @ x

    def to_dense(self):
        return self.a

    # pytree protocol
    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        (a,) = children
        return cls(a)


@jax.tree_util.register_pytree_node_class
class FactoredOperator(LinearOperator):
    """A factorization container viewed as a matrix-free operator.

    Wraps anything exposing ``apply`` / ``conj_apply`` / ``nrows`` /
    ``ncols`` (every container in ``models``) so factored forms flow
    back into the sampling pipelines — e.g. re-compressing a rank-200
    two-sided ID down to rank 50 without ever reassembling the dense
    matrix (the products cost O((m + n) k) instead of O(m n)).

    Mirrors the reference's ``Apply`` impls on the ID containers
    (col_interp_decomp.rs:134-154 etc.), which make them operators in
    the same sense.
    """

    def __init__(self, factors):
        for attr in ("apply", "conj_apply", "nrows", "ncols"):
            if not hasattr(factors, attr):
                raise TypeError(
                    f"{type(factors).__name__} does not expose {attr}; "
                    "not a factorization container")
        self.factors = factors

    @property
    def shape(self) -> tuple[int, int]:
        return (self.factors.nrows, self.factors.ncols)

    @property
    def dtype(self):
        return jax.tree_util.tree_leaves(self.factors)[0].dtype

    def matmat(self, x):
        return self.factors.apply(x)

    def conj_matmat(self, x):
        return self.factors.conj_apply(x)

    def to_dense(self):
        return self.factors.to_mat()

    # pytree protocol
    def tree_flatten(self):
        return (self.factors,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        (factors,) = children
        return cls(factors)


@jax.tree_util.register_pytree_node_class
class FunctionOperator(LinearOperator):
    """Operator from user ``matvec`` closures — the reference's MINIMUM
    protocol (``types.rs:40-51``: implement ``MatVec``, get ``MatMat``
    free via the blanket impl at ``types.rs:145-146``).

    This completes the protocol inversion both ways: the library's
    algorithms are written against ``matmat`` (one big GEMM — MXU
    shaped), and a user who only has a matvec closure gets ``matmat``
    derived here by ``jax.vmap`` over the columns of ``X`` — XLA then
    batches/fuses the vmapped closure into one program, instead of the
    reference's sequential per-column loop (``types.rs:60-71,90-101``).

    ``conj_matvec`` is optional (mirroring the reference, where
    ``ConjMatVec`` is a separate trait): without it the operator
    supports ``sample_range_by_rank`` and plain products; power
    iteration, adaptive sampling, and the range-estimate factorizations
    need the adjoint and raise a named error if it is missing.

    The closures must be jax-traceable (they run under ``jit`` /
    ``vmap`` / ``lax.while_loop``).
    """

    def __init__(self, matvec, shape, dtype=None, conj_matvec=None):
        self._matvec = matvec
        self._conj_matvec = conj_matvec
        self._shape = (int(shape[0]), int(shape[1]))
        self._dtype = jnp.dtype(dtype) if dtype is not None else jnp.dtype(
            jnp.float32)

    @property
    def shape(self) -> tuple[int, int]:
        return self._shape

    @property
    def dtype(self):
        return self._dtype

    def matvec(self, x):
        return self._matvec(x)

    def conj_matvec(self, x):
        if self._conj_matvec is None:
            raise NotImplementedError(
                "FunctionOperator was built without conj_matvec; power "
                "iteration, adaptive sampling, and the range-estimate "
                "factorizations need the adjoint action A^H x")
        return self._conj_matvec(x)

    def matmat(self, x):
        return jax.vmap(self._matvec, in_axes=1, out_axes=1)(x)

    def conj_matmat(self, x):
        if self._conj_matvec is None:
            self.conj_matvec(x[:, 0])  # raise the named error
        return jax.vmap(self._conj_matvec, in_axes=1, out_axes=1)(x)

    # pytree protocol: the closures are static metadata (hashable by
    # identity — jit caches per closure instance), no array children.
    def tree_flatten(self):
        return (), (self._matvec, self._conj_matvec, self._shape,
                    self._dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj._matvec, obj._conj_matvec, obj._shape, obj._dtype) = aux
        return obj


def as_linear_operator(op) -> LinearOperator:
    """Coerce an array, operator, or factorization container to a
    ``LinearOperator``."""
    if isinstance(op, LinearOperator):
        return op
    if hasattr(op, "apply") and hasattr(op, "conj_apply"):
        return FactoredOperator(op)
    from jax.experimental import sparse as _jsparse

    if isinstance(op, _jsparse.JAXSparse):
        return SparseOperator(op)
    try:
        # DenseOperator's own init decides host vs device placement
        # (complex on complex-rejecting devices stays host numpy)
        return DenseOperator(op)
    except (TypeError, ValueError) as e:
        raise TypeError(
            f"cannot interpret {type(op).__name__} as a linear operator; "
            "expected an array, a LinearOperator, or a factorization "
            "container with apply/conj_apply (QR/LQ containers have no "
            "factored apply — convert via to_mat() or column_id()/row_id())"
        ) from e


# ---------------------------------------------------------------------------
# Operator combinators (matrix-free algebra)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class CompositeOperator(LinearOperator):
    """Product ``A = L @ R`` of two operators, applied factored.

    The sampling pipelines then cost ``O((cost_L + cost_R) * k)`` without
    ever forming the product — e.g. compressing ``B @ C`` where both
    factors are themselves low-rank or structured.
    """

    def __init__(self, left, right):
        left, right = as_linear_operator(left), as_linear_operator(right)
        if left.ncols != right.nrows:
            raise ValueError(
                f"cannot compose {left.shape} @ {right.shape}")
        self.left, self.right = left, right

    @property
    def shape(self):
        return (self.left.nrows, self.right.ncols)

    @property
    def dtype(self):
        return jnp.result_type(self.left.dtype, self.right.dtype)

    def matmat(self, x):
        return self.left.matmat(self.right.matmat(x))

    def conj_matmat(self, x):
        return self.right.conj_matmat(self.left.conj_matmat(x))

    def tree_flatten(self):
        return (self.left, self.right), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.left, obj.right = children
        return obj


@jax.tree_util.register_pytree_node_class
class SumOperator(LinearOperator):
    """Sum ``A = B + C`` of conforming operators (e.g. sparse + low-rank)."""

    def __init__(self, *terms):
        terms = tuple(as_linear_operator(t) for t in terms)
        if not terms:
            raise ValueError("SumOperator needs at least one term")
        if len({t.shape for t in terms}) != 1:
            raise ValueError(
                f"shape mismatch: {[t.shape for t in terms]}")
        self.terms = terms

    @property
    def shape(self):
        return self.terms[0].shape

    @property
    def dtype(self):
        return jnp.result_type(*[t.dtype for t in self.terms])

    def matmat(self, x):
        out = self.terms[0].matmat(x)
        for t in self.terms[1:]:
            out = out + t.matmat(x)
        return out

    def conj_matmat(self, x):
        out = self.terms[0].conj_matmat(x)
        for t in self.terms[1:]:
            out = out + t.conj_matmat(x)
        return out

    def tree_flatten(self):
        return self.terms, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.terms = tuple(children)
        return obj


@jax.tree_util.register_pytree_node_class
class ScaledOperator(LinearOperator):
    """``A = alpha * B`` for a scalar ``alpha``."""

    def __init__(self, alpha, op):
        self.op = as_linear_operator(op)
        # promote rather than coerce: a complex scalar times a real
        # operator is a complex operator
        dt = jnp.result_type(jnp.asarray(alpha).dtype, self.op.dtype)
        self.alpha = jnp.asarray(alpha, dtype=dt)

    @property
    def shape(self):
        return self.op.shape

    @property
    def dtype(self):
        return self.alpha.dtype

    def matmat(self, x):
        return self.alpha * self.op.matmat(x)

    def conj_matmat(self, x):
        return jnp.conjugate(self.alpha) * self.op.conj_matmat(x)

    def tree_flatten(self):
        return (self.alpha, self.op), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.alpha, obj.op = children
        return obj


@jax.tree_util.register_pytree_node_class
class AdjointOperator(LinearOperator):
    """``A = B^H`` — swaps the two protocol products."""

    def __init__(self, op):
        self.op = as_linear_operator(op)

    @property
    def shape(self):
        return (self.op.ncols, self.op.nrows)

    @property
    def dtype(self):
        return self.op.dtype

    def matmat(self, x):
        return self.op.conj_matmat(x)

    def conj_matmat(self, x):
        return self.op.matmat(x)

    def to_dense(self):
        # Conjugate-transposed dense view of the wrapped operator —
        # cheap when the inner operator's is (sampling.sketched_row_id
        # stays a k-column gather). A __getattr__ hook here was dead
        # code (ADVICE r4): normal lookup finds the inherited method
        # first, so __getattr__ never fires.
        return herm(self.op.to_dense())

    def has_cheap_dense(self) -> bool:
        return self.op.has_cheap_dense()

    def tree_flatten(self):
        return (self.op,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.op,) = children
        return obj


@jax.tree_util.register_pytree_node_class
class SparseOperator(LinearOperator):
    """Sparse matrix (``jax.experimental.sparse`` BCOO) as an operator.

    Products cost O(nnz * k); combined with the algebra above this
    covers the classic "sparse near-field + low-rank far-field"
    structure: ``SumOperator(SparseOperator(S), FactoredOperator(F))``.
    """

    def __init__(self, a):
        from jax.experimental import sparse as jsparse

        if not isinstance(a, jsparse.JAXSparse):
            a = jsparse.BCOO.fromdense(jnp.asarray(a))
        if a.ndim != 2:
            raise ValueError(f"expected a sparse matrix, got ndim {a.ndim}")
        self.a = a

    @property
    def shape(self) -> tuple[int, int]:
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def matmat(self, x):
        return self.a @ jnp.asarray(x)

    def conj_matmat(self, x):
        # (A^H x) = (x^H A)^H — right-multiplication keeps the sparse
        # operand in its native layout
        return herm(herm(jnp.asarray(x)) @ self.a)

    def to_dense(self):
        return self.a.todense()

    # pytree protocol
    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.a,) = children
        return obj
