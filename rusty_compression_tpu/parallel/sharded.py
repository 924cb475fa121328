"""Row-sharded linear operators — model parallelism for one big operator.

Block data-parallelism (``parallel.mesh``) covers the north-star
workload; this module covers the stretch case SURVEY.md §5 calls out: an
operator too tall for one device. The matrix's *rows* are sharded over a
mesh axis, and the two protocol products become SPMD programs with
explicit XLA collectives via ``jax.shard_map``:

* ``matmat``  (``Y = A @ X``): X is replicated, each device multiplies
  its local row block — **no communication at all**; the result rows stay
  sharded like A's.
* ``conj_matmat`` (``Z = A^H @ Y``): Y is sharded like A's rows, each
  device computes its partial ``A_local^H @ Y_local``, and a single
  ``psum`` over the row axis rides the ICI ring to produce the
  replicated result.

That communication pattern (one all-reduce per adjoint product) is
exactly what the randomized range samplers need: ``sample_range_*`` and
the adaptive sampler only touch the operator through these two products,
so they run *distributed without modification* — the matrix-free
protocol is the sharding boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..linop import LinearOperator
from ..utils.dtypes import herm

__all__ = ["RowShardedOperator"]


@jax.tree_util.register_pytree_node_class
class RowShardedOperator(LinearOperator):
    """Dense ``(m, n)`` operator with rows sharded over a mesh axis.

    The wrapped array is placed with ``NamedSharding(mesh, P(axis, None))``
    — ``m`` must divide by the axis size. Products are explicit
    ``shard_map`` programs, so the collective structure is visible and
    fixed (one ``psum`` per adjoint product, nothing else) rather than
    left to the partitioner.
    """

    def __init__(self, a, mesh: Mesh, axis: str = "rows", *,
                 _already_placed: bool = False):
        self.mesh = mesh
        self.axis = axis
        if not _already_placed:
            a = jnp.asarray(a)
            if a.shape[0] % mesh.shape[axis]:
                raise ValueError(
                    f"row count {a.shape[0]} not divisible by mesh axis "
                    f"{axis!r} ({mesh.shape[axis]})")
            a = jax.device_put(a, NamedSharding(mesh, P(axis, None)))
        self.a = a

    @property
    def shape(self) -> tuple[int, int]:
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    # -- protocol products (SPMD) ------------------------------------------
    def matmat(self, x):
        """``A @ X`` — embarrassingly row-parallel: zero collectives."""
        f = jax.shard_map(
            lambda a_blk, x_rep: a_blk @ x_rep,
            mesh=self.mesh,
            in_specs=(P(self.axis, None), P(None, None)),
            out_specs=P(self.axis, None),
        )
        return f(self.a, x)

    def conj_matmat(self, y):
        """``A^H @ Y`` — local partial products + one ``psum`` over the
        row axis (reduce rides ICI; result replicated)."""
        axis = self.axis
        f = jax.shard_map(
            lambda a_blk, y_blk: jax.lax.psum(herm(a_blk) @ y_blk, axis),
            mesh=self.mesh,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=P(None, None),
        )
        return f(self.a, y)

    def to_dense(self):
        return self.a

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.a,), (self.mesh, self.axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        mesh, axis = aux
        (a,) = children
        return cls(a, mesh, axis, _already_placed=True)
