"""Device-mesh data parallelism for block compression.

Second level of the scale-out hierarchy (SURVEY.md §2 "Parallelism /
distributed strategies", §7 layer B5): a stack of independent operator
blocks is sharded over the ``"blocks"`` axis of a ``jax.sharding.Mesh``
and compressed SPMD — each device runs the same vmapped pipeline on its
local shard, with zero inter-device communication in the compute path
(block compressions are independent; collectives only appear if the
caller gathers factors or aggregates metrics).

The reference has no distributed layer at all (single-threaded Rust +
LAPACK); this module is the TPU-native replacement for "run the library
once per block on a cluster": one ``jit``, sharding propagated by XLA's
SPMD partitioner over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .batch import (
    batched_column_id,
    batched_nystrom,
    batched_row_id,
    batched_rsvd,
    batched_sketched_two_sided_id,
    batched_two_sided_id,
)

__all__ = [
    "make_mesh",
    "shard_blocks",
    "compress_blocks",
    "compress_blocks_adaptive",
    "replicate",
]

_METHODS = {
    "rsvd": batched_rsvd,
    "nystrom": batched_nystrom,
    "column_id": batched_column_id,
    "row_id": batched_row_id,
    "two_sided_id": batched_two_sided_id,
    "sketched_two_sided_id": batched_sketched_two_sided_id,
}


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, ...] = ("blocks",),
              shape: tuple[int, ...] | None = None,
              devices=None) -> Mesh:
    """Build a ``Mesh`` over the first ``n_devices`` devices.

    Default is a 1-D ``"blocks"`` data-parallel mesh. Pass
    ``axis_names=("blocks", "rows")`` and a ``shape`` to combine block
    data-parallelism with row-sharded operators (see
    ``parallel.sharded``).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def _spans_processes(mesh: Mesh) -> bool:
    return any(d.process_index != jax.process_index()
               for d in mesh.devices.flat)


def _place(x, sharding):
    """Place a process-local array under a (possibly multi-host) sharding.

    Single-process meshes use ``device_put``; meshes spanning processes
    need ``make_array_from_callback`` (each process contributes only its
    addressable shards — valid here because every process holds the full
    value, derived from shared PRNG keys rather than broadcast)."""
    if not _spans_processes(sharding.mesh):
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def shard_blocks(blocks, mesh: Mesh, axis: str = "blocks"):
    """Place a ``(B, m, n)`` stack with its leading axis sharded over
    ``axis``; B must divide evenly by the axis size (pad with zero blocks
    upstream — the scheduler does — if it doesn't)."""
    blocks = jnp.asarray(blocks)
    spec = P(axis, *([None] * (blocks.ndim - 1)))
    return _place(blocks, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    """Place a value fully replicated over the mesh."""
    return _place(jnp.asarray(x), NamedSharding(mesh, P()))


def _shard_for_mesh(blocks, key, mesh: Mesh, axis: str):
    """Validate divisibility and place (blocks, key) for SPMD over the mesh."""
    n_shards = mesh.shape[axis]
    if blocks.shape[0] % n_shards:
        raise ValueError(
            f"block count {blocks.shape[0]} not divisible by mesh axis "
            f"{axis!r} ({n_shards}); pad the stack (see "
            "parallel.scheduler) first")
    return shard_blocks(blocks, mesh, axis), replicate(key, mesh)


@functools.lru_cache(maxsize=None)
def _compiled_compress(method: str, rank: int, opts: tuple):
    fn = _METHODS[method]
    kwargs = dict(opts)

    @jax.jit
    def run(blocks, key):
        return fn(blocks, key, rank, **kwargs)

    return run


def compress_blocks(blocks, key, rank: int, method: str = "rsvd",
                    mesh: Mesh | None = None, axis: str = "blocks",
                    **kwargs):
    """Compress a ``(B, m, n)`` block stack, optionally sharded over a mesh.

    With ``mesh`` given, the stack is sharded over ``axis`` and the
    single jitted program runs SPMD across the mesh's devices (output
    factors stay sharded the same way — gather at the host boundary with
    ``jax.device_get`` / ``distributed.gather_factors``). Without a mesh
    it is plain on-chip batching.

    ``method`` is one of ``"rsvd"``, ``"nystrom"``, ``"column_id"``,
    ``"row_id"``, ``"two_sided_id"``; extra kwargs go to the per-block
    pipeline (``oversample``, ``power_iters``, ``mode`` …).
    """
    if method not in _METHODS:
        raise ValueError(f"unknown method {method!r}; expected one of "
                         f"{sorted(_METHODS)}")
    blocks = jnp.asarray(blocks)
    if mesh is not None:
        blocks, key = _shard_for_mesh(blocks, key, mesh, axis)
    run = _compiled_compress(method, int(rank), tuple(sorted(kwargs.items())))
    return run(blocks, key)


@functools.lru_cache(maxsize=None)
def _compiled_adaptive(rel_tol: float, sample_size: int, max_rank, opts: tuple):
    from .batch import batched_adaptive_rsvd

    kwargs = dict(opts)

    @jax.jit
    def run(blocks, key):
        return batched_adaptive_rsvd(blocks, key, rel_tol, sample_size,
                                     max_rank, **kwargs)

    return run


@functools.lru_cache(maxsize=None)
def _compiled_adaptive_sharded(rel_tol: float, sample_size: int, max_rank,
                               opts: tuple, mesh: Mesh, axis: str):
    """Adaptive DP program with per-device stopping.

    A plain ``vmap`` of the adaptive ``lax.while_loop`` over a sharded
    batch axis makes the loop predicate a cross-device reduction — XLA
    inserts a scalar all-reduce per iteration, a per-step sync barrier
    between otherwise independent blocks. Wrapping the local vmapped
    loop in ``shard_map`` keeps each device's loop private: it stops
    when *its* blocks converge, and the compiled program contains zero
    collectives (asserted by ``test_parallel.py``'s HLO scan — the
    compile-time form of BASELINE config 5's linear-scaling argument).
    """
    from .batch import adaptive_rsvd_block

    kwargs = dict(opts)
    fn = functools.partial(adaptive_rsvd_block, rel_tol=rel_tol,
                           sample_size=sample_size, max_rank=max_rank,
                           **kwargs)

    def local(blocks, keys):
        return jax.vmap(fn)(blocks, keys)

    @jax.jit
    def run(blocks, key):
        keys = jax.random.split(key, blocks.shape[0])
        shapes = jax.eval_shape(local, blocks, keys)
        out_specs = jax.tree_util.tree_map(
            lambda s: P(axis, *([None] * (s.ndim - 1))), shapes)
        # check_vma off: the while_loop carry mixes device-varying block
        # state with replicated loop counters, which the varying-axis
        # checker rejects; correctness is covered by the exact-parity
        # test against the unsharded program.
        return jax.shard_map(local, mesh=mesh,
                             in_specs=(P(axis), P(axis)),
                             out_specs=out_specs,
                             check_vma=False)(blocks, keys)

    return run


def compress_blocks_adaptive(blocks, key, rel_tol: float, sample_size: int,
                             max_rank: int | None = None,
                             mesh: Mesh | None = None, axis: str = "blocks",
                             **kwargs):
    """Tolerance-driven analogue of ``compress_blocks``: every block in
    the (optionally mesh-sharded) stack discovers its own rank on device.

    Returns ``(svd_padded, ranks, histories)`` — see
    ``parallel.batch.batched_adaptive_rsvd``.
    """
    blocks = jnp.asarray(blocks)
    mr = None if max_rank is None else int(max_rank)
    opts = tuple(sorted(kwargs.items()))
    if mesh is not None:
        blocks, key = _shard_for_mesh(blocks, key, mesh, axis)
        run = _compiled_adaptive_sharded(float(rel_tol), int(sample_size),
                                         mr, opts, mesh, axis)
    else:
        run = _compiled_adaptive(float(rel_tol), int(sample_size), mr, opts)
    return run(blocks, key)
