"""Multi-host process-group helpers.

TPU-native replacement for the communication backend the reference never
had (SURVEY.md §5 "Distributed communication backend"): process groups
come from ``jax.distributed``, SPMD from ``Mesh`` + sharding, and
collectives compile to ICI (intra-slice) / DCN (cross-host) transfers.

Design choices that remove communication entirely:

* **Sketches are derived, not broadcast.** Every host derives identical
  Gaussian sketches from the same functional PRNG key, so the "broadcast
  the shared sketch" step of the north star costs zero bytes on the wire.
* **Block compressions are independent**, so elastic recovery is
  re-submission of unfinished blocks (SURVEY.md §5 failure detection) —
  there is no global state to checkpoint mid-factorization.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = [
    "initialize",
    "global_mesh",
    "local_block_slice",
    "gather_factors",
]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None, **kwargs) -> bool:
    """Initialize the multi-host process group (idempotent).

    On a single-process run this is a no-op returning False; on a pod
    slice it wires up ``jax.distributed`` so ``jax.devices()`` spans all
    hosts. Safe to call unconditionally at program start.
    """
    if jax.process_count() > 1:
        return True  # already initialized by the launcher
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def global_mesh(axis_name: str = "blocks"):
    """1-D mesh over every device of every process."""
    from .mesh import make_mesh

    return make_mesh(axis_names=(axis_name,))


def local_block_slice(n_blocks: int) -> slice:
    """Submission-order slice of blocks owned by this process.

    Blocks are dealt out contiguously so the final gather is a plain
    ordered concatenation (the north star's "factors gathered in
    submission order").
    """
    per = -(-n_blocks // jax.process_count())
    lo = per * jax.process_index()
    return slice(lo, min(lo + per, n_blocks))


def gather_factors(factors):
    """Fetch (possibly sharded) factor containers to host memory as numpy,
    preserving the leading submission-order batch axis."""
    gathered = jax.device_get(factors)
    return jax.tree_util.tree_map(np.asarray, gathered)
