"""Scale-out layer: batching, device meshes, sharded operators, and the
heterogeneous-block scheduler (SURVEY.md §7 layers B5–B6).

The reference library is single-threaded and single-matrix; everything
in this package is new TPU-native capability:

* ``batch`` — vmapped same-shape block pipelines (one compiled program,
  MXU-batched GEMMs).
* ``mesh`` — block data-parallelism over a ``jax.sharding.Mesh``.
* ``sharded`` — row-sharded operators with explicit ``shard_map`` /
  ``psum`` products (model parallelism for one oversized operator).
* ``scheduler`` — shape-bucketed dispatch for heterogeneous block
  streams, submission-order results, per-block metrics.
* ``distributed`` — multi-host process groups and ordered gathering.
"""

from .batch import (
    adaptive_rsvd_block,
    batched_adaptive_rsvd,
    batched_column_id,
    batched_nystrom,
    batched_rel_diff_fro,
    batched_row_id,
    batched_rsvd,
    batched_sketched_two_sided_id,
    batched_two_sided_id,
    column_id_block,
    nystrom_block,
    row_id_block,
    rsvd_block,
    sketched_two_sided_id_block,
    two_sided_id_block,
)
from .distributed import (
    gather_factors,
    global_mesh,
    initialize,
    local_block_slice,
)
from .mesh import (compress_blocks, compress_blocks_adaptive,
                   make_mesh, replicate, shard_blocks)
from .scheduler import (
    BlockResult,
    bucket_dim,
    compress_heterogeneous,
    compress_heterogeneous_refined,
    plan_buckets,
)
from .sharded import RowShardedOperator

__all__ = [
    "rsvd_block", "nystrom_block", "column_id_block", "row_id_block", "two_sided_id_block", "sketched_two_sided_id_block",
    "adaptive_rsvd_block", "batched_adaptive_rsvd",
    "batched_rsvd", "batched_nystrom", "batched_column_id", "batched_row_id",
    "batched_two_sided_id", "batched_sketched_two_sided_id",
    "batched_rel_diff_fro",
    "make_mesh", "shard_blocks", "replicate", "compress_blocks",
    "compress_blocks_adaptive",
    "RowShardedOperator",
    "BlockResult", "bucket_dim", "plan_buckets", "compress_heterogeneous",
    "compress_heterogeneous_refined",
    "initialize", "global_mesh", "local_block_slice", "gather_factors",
]
