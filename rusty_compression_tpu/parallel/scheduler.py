"""Shape-bucketed scheduler for heterogeneous block workloads.

The north-star workload (BASELINE.md config 5) is a stream of ~10k
H-matrix blocks with heterogeneous shapes (1k–16k dims). XLA compiles
one program per shape, so naive per-block dispatch causes a jit storm;
this scheduler makes the shape set finite:

1. every block's dims are rounded **up** to a bucket grid (powers of two
   above a floor by default — a handful of distinct compiled programs
   total);
2. blocks in the same bucket are zero-padded and stacked; padding is
   exact for every algorithm here (zero rows/columns of the operand
   produce zero rows of U / columns of Vt and are never chosen as
   pivots while genuine columns remain);
3. each bucket stack runs through the batched (optionally mesh-sharded)
   pipeline — one compile per (bucket-shape, batch-bucket) pair;
4. results are un-padded and returned **in submission order** with a
   per-block structured metrics record (SURVEY.md §5's
   metrics/observability subsystem: block id, shape, achieved rank,
   relative residual, wall time, bucket).

The bucket-packing core (grouping + batch padding plan) also has a C++
implementation (``native/``) for million-block manifests; this module is
the reference implementation and the fallback.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Sequence

import jax
import numpy as np

#: per-chunk stage timings (pack/enqueue vs finish) + per-block repair
#: events; enable with RC_CHUNK_LOG=1 (CLI) or standard logging config
_chunk_log = logging.getLogger("rusty_compression_tpu.scheduler.chunks")

from .batch import batched_rel_diff_fro
from .mesh import compress_blocks, compress_blocks_adaptive

#: Acceptance slack over the spectral-cut-optimal Frobenius residual
#: (RefinedSVD.opt_resid): a block within OPT_SLACK of its own core
#: spectrum's tail mass achieved what the spectral tolerance contract
#: allows (flat-tailed spectra cannot reach 5*tol in Frobenius norm).
#: 1.5 (round 5; was 1.25): right-sized captures on the volume's
#: flat-tail blocks intrinsically land at (1.05-1.3)x opt — 1.25 was
#: knife-edged against that class and half the stream hard-repaired
#: into the same place. The 5*tol floor still gates fast-decay
#: spectra at the round-4 strictness.
OPT_SLACK = 1.5
#: Repair trigger multiple of the tolerance: blocks above
#: consecutive useless soft repairs before the stream stops
#: margin-restoration repairs (hard acceptance-failure repairs are
#: never disabled; see needs_repair in the refined stream driver)
SOFT_REPAIR_LIMIT = 3

#: max(REPAIR_TOL_FACTOR*tol, OPT_SLACK*opt) re-run through the exact
#: host route (then growth) BEFORE the 5*tol acceptance gate — capture
#: outliers are repaired to ~tol instead of shipping at the boundary.
REPAIR_TOL_FACTOR = 2.0

__all__ = [
    "BlockResult",
    "bucket_dim",
    "plan_buckets",
    "compress_heterogeneous",
    "compress_heterogeneous_refined",
]


def bucket_dim(d: int, floor: int = 128) -> int:
    """Round a dimension up to the bucket grid: the next power of two at
    or above ``floor``. Keeps the distinct-shape count logarithmic in the
    dimension range (1k–16k → 5 buckets per axis)."""
    d = int(d)
    b = int(floor)
    while b < d:
        b *= 2
    return b


def _batch_bucket(n: int, granule: int) -> int:
    """Round a batch count up to a multiple of ``granule`` (so stacks
    divide evenly over a mesh axis and batch shapes also come from a
    small set)."""
    return -(-n // granule) * granule


@dataclasses.dataclass(frozen=True)
class BlockResult:
    """Per-block outcome + metrics record (SURVEY.md §5 observability)."""

    index: int                       # submission-order id
    shape: tuple[int, int]           # original (m, n)
    bucket: tuple[int, int]          # padded (m, n) it ran at
    rank: int
    rel_residual: float              # relative Frobenius reconstruction err
    wall_time_s: float               # pipelined dispatch->collect latency
    #   of its chunk / chunk size: includes overlapped host packing of
    #   the next chunk, so it is a latency figure, not pure compute time
    factors: Any                     # un-padded factor container
    device_time_s: float = 0.0       # device-busy window of its chunk /
    #   chunk size: ready(k) − max(ready(k−1), enqueue_end(k)) — the span
    #   in which the device could have been running this chunk (in-order
    #   execution), so queue wait and overlapped host packing are
    #   excluded. Upper bound on compute + result transfer;
    #   device_time_s <= wall_time_s by construction.
    error: str | None = None         # per-block failure record (e.g.
    #   tolerance unreachable): the stream survives, the block is marked
    #   (SURVEY §5 elastic recovery; the reference errors per matrix,
    #   svd.rs:97-100 — a stream driver must not die to one bad block)

    @property
    def ok(self) -> bool:
        return self.error is None

    def record(self) -> dict:
        """Structured log record (JSON-ready)."""
        return {
            "block": self.index,
            "m": self.shape[0],
            "n": self.shape[1],
            "bucket_m": self.bucket[0],
            "bucket_n": self.bucket[1],
            "rank": self.rank,
            "rel_residual": self.rel_residual,
            "wall_time_s": self.wall_time_s,
            "device_time_s": self.device_time_s,
            "error": self.error,
        }


def plan_buckets(shapes: Sequence[tuple[int, int]], floor: int = 128
                 ) -> dict[tuple[int, int], list[int]]:
    """Group submission indices by bucketed shape.

    Pure planning (no array work) — this is the piece mirrored in C++
    for very large manifests.
    """
    groups: dict[tuple[int, int], list[int]] = {}
    for i, (m, n) in enumerate(shapes):
        b = (bucket_dim(m, floor), bucket_dim(n, floor))
        groups.setdefault(b, []).append(i)
    return groups


def _chunk_batch(count: int, granule: int, bm: int, bn: int,
                 elem_size: int, budget_bytes: int) -> int:
    """Fixed chunk batch for a bucket of ``count`` blocks under a host
    byte budget: the largest multiple of ``granule`` whose padded
    (batch, bm, bn) stack fits in ``budget_bytes``, clamped to
    [granule, padded-count]. Fixed per bucket so every chunk reuses one
    compiled program. Mirrors ``native/rc_native.cpp::rc_chunk_batch``;
    the C++ runtime is preferred when loadable.
    """
    from .. import native as _native

    # Device-stack lane cap (round 5): the axon backend returns
    # NON-FINITE results from large vmapped capture programs — measured
    # cliff between 128 and 169 lanes of a (256, 512) f32 stack (64 vs
    # 84 MB; nb<=128 all-finite, nb=169 -> 85/169 lanes nan,
    # deterministic). Cap the per-program stack at the measured-good
    # 64 MB so no chunk crosses it. Override via RC_DEVICE_CHUNK_MB.
    import os as _os

    # The cliff MOVES with backend state (nb=128 clean at 14:51, 122
    # returning 71% garbage at 15:06 in the same session; nb<=16 clean
    # throughout) — cap conservatively; refined_fused_batch_finish
    # detects residual garbage and re-runs bad lanes in small
    # sub-batches.
    env_mb = _os.environ.get("RC_DEVICE_CHUNK_MB")
    cap_mb = float(env_mb) if env_mb else 16.0
    cap_lanes = max(int(cap_mb * 1e6) // (bm * bn * 4 * granule),
                    1) * granule
    if not env_mb:
        # default-mode absolute lane clamp (the cliff was measured on
        # one shape only); an explicit RC_DEVICE_CHUNK_MB override is
        # honored byte-for-byte
        cap_lanes = min(cap_lanes, max(32 // granule, 1) * granule)

    nb = _native.chunk_batch(count, granule, bm, bn, elem_size, budget_bytes)
    if nb is not None:
        return min(nb, cap_lanes)
    padded = _batch_bucket(count, granule)
    if budget_bytes <= 0:
        return min(padded, cap_lanes)
    granule_bytes = bm * bn * elem_size * granule
    fit = max(budget_bytes // granule_bytes, 1) * granule
    return min(padded, fit, cap_lanes)


def _unpad_factors(factors, i: int, m: int, n: int, method: str):
    """Slice block ``i``'s factors back to the original (m, n) frame."""
    f = jax.tree_util.tree_map(lambda leaf: leaf[i], factors)
    cls = type(factors)
    if method in ("rsvd", "nystrom"):
        return cls(f.u[:m, :], f.s, f.vt[:, :n])
    if method == "column_id":
        return cls(f.c[:m, :], f.z[:, :n], f.col_ind)
    if method == "row_id":
        return cls(f.x[:m, :], f.r[:, :n], f.row_ind)
    if method in ("two_sided_id", "sketched_two_sided_id"):
        return cls(f.c[:m, :], f.x, f.r[:, :n], f.row_ind, f.col_ind)
    raise ValueError(f"unknown method {method!r}")


def compress_heterogeneous(blocks: Sequence, key, rank: int | None = None,
                           method: str = "rsvd",
                           mesh=None, axis: str = "blocks",
                           bucket_floor: int = 128,
                           batch_granule: int | None = None,
                           rel_tol: float | None = None,
                           sample_size: int = 10,
                           window: int = 2,
                           chunk_bytes: int = 1 << 30,
                           on_result=None,
                           **kwargs) -> list[BlockResult]:
    """Compress a heterogeneous list of dense blocks.

    Either to fixed ``rank`` (``method`` selects the factorization), or —
    when ``rel_tol`` is given instead — adaptively: every block discovers
    its own rank to the relative tolerance on device
    (``method`` is then ignored; the factorization is an SVD).

    Returns one ``BlockResult`` per input block, **in submission order**
    regardless of bucket execution order. With a ``mesh``, each bucket's
    stack is sharded over ``axis`` (stacks are padded up to a multiple of
    the axis size with zero blocks, which are compressed and discarded).
    ``window`` chunks are kept in flight (host packing of the next chunk
    overlaps device compute; peak device memory scales with the window).

    Each bucket is executed in chunks whose padded input stack is at most
    ``chunk_bytes`` (default 1 GiB): the north-star stream (~10k blocks,
    some landing in the (16384, 16384) bucket) must not materialize a
    whole bucket as one host stack. The chunk batch is FIXED per bucket
    (last chunk zero-padded), so chunking adds no extra compilations.
    Peak host memory is ~``window`` input stacks ≤ ``chunk_bytes`` each
    plus their factors. ``chunk_bytes<=0`` disables chunking.
    """
    if (rank is None) == (rel_tol is None):
        raise ValueError("pass exactly one of rank= or rel_tol=")
    shapes = [tuple(np.shape(b)) for b in blocks]
    for s in shapes:
        if len(s) != 2:
            raise ValueError(f"blocks must be matrices, got shape {s}")
        if rank is not None and rank > min(s):
            raise ValueError(f"rank {rank} exceeds min dim of block {s}")
    if batch_granule is None:
        batch_granule = mesh.shape[axis] if mesh is not None else 1

    # Plan with the C++ host runtime when available (identical output;
    # the Python planner is the fallback and the executable spec).
    from .. import native as _native

    nplan = _native.plan(shapes, bucket_floor, batch_granule)
    groups = nplan.groups() if nplan is not None else plan_buckets(
        shapes, bucket_floor)
    results: list[BlockResult | None] = [None] * len(shapes)

    # Split each bucket into fixed-batch chunks under the byte budget
    # (one compiled program per bucket; the last chunk is zero-padded).
    chunks: list[tuple] = []
    for (bm, bn), idxs in sorted(groups.items()):
        dtype = np.result_type(*[np.asarray(blocks[i]).dtype for i in idxs])
        cb = _chunk_batch(len(idxs), batch_granule, bm, bn, dtype.itemsize,
                          chunk_bytes)
        for lo in range(0, len(idxs), cb):
            chunks.append((bm, bn, cb, idxs[lo:lo + cb], dtype))
    keys = jax.random.split(key, max(len(chunks), 1))

    def dispatch(gk, bm, bn, cb, idxs, dtype):
        """Pack + enqueue one chunk's work (device runs asynchronously)."""
        stack = np.zeros((cb, bm, bn), dtype=dtype)
        for slot, i in enumerate(idxs):
            m, n = shapes[i]
            stack[slot, :m, :n] = np.asarray(blocks[i])
        t0 = time.perf_counter()
        if rel_tol is not None:
            factors, ranks, _hist = compress_blocks_adaptive(
                stack, gk, rel_tol, sample_size, mesh=mesh, axis=axis,
                **kwargs)
            out_method = "rsvd"  # adaptive factors are SVD containers
        else:
            factors = compress_blocks(stack, gk, rank, method=method,
                                      mesh=mesh, axis=axis, **kwargs)
            ranks = np.full(cb, int(rank))
            out_method = method
        errs = batched_rel_diff_fro(factors, stack)
        t_enq = time.perf_counter()
        return (bm, bn, idxs, factors, ranks, errs, out_method, t0, t_enq)

    prev_ready = [0.0]  # when the previous chunk's results became available

    def collect(work):
        """Fetch one chunk's finished results and un-pad in place."""
        bm, bn, idxs, factors, ranks, errs, out_method, t0, t_enq = work
        errs = np.asarray(jax.device_get(errs))
        ranks = np.asarray(jax.device_get(ranks))
        factors = jax.device_get(factors)
        t_ready = time.perf_counter()
        per_block = (t_ready - t0) / len(idxs)
        # Device-busy window: the device executes chunks in order, so it
        # could only have worked on this chunk between the previous
        # chunk's completion and this one's (and not before enqueue).
        dev_block = (t_ready - max(prev_ready[0], t_enq)) / len(idxs)
        prev_ready[0] = t_ready
        for slot, i in enumerate(idxs):
            m, n = shapes[i]
            f = _unpad_factors(factors, slot, m, n, out_method)
            if rel_tol is not None:
                # slice the padded SVD to the achieved rank
                r_i = int(ranks[slot])
                f = type(f)(f.u[:, :r_i], f.s[:r_i], f.vt[:r_i, :])
            results[i] = BlockResult(
                index=i, shape=(m, n), bucket=(bm, bn), rank=int(ranks[slot]),
                rel_residual=float(errs[slot]), wall_time_s=per_block,
                factors=f, device_time_s=dev_block)
            if on_result is not None:
                on_result(results[i])

    # Windowed pipeline: keep up to `window` chunks in flight so host-side
    # packing of the next chunk overlaps device compute of the current one
    # (dispatch is async; only `collect` synchronizes). The window bounds
    # peak host/device memory to `window` padded stacks + factors.
    t_start = time.perf_counter()
    in_flight: list = []
    for gk, (bm, bn, cb, idxs, dtype) in zip(keys, chunks):
        in_flight.append(dispatch(gk, bm, bn, cb, idxs, dtype))
        if len(in_flight) >= window:
            collect(in_flight.pop(0))
    for work in in_flight:
        collect(work)
    elapsed = time.perf_counter() - t_start
    if results and elapsed > 0:
        total_bytes = sum(np.asarray(b).nbytes for b in blocks)
        _log_throughput(len(results), elapsed, total_bytes)
    return results  # type: ignore[return-value]


def compress_heterogeneous_refined(blocks: Sequence, key,
                                   rel_tol: float = 1e-8,
                                   round_rank: int | None = 128,
                                   bucket_floor: int = 128,
                                   chunk_bytes: int = 256 << 20,
                                   mesh=None, axis: str = "blocks",
                                   window: int = 2,
                                   on_result=None,
                                   **kwargs) -> list[BlockResult]:
    """Heterogeneous block stream at the north-star tolerance (<= 1e-8).

    The device-side adaptive path (``compress_heterogeneous(rel_tol=)``)
    is bounded by f32 accuracy (~1e-7); this driver routes every block
    through the compensated-precision pipeline, reaching the
    reference's f64 accuracy class on bf16 hardware.

    Blocks are padded to the bucket grid and each bucket is stacked
    into fixed-size chunks under ``chunk_bytes`` (compile reuse + host
    memory bound, like ``compress_heterogeneous``); every chunk runs as
    ONE vmapped fused capture + ONE final apply
    (``highacc.refined_fused_batch_begin/finish``) — dispatch count is
    O(1) per chunk instead of O(blocks), which at north-star volume
    (10k blocks) is the difference between seconds and ~8 minutes of
    tunnel flush latency. ``window`` chunks stay in flight: the next
    chunk's packing + device capture overlap the current chunk's host
    tail (batched f64 SVD + per-block f64 verification). Any block
    missing the 5x gate re-runs through the host-orchestrated
    ``refined_rsvd`` (exact-Gram independence handling); a second miss
    re-runs with ``tol`` alone — the growth capture DISCOVERS the rank
    (reference adaptive-sampler semantics, random_sampling.rs:202-282),
    so a block whose true rank exceeds the fixed-round capacity
    ``round_rank * (1 + refine_rounds)`` still lands at tolerance
    instead of being recorded failed. A block whose
    tolerance is genuinely unreachable is CONTAINED — recorded with
    ``error`` set and full-rank factors — instead of killing the stream
    (SURVEY §5 elastic recovery; the reference errors per matrix,
    svd.rs:97-100). Zero padding is exact (zero rows/columns carry zero
    singular weight); ragged chunks are filled with rank-1 fillers so
    every chunk reuses one compiled program.

    ``round_rank=None`` switches every chunk to the BATCHED GROWTH
    capture (``highacc._fused_growth`` vmapped): per-block rank
    discovery at ``rel_tol`` in one device program per chunk — the
    reference's adaptive-sampler semantics at volume
    (random_sampling.rs:202-282) with the residual tracked exactly in
    double-float. Padded frames are handled natively there (zero-cut
    merge + measured per-block stopping), so only degenerate blocks
    (min dim < 8) pre-route.

    Returns ``BlockResult``s in submission order; ``factors`` is a
    ``models.SVD`` of host f64/c128 numpy arrays (io-serializable;
    reconstruct in numpy to keep f64 accuracy).
    """
    from ..highacc import (refined_fused_batch_begin,
                           refined_fused_batch_finish, refined_rsvd)
    from ..models.svd import SVD
    from ..utils.errors import CompressionError

    shapes = [tuple(np.shape(b)) for b in blocks]
    groups = plan_buckets(shapes, bucket_floor)
    results: list[BlockResult | None] = [None] * len(shapes)
    keys = jax.random.split(key, max(len(shapes), 1))
    t_start = time.perf_counter()
    granule = 1 if mesh is None else int(mesh.shape[axis])

    # Blocks whose CONTENT min dim is below the capture width l are
    # structurally rank-deficient inside the padded bucket frame
    # (sketch columns beyond the content rank come out as garbage
    # fillers that poison the DF merge — highacc._certify_basis).
    # Round 3 pre-routed every such block through the ~30-dispatch
    # host-orchestrated pipeline — measured ~40 s/block through the
    # tunnel, 100x the batched path, and it dominated the 1k-block
    # volume run. Round 4 instead CLAMPS the capture width per chunk to
    # the chunk's smallest content min dim (so no block in the chunk is
    # structurally deficient at that width), quantized to powers of two
    # (each distinct width is a separate tunnel compile, ~1-2 min —
    # coarse quantization keeps the compile-key count at ~2 per
    # bucket). Chunks are sorted by content min dim first, so widths
    # are chunk-homogeneous. Capacity stays sufficient: a power-of-two
    # width l >= cmin/2 gives 2-round capacity 2l >= the largest
    # content min dim a 128-grid bucket can pair with cmin. Blocks a
    # clamped width cannot reach at tol fall through to the growth
    # fallback like any other miss.
    # round_rank=None: BATCHED GROWTH mode — each chunk runs the vmapped
    # fused growth loop (highacc._fused_growth), discovering every
    # block's rank at rel_tol in one device program (the reference's
    # adaptive-sampler semantics at volume, random_sampling.rs:202-282).
    growth = round_rank is None
    oversample = int(kwargs.get("oversample", 10))
    # growth mode: 128 caps the per-round width (the loop stops on the
    # measured residual, so width only sets per-round cost granularity)
    l_cap = 128 if growth else int(round_rank) + oversample

    # Width feedback (round 5): capture error GROWS with width on
    # flat-tail blocks — the f32 rounds' extra noise directions
    # contaminate the DF merge. Measured on the volume's Laplace
    # blocks (rank 17-27, CPU-reproduced): l=138 -> 3.5-4.4e-7,
    # l=128 -> 2.8e-7, l=96 -> 9e-8, l=64+rr1 / l=74 -> 4.4-5.0e-8 =
    # the spectral-cut optimum. Each bucket therefore runs a small
    # PILOT chunk at the default width; its accepted ranks set the
    # following chunks' width to ~2*rank + oversample (next power of
    # two) with ONE refine round (rr=2 at narrow widths re-degrades:
    # l=64 rr=2 measured 6.7-8.3e-8).
    rank_seen: dict[tuple[int, int], int] = {}

    def chunk_width(chunk, bucket=None):
        """(width, feedback_active) for a chunk: the default clamp
        (l_cap / pow2 <= content min dim), narrowed by the bucket's
        observed-rank feedback. Below 8, the per-block host route
        stays (degenerate frames)."""
        cmin = min(min(shapes[i]) for i in chunk)
        if cmin < 8:
            return 8, False  # tiny blocks in this chunk pre-route
        # width <= cmin/2: a round width near the content min dim
        # SATURATES the content space and floors the capture at
        # (1.6-2)x its optimum (measured across buckets: l=138 at
        # cmin~146 -> 3.5-4.4e-7, l=74 -> optimal; l=64 at cmin~65-70
        # -> 6.5-8.4e-8 vs opt 4e-8 on the 10k volume). Capacity stays
        # sufficient: two rounds give 2l ~ cmin >= any content rank.
        half = max(cmin // 2, 8)
        base = min(l_cap, 1 << (half.bit_length() - 1))
        r = rank_seen.get(bucket) if bucket is not None else None
        if r is not None and not growth:
            t = max(2 * r + oversample, 16)
            # nearest multiple of 32 (pow2 rounding overshot: rank 28
            # -> t=66 -> 128, right back in the degraded-width regime;
            # 32-step keys keep the compile count per bucket small).
            # feedback_active even at fb == base: rank history also
            # caps refine_rounds at 1 — a 3-round capture at l ~ cmin
            # saturates the content space and repairs the whole chunk
            # (10k-run pilots, 16:48: l=64 rr=2 chunks at 1.3-3.4e-7
            # vs opt 3-4e-8 on cmin-69 content)
            fb = max(32 * round(t / 32), 32)
            return min(fb, base), True
        elif not growth:
            # pilot (no rank history yet): start NARROW — on flat-tail
            # volumes 64 is the right width (wide pilots repaired ~70%
            # of their blocks at 10-30 s each); a deep-rank block the
            # 2x-capacity cannot reach falls to the growth fallback
            # once, and its discovered rank right-sizes the bulk.
            return min(base, 64), False
        return base, False

    def is_pre_routed(i, l_chunk, bm, bn):
        # growth mode: padded frames are handled natively (zero-cut
        # merge + per-block residual stopping); only degenerate frames
        # pre-route. Fixed-round mode: any block narrower than the
        # chunk's capture width.
        if growth:
            return min(shapes[i]) < 8
        return min(shapes[i]) < min(l_chunk, bm, bn)

    def dispatch(gi, c0, bm, bn, batch, chunk):
        """Pack + enqueue one chunk's capture (device runs async)."""
        dtype = np.result_type(np.float64,
                               *[np.asarray(blocks[i]).dtype
                                 for i in chunk])
        l_chunk, fb = chunk_width(chunk, (bm, bn))
        stack = np.zeros((batch, bm, bn), dtype=dtype)
        for s_, i in enumerate(chunk):
            if is_pre_routed(i, l_chunk, bm, bn):
                stack[s_, 0, 0] = 1.0  # pre-routed: filler slot
                continue
            m, n = shapes[i]
            stack[s_, :m, :n] = np.asarray(blocks[i])
        # rank-1 fillers: spectrum [1, 0, ...] crosses any tol at
        # rank 1, so padded slots can't trip the tolerance gate
        for s_ in range(len(chunk), batch):
            stack[s_, 0, 0] = 1.0
        mode_kw = (dict(growth_block=l_chunk) if growth else
                   dict(round_rank=max(l_chunk - oversample, 1)))
        if not growth and "refine_rounds" not in kwargs:
            # THREE capture rounds per chunk when capacity permits
            # (round 4): the TPU's bf16 f32-rounds leave a sketch-luck
            # tail — worst (block, key) pairs miss the spectral-cut
            # optimum 5-8x at two rounds (bench config 7 vmapped A/B:
            # worst 8.0e-8 vs CPU's 8.3e-9 at identical keys; cut-merge
            # and power-iteration sweeps ruled out). The DF residual
            # recurrence is exact, so a third round samples exactly the
            # missed mass: ~+40% device time per chunk versus per-block
            # host-route repair storms at the 2*tol trigger. Chunks
            # where 3 rounds would saturate a tall frame (begin's
            # l*(1+rr) >= n pre-route — the round-3 40 s/block path)
            # stay at 2 rounds; explicit user refine_rounds wins.
            # rr=1 at narrow widths (feedback chunks AND <=64-wide
            # pilots): 2-round capacity 2l covers any rank a cmin >= l
            # block can have, and the third round's noise merge is what
            # degraded near-saturated chunks (docs/HIGHACC.md round 5)
            mode_kw["refine_rounds"] = (
                1 if fb or l_chunk <= 64
                or (bm > bn and 3 * l_chunk >= bn) else 2)
        t0 = time.perf_counter()
        h = refined_fused_batch_begin(
            stack, jax.random.fold_in(key, gi * 100003 + c0),
            tol=rel_tol, mesh=mesh, axis=axis, on_unreachable="mark",
            **mode_kw, **kwargs)
        t_enq = time.perf_counter()
        return (h, stack, chunk, bm, bn, l_chunk, t0, t_enq, mode_kw)

    prev_ready = [0.0]
    # consecutive soft (margin-restoration) repairs that improved
    # nothing; at SOFT_REPAIR_LIMIT the stream stops soft-repairing
    # (see needs_repair below)
    soft_state = {"fails": 0}

    def collect(work):
        """Finish one chunk: host SVD tail + batched f64 verify."""
        h, stack, chunk, bm, bn, l_chunk, t0, t_enq, mode_kw = work
        outs = refined_fused_batch_finish(h)
        t_ready = time.perf_counter()
        _chunk_log.info(
            "chunk bucket=(%d,%d) l=%d n=%d mode=%s pack+enq=%.2fs "
            "finish=%.2fs", bm, bn, l_chunk, len(chunk),
            h.get("mode", "?"), t_enq - t0, t_ready - t_enq)
        wall = (t_ready - t0) / max(len(chunk), 1)
        dev_block = (t_ready - max(prev_ready[0], t_enq)) / max(
            len(chunk), 1)
        prev_ready[0] = t_ready

        # Batched verification (round 5, VERDICT r4 next #2): ONE
        # stacked f64 matmul reconstructs the whole chunk — the factors
        # come back host-backed from refined_fused_batch_finish, so the
        # per-block to_f64/GEMM loop (and its per-block tunnel flushes)
        # is gone. Norms compare against the already-packed stack
        # (same bytes as the source block, no mmap re-read).
        live = [s_ for s_, i in enumerate(chunk)
                if not is_pre_routed(i, l_chunk, bm, bn)]
        errs: dict[int, float] = {}
        if live:
            kq = max(max(outs[s_].rank for s_ in live), 1)
            wd = stack.dtype
            u_st = np.zeros((len(live), bm, kq), dtype=wd)
            svt_st = np.zeros((len(live), kq, bn), dtype=wd)
            for j, s_ in enumerate(live):
                u64, s64, vt64 = outs[s_].to_f64()
                kf = s64.shape[0]
                u_st[j, :, :kf] = u64
                svt_st[j, :kf, :] = s64[:, None] * vt64
            rec = u_st @ svt_st
            for j, s_ in enumerate(live):
                m, n = shapes[chunk[s_]]
                bnorm = np.linalg.norm(stack[s_, :m, :n])
                rnorm = np.linalg.norm(rec[j, :m, :n]
                                       - stack[s_, :m, :n])
                errs[s_] = (float(rnorm / bnorm) if bnorm > 0
                            else (0.0 if rnorm == 0 else np.inf))

        # Chunk-level fresh-key RETRY (round 5): the bf16 f32-rounds'
        # sketch-luck tail is distributional — on the 10k volume,
        # chunks landed at (1.6-2.0)x their spectral-cut optimum and
        # tripped per-block host repairs (~10 s/block through the
        # tunnel) wholesale. ONE re-dispatch of just the failing slots
        # with a fresh key costs chunk-seconds and usually re-draws
        # them under the gate; stragglers still take the host routes.
        def _gate_thr(o):
            v = getattr(o, "opt_resid", None)
            opt = (float(v) if v is not None and np.isfinite(v) else 0.0)
            return max(5 * rel_tol, OPT_SLACK * opt)

        if live and not growth:
            need = [s_ for s_ in live
                    if not (outs[s_].tol_ok
                            and errs.get(s_, np.inf) <= _gate_thr(outs[s_]))]
            if len(need) >= 2:
                try:
                    h2 = refined_fused_batch_begin(
                        np.stack([stack[s_] for s_ in need]),
                        jax.random.fold_in(key, 7_000_003 + chunk[need[0]]),
                        tol=rel_tol, on_unreachable="mark",
                        **mode_kw, **kwargs)
                    outs2 = refined_fused_batch_finish(h2)
                except Exception:  # noqa: BLE001 — retry is best-effort
                    outs2 = None
                if outs2 is not None:
                    improved = 0
                    for j, s_ in enumerate(need):
                        o2 = outs2[j]
                        m, n = shapes[chunk[s_]]
                        u64, s64, vt64 = o2.to_f64()
                        rec2 = u64[:m] @ (s64[:, None] * vt64[:, :n])
                        bnorm = np.linalg.norm(stack[s_, :m, :n])
                        e2 = (float(np.linalg.norm(
                            rec2 - stack[s_, :m, :n]) / bnorm)
                            if bnorm > 0 else np.inf)
                        if np.isfinite(e2) and e2 < errs.get(s_, np.inf):
                            outs[s_], errs[s_] = o2, e2
                            improved += 1
                    _chunk_log.info(
                        "retry bucket=(%d,%d) n=%d improved=%d", bm, bn,
                        len(need), improved)
        for s_, i in enumerate(chunk):
            m, n = shapes[i]
            b = None  # unpadded host block, materialized on demand
            pre_routed = is_pre_routed(i, l_chunk, bm, bn)
            out = outs[s_]
            # pre-routed slots force the host path below; a non-finite
            # residual (degraded-backend garbage in the apply-stage
            # factors) must fail every gate, not nan-pass them
            err = errs.get(s_, np.inf)
            if not np.isfinite(err):
                err = np.inf
            w, dev_w = wall, dev_block
            failure = None

            # Achievability yardstick (round 4): the tolerance is the
            # reference's SPECTRAL cut (qr.rs:190-194); on flat-tailed
            # spectra (e.g. admissible Laplace blocks with a ~7e-9
            # numerical floor) even the OPTIMAL rank-kf factorization
            # has Frobenius residual ~tol*sqrt(#tail) >> 5*tol. opt is
            # the core spectrum's own tail mass (RefinedSVD.opt_resid):
            # a block at <= OPT_SLACK*opt achieved what the spectral
            # contract allows and is NOT a miss. Repairs kick in ABOVE
            # max(REPAIR_TOL_FACTOR*tol, OPT_SLACK*opt) — tighter than
            # the 5*tol acceptance, so capture-quality outliers (the
            # TPU's key-dependent 3-5e-8 misses on 1e-8-class blocks)
            # are re-run through the exact host route instead of
            # shipping at the gate boundary.
            def _opt(o):
                # non-finite guard (ADVICE r4): an all-zero block's
                # opt_resid is 0/0 = nan; a nan here would make the
                # acceptance gate silently pass — treat it as 0.0 so
                # the plain 5*tol gate applies.
                v = getattr(o, "opt_resid", None)
                return float(v) if v is not None and np.isfinite(v) else 0.0

            def _accept_thr(o):
                return max(5 * rel_tol, OPT_SLACK * _opt(o))

            def needs_repair(e, o):
                # Repair policy (round 5). The round-4 rule
                # ``e > max(2 tol, 1.25 opt)`` was knife-edged against
                # flat-tailed blocks sitting AT their true optimum:
                # the vmapped capture's ``opt_resid`` comes from its
                # CAPACITY-LIMITED core spectrum and under-estimates a
                # flat tail (measured opt ~2e-8 vs true ~4e-8 on the
                # volume's admissible Laplace blocks), so ~half the
                # stream triggered a ~30-dispatch host-route repair
                # that landed at the SAME residual — 10-34 s per block
                # through the tunnel, the #1 wall of the round-5
                # volume resume. Two repair tiers now:
                # * HARD (unconditional): the acceptance gate itself
                #   would fail — no block is recorded failed without a
                #   repair attempt.
                # * SOFT (margin restoration, adaptive): capture
                #   meaningfully above its own optimum estimate. After
                #   SOFT_REPAIR_LIMIT consecutive soft repairs that
                #   improved nothing (< 1.5x), the stream's spectra
                #   are evidently flat-tailed at their optimum and
                #   soft repairs disable for the rest of the stream.
                if e > _accept_thr(o):
                    return True
                if soft_state["fails"] >= SOFT_REPAIR_LIMIT:
                    return False
                opt = _opt(o)
                margin = opt + max(REPAIR_TOL_FACTOR * rel_tol,
                                   0.1 * opt)
                return e > margin

            if not growth and (pre_routed or
                               (out.tol_ok and needs_repair(err, out))):
                # First fallback, host-orchestrated on the UNPADDED
                # block: exact-Gram independence logic, with the capture
                # width clamped by the block's true dims (a padded frame
                # hides structural rank deficiency from the f32 rounds —
                # the 2e-4-class misses of the first 1k-block stream
                # run). Unreachable tolerances fall through to growth.
                t0f = time.perf_counter()
                if b is None:
                    b = np.asarray(blocks[i])
                soft_only = (not pre_routed and np.isfinite(err)
                             and err <= _accept_thr(out))
                err_before = err
                _chunk_log.info(
                    "repair block=%d shape=%s err=%.3e opt=%.3e "
                    "kind=%s", i, (m, n), err, _opt(out),
                    "pre_routed" if pre_routed
                    else ("soft" if soft_only else "hard"))
                try:
                    out = refined_rsvd(b, keys[i],
                                       round_rank=round_rank,
                                       tol=rel_tol, **kwargs)
                    u64, s64, vt64 = out.to_f64()
                    rec = u64 @ (s64[:, None] * vt64)
                    err = float(np.linalg.norm(rec - b)
                                / np.linalg.norm(b))
                    if soft_only:
                        # adaptive soft-repair budget: a repair that
                        # landed within 1.5x of the capture proves the
                        # capture was already at this spectrum's
                        # optimum class
                        soft_state["fails"] = (
                            0 if err < err_before / 1.5
                            else soft_state["fails"] + 1)
                except CompressionError:
                    pass  # growth fallback decides
                except jax.errors.JaxRuntimeError as ex:
                    # transient backend failure (tunneled-compile drop,
                    # dead-device fetch) mid-repair: CONTAIN it — the
                    # block is recorded with an environment: error and
                    # --resume re-runs it in a healthier window
                    # (io.pending_blocks), instead of one flaky compile
                    # killing a 10k-block stream (observed 18:53).
                    failure = ("environment: host-route repair died "
                               f"({str(ex).splitlines()[0][:160]})")
                w += time.perf_counter() - t0f
                dev_w += time.perf_counter() - t0f
            if failure is None and (not out.tol_ok
                                    or needs_repair(err, out)):
                # Second fallback: the fixed-round capacity
                # (round_rank * (1 + refine_rounds)) may simply sit
                # below the block's true rank at this tolerance — the
                # vmapped capture then comes back tol_ok=False (no
                # projected singular value dips below tol). Let the
                # growth capture DISCOVER the rank (refined_rsvd with
                # tol alone — the reference's adaptive-sampler
                # semantics, random_sampling.rs:202-282) before
                # declaring the block failed. A genuinely unreachable
                # tolerance is CONTAINED: the error is recorded and the
                # best capture's full-rank factors are kept.
                t0g = time.perf_counter()
                if b is None:
                    b = np.asarray(blocks[i])
                # growth mode has no first fallback, so the soft-repair
                # budget must be accounted here (else the round-4
                # repair storm persists on growth streams)
                soft2 = (growth and not pre_routed and np.isfinite(err)
                         and err <= _accept_thr(out))
                err_before2 = err
                try:
                    out = refined_rsvd(
                        b, jax.random.fold_in(keys[i], 1), tol=rel_tol,
                        **{k_: v_ for k_, v_ in kwargs.items()
                           if k_ != "refine_rounds"})
                except CompressionError as ex:
                    failure = (f"tolerance {rel_tol!r} unreachable "
                               f"(growth capture: {ex}; full-rank "
                               f"capture recorded)")
                    # containment factors: the full-rank fixed-round
                    # capture of the UNPADDED block (never raises — no
                    # tol), not the padded/filler vmapped output.
                    rr_fb = (min(min(shapes[i]), 128) if growth
                             else round_rank)
                    out = refined_rsvd(b, keys[i],
                                       round_rank=rr_fb, **kwargs)
                except jax.errors.JaxRuntimeError as ex:
                    # environmental containment (see first fallback):
                    # recorded with an environment: error; --resume
                    # re-runs the block in a healthier window
                    failure = ("environment: growth fallback died "
                               f"({str(ex).splitlines()[0][:160]})")
                if failure is None or not failure.startswith(
                        "environment:"):
                    u64, s64, vt64 = out.to_f64()
                    u64, vt64 = u64[:m, :], vt64[:, :n]
                    rec = u64 @ (s64[:, None] * vt64)
                    err = float(np.linalg.norm(rec - b)
                                / np.linalg.norm(b))
                    if soft2:
                        soft_state["fails"] = (
                            0 if err < err_before2 / 1.5
                            else soft_state["fails"] + 1)
                w += time.perf_counter() - t0g
                dev_w += time.perf_counter() - t0g
            if failure is None and err > max(5 * rel_tol,
                                             OPT_SLACK * _opt(out)):
                failure = (f"residual {err:.3e} missed the "
                           f"max(5x{rel_tol:g}, {OPT_SLACK}x optimal "
                           f"{_opt(out):.3e}) gate after fixed-round and "
                           "growth fallbacks")
            # factors for the record: host f64, sliced to content dims
            # (host-backed after the batch fetch — no device traffic)
            u64, s64, vt64 = out.to_f64()
            u64, vt64 = u64[:m, :], vt64[:, :n]
            if failure is None:
                rank_seen[(bm, bn)] = max(rank_seen.get((bm, bn), 0),
                                          out.rank)
            results[i] = BlockResult(
                index=i, shape=(m, n), bucket=(bm, bn), rank=out.rank,
                rel_residual=err, wall_time_s=w,
                factors=SVD(u64, s64, vt64), device_time_s=dev_w,
                error=failure)
            if on_result is not None:
                on_result(results[i])
        # all-failing pilot: record a width-neutral sentinel so the
        # bucket's bulk chunks neither narrow nor re-trigger the
        # pilot barrier on every subsequent chunk (which would
        # serialize the whole window pipeline)
        rank_seen.setdefault((bm, bn), l_cap)

    # Windowed pipeline: chunk k+1's packing + device capture overlap
    # chunk k's host tail (SVD + verification); `window` bounds memory.
    chunk_list = []
    pilot_n = 8 * granule
    for gi, ((bm, bn), idxs) in enumerate(sorted(groups.items())):
        # sort by content min dim so the per-chunk capture width
        # (chunk_width) is homogeneous within each chunk
        idxs = sorted(idxs, key=lambda i: min(shapes[i]))
        batch = _chunk_batch(len(idxs), granule, bm, bn, 8, chunk_bytes)
        c0 = 0
        pn = min(pilot_n, batch)  # pilots respect the device-stack cap
        if not growth and len(idxs) > pn:
            # small pilot chunk per bucket: its accepted ranks drive
            # the width feedback for the bulk chunks (see chunk_width)
            chunk_list.append((gi, 0, bm, bn, pn, idxs[:pn]))
            c0 = pn
        for cc in range(c0, len(idxs), batch):
            chunk_list.append((gi, cc, bm, bn, batch, idxs[cc:cc + batch]))
    in_flight: list = []
    for args in chunk_list:
        if (not growth and (args[2], args[3]) not in rank_seen
                and in_flight):
            # a bucket's bulk chunks need its pilot collected first
            # (width feedback); this only serializes bucket boundaries
            for work in in_flight:
                collect(work)
            in_flight = []
        in_flight.append(dispatch(*args))
        if len(in_flight) >= window:
            collect(in_flight.pop(0))
    for work in in_flight:
        collect(work)
    elapsed = time.perf_counter() - t_start
    if results and elapsed > 0:
        total_bytes = sum(np.asarray(b).nbytes for b in blocks)
        _log_throughput(len(results), elapsed, total_bytes)
    return results  # type: ignore[return-value]


def _log_throughput(n_blocks: int, elapsed: float, total_bytes: int) -> None:
    """One aggregate line per stream (the honest throughput figure —
    per-block wall_time_s is pipelined latency, see BlockResult)."""
    import logging

    logging.getLogger("rusty_compression_tpu.scheduler").info(
        "compressed %d blocks in %.2fs: %.1f blocks/s, %.2f GB/s",
        n_blocks, elapsed, n_blocks / elapsed, total_bytes / elapsed / 1e9)
