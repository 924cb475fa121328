// rusty_compression_tpu native runtime — host-side block-stream planner.
//
// The TPU device code is JAX/XLA/Pallas; this library is the *runtime
// around it*: for the north-star workload (BASELINE.md config 5 — ~10k
// heterogeneous H-matrix blocks per host, millions per job) the
// per-block bookkeeping (shape bucketing, batch packing, submission-
// order gather bookkeeping) must not run as a Python loop. The
// reference has no such runtime at all (single matrix per call); this
// is the new framework's equivalent of the manifest/scheduler layer
// larger frameworks put in C++.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (rusty_compression_tpu/native.py), with a pure-Python fallback for
// environments without a toolchain.

#include <algorithm>
#include <cstdint>
#include <map>
#include <utility>
#include <vector>

extern "C" {

// Round a dimension up to the bucket grid: the next power of two at or
// above floor_dim. Mirrors parallel/scheduler.py::bucket_dim.
int64_t rc_bucket_dim(int64_t d, int64_t floor_dim) {
  int64_t b = floor_dim;
  while (b < d) b *= 2;
  return b;
}

// Plan a heterogeneous block stream.
//
// Inputs:  n blocks with dims ms[i] x ns[i]; bucket grid floor_dim;
//          batch granule (stacks are padded to a multiple of it, e.g.
//          the mesh axis size).
// Outputs (caller-allocated):
//   bucket_m/bucket_n[i] : the padded dims block i will run at
//   order[n]             : execution order — blocks grouped by bucket,
//                          buckets in ascending (bm, bn) order, stable
//                          (= submission order) within a bucket
//   group_off[n+1]       : CSR offsets into `order` per bucket group
//   group_batch[n]       : padded batch size of each group
// Returns the number of groups (<= n), or -1 on invalid input.
int64_t rc_plan(int64_t n, const int64_t* ms, const int64_t* ns,
                int64_t floor_dim, int64_t granule,
                int64_t* bucket_m, int64_t* bucket_n, int64_t* order,
                int64_t* group_off, int64_t* group_batch) {
  if (n < 0 || floor_dim <= 0 || granule <= 0) return -1;
  std::map<std::pair<int64_t, int64_t>, std::vector<int64_t>> groups;
  for (int64_t i = 0; i < n; ++i) {
    if (ms[i] <= 0 || ns[i] <= 0) return -1;
    int64_t bm = rc_bucket_dim(ms[i], floor_dim);
    int64_t bn = rc_bucket_dim(ns[i], floor_dim);
    bucket_m[i] = bm;
    bucket_n[i] = bn;
    groups[{bm, bn}].push_back(i);  // push order = submission order
  }
  int64_t g = 0, pos = 0;
  group_off[0] = 0;
  for (auto& kv : groups) {  // std::map iterates in ascending key order
    for (int64_t idx : kv.second) order[pos++] = idx;
    int64_t cnt = static_cast<int64_t>(kv.second.size());
    group_batch[g] = ((cnt + granule - 1) / granule) * granule;
    group_off[++g] = pos;
  }
  return g;
}

// Submission-order gather bookkeeping: given the execution order
// produced by rc_plan, fill `slot_of_block[i]` = (group, slot-in-group)
// packed as group * max_batch + slot, so factor buffers can be
// scattered back to submission order without a host-side dict.
void rc_gather_plan(int64_t n, const int64_t* order,
                    const int64_t* group_off, int64_t n_groups,
                    int64_t max_batch, int64_t* slot_of_block) {
  for (int64_t gi = 0; gi < n_groups; ++gi) {
    for (int64_t p = group_off[gi]; p < group_off[gi + 1]; ++p) {
      int64_t slot = p - group_off[gi];
      slot_of_block[order[p]] = gi * max_batch + slot;
    }
  }
}

// Fixed per-group chunk batch under a host-memory byte budget.
//
// A group of `count` blocks at bucket dims bm x bn is executed in
// chunks of a FIXED batch size (so one compiled program per bucket
// regardless of chunk count); the chunk batch is the largest multiple
// of `granule` whose padded stack fits in `budget_bytes`, clamped to
// [granule, padded-count]. Mirrors scheduler.py::_chunk_batch.
int64_t rc_chunk_batch(int64_t count, int64_t granule, int64_t bm,
                       int64_t bn, int64_t elem_size,
                       int64_t budget_bytes) {
  if (count <= 0 || granule <= 0 || bm <= 0 || bn <= 0 || elem_size <= 0)
    return -1;
  int64_t padded = ((count + granule - 1) / granule) * granule;
  if (budget_bytes <= 0) return padded;  // no budget: one chunk
  int64_t granule_bytes = bm * bn * elem_size * granule;
  int64_t fit = budget_bytes / granule_bytes * granule;
  if (fit < granule) fit = granule;  // always make progress
  return std::min(padded, fit);
}

// Total padded bytes a plan will materialize (scheduling / memory
// budgeting): sum over groups of batch * bm * bn * elem_size.
int64_t rc_plan_bytes(int64_t n_groups, const int64_t* group_off,
                      const int64_t* order, const int64_t* bucket_m,
                      const int64_t* bucket_n, const int64_t* group_batch,
                      int64_t elem_size) {
  int64_t total = 0;
  for (int64_t gi = 0; gi < n_groups; ++gi) {
    int64_t rep = order[group_off[gi]];  // any block in the group
    total += group_batch[gi] * bucket_m[rep] * bucket_n[rep] * elem_size;
  }
  return total;
}

}  // extern "C"
