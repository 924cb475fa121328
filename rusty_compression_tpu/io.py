"""Checkpoint / serialization of factorization containers.

The reference has no serialization at all (SURVEY.md §5
"Checkpoint / resume": factors are plain structs). Here every container
is a pytree of arrays, so persistence is uniform:

* ``save_factors`` / ``load_factors`` — one container (or a batched
  container) to/from a single ``.npz`` with a type tag.
* ``save_block_results`` / ``load_block_results`` — a heterogeneous
  block workload's results to a directory: one ``.npz`` per block plus a
  ``manifest.jsonl`` of the per-block metrics records in submission
  order. Because block compressions are independent, resume-after-
  failure is re-submitting the blocks missing from the manifest
  (``pending_blocks``) — the failure-recovery model of SURVEY.md §5.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Sequence

import jax
import numpy as np

from .models.interp_decomp import ColumnID, RowID, TwoSidedID
from .models.qr import LQ, QR
from .models.svd import SVD

__all__ = [
    "save_factors",
    "load_factors",
    "save_block_results",
    "load_block_results",
    "pending_blocks",
]

_REGISTRY = {c.__name__: c for c in (QR, LQ, SVD, ColumnID, RowID,
                                     TwoSidedID)}


def _leaf_names(cls) -> list[str]:
    return [f.name for f in dataclasses.fields(cls)]


def save_factors(path: str, factors) -> None:
    """Save a factorization container (single or batched) to ``.npz``."""
    cls = type(factors)
    if cls.__name__ not in _REGISTRY:
        raise TypeError(f"not a factorization container: {cls!r}")
    arrays = {name: np.asarray(jax.device_get(getattr(factors, name)))
              for name in _leaf_names(cls)}
    np.savez(path, __container__=np.str_(cls.__name__), **arrays)


def load_factors(path: str):
    """Load a container saved by ``save_factors``."""
    with np.load(path, allow_pickle=False) as data:
        if "__container__" not in data:
            raise ValueError(
                f"{path} is not a factor checkpoint (no container tag)")
        name = str(data["__container__"])
        cls = _REGISTRY.get(name)
        if cls is None:
            raise ValueError(f"unknown container type {name!r} in {path}")
        return cls(*[data[n] for n in _leaf_names(cls)])


def save_block_results(directory: str, results: Sequence,
                       append: bool = False) -> None:
    """Persist ``parallel.scheduler.BlockResult``s: per-block factor
    ``.npz`` files plus ``manifest.jsonl``. Record order is write order
    (submission order for a fresh run; completion order when appending
    recovered blocks — consumers key on the ``block`` field)."""
    os.makedirs(directory, exist_ok=True)
    manifest_path = os.path.join(directory, "manifest.jsonl")
    with open(manifest_path, "a" if append else "w") as mf:
        for r in results:
            fname = f"block_{r.index:08d}.npz"
            save_factors(os.path.join(directory, fname), r.factors)
            rec = dict(r.record(), file=fname,
                       container=type(r.factors).__name__)
            mf.write(json.dumps(rec) + "\n")


def load_block_results(directory: str) -> list[dict]:
    """Load a block-workload checkpoint: the manifest records (in
    submission order) with factors attached under ``"factors"``."""
    out = []
    with open(os.path.join(directory, "manifest.jsonl")) as mf:
        for line in mf:
            rec = json.loads(line)
            rec["factors"] = load_factors(
                os.path.join(directory, rec["file"]))
            out.append(rec)
    return out


def pending_blocks(directory: str, n_blocks: int) -> list[int]:
    """Submission indices NOT yet present in a checkpoint directory —
    the re-submission set for elastic recovery.

    Blocks recorded with an ``environment:``-class error (transient
    backend failures contained by the stream — tunneled-compile drops,
    dead-device fetches) count as PENDING: a later ``--resume`` in a
    healthier window re-runs them, unlike genuine per-block failures
    (unreachable tolerances), which stay recorded."""
    done = set()
    manifest = os.path.join(directory, "manifest.jsonl")
    if os.path.exists(manifest):
        with open(manifest) as mf:
            for line in mf:
                row = json.loads(line)
                err = row.get("error")
                if err and str(err).startswith("environment:"):
                    continue
                done.add(row["block"])
    return [i for i in range(n_blocks) if i not in done]
