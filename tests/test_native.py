"""Tests for the C++ host runtime (native/librc_native.so) and its
parity with the pure-Python planner."""

import numpy as np
import pytest

from rusty_compression_tpu import native
from rusty_compression_tpu.parallel.scheduler import bucket_dim, plan_buckets

pytestmark = pytest.mark.skipif(
    not native.available(), reason="C++ toolchain unavailable")


def random_shapes(n, seed=0):
    rng = np.random.default_rng(seed)
    return [(int(m), int(k)) for m, k in
            zip(rng.integers(1, 2000, n), rng.integers(1, 2000, n))]


def test_bucket_dim_parity():
    lib = native._load()
    for d in [1, 2, 100, 128, 129, 255, 256, 1000, 16384]:
        for floor in [64, 128, 256]:
            assert lib.rc_bucket_dim(d, floor) == bucket_dim(d, floor)


def test_plan_matches_python():
    shapes = random_shapes(500)
    p = native.plan(shapes, floor=128, granule=4)
    assert p is not None
    assert p.groups() == plan_buckets(shapes, 128)


def test_plan_batch_padding():
    shapes = [(100, 100)] * 5 + [(300, 300)] * 9
    p = native.plan(shapes, floor=128, granule=8)
    assert list(p.group_batch) == [8, 16]  # 5 -> 8, 9 -> 16


def test_gather_slots_roundtrip():
    shapes = random_shapes(200, seed=3)
    p = native.plan(shapes, floor=128, granule=4)
    slots = p.gather_slots()
    max_batch = int(p.group_batch.max())
    groups = list(p.groups().values())
    for i, s in enumerate(slots):
        gi, slot = divmod(int(s), max_batch)
        assert groups[gi][slot] == i  # scatter lands in submission order


def test_padded_bytes():
    shapes = [(100, 100), (100, 100), (300, 200)]
    p = native.plan(shapes, floor=128, granule=1)
    # group (128,128): batch 2; group (512,256): batch 1
    assert p.padded_bytes(4) == (2 * 128 * 128 + 1 * 512 * 256) * 4


def test_invalid_inputs_rejected():
    with pytest.raises(ValueError):
        native.plan([(0, 5)])


def test_large_manifest_fast():
    """100k blocks plan in well under a second through the C ABI."""
    import time

    shapes = random_shapes(100_000, seed=7)
    t0 = time.perf_counter()
    p = native.plan(shapes, floor=128, granule=8)
    dt = time.perf_counter() - t0
    assert p is not None and p.n_groups >= 1
    assert sum(len(v) for v in p.groups().values()) == 100_000
    assert dt < 5.0


def test_chunk_batch_parity():
    lib = native._load()
    rng = np.random.default_rng(3)
    for _ in range(200):
        count = int(rng.integers(1, 500))
        granule = int(rng.integers(1, 9))
        bm, bn = (int(x) for x in rng.integers(64, 4096, 2))
        esize = int(rng.choice([4, 8, 16]))
        budget = int(rng.integers(0, 1 << 32))
        native_cb = lib.rc_chunk_batch(count, granule, bm, bn, esize, budget)
        # force the Python mirror (budget<=0 path included)
        padded = -(-count // granule) * granule
        if budget <= 0:
            py_cb = padded
        else:
            fit = max(budget // (bm * bn * esize * granule), 1) * granule
            py_cb = min(padded, fit)
        assert native_cb == py_cb == native.chunk_batch(
            count, granule, bm, bn, esize, budget)


def test_chunk_batch_invalid():
    lib = native._load()
    assert lib.rc_chunk_batch(0, 1, 64, 64, 4, 1000) == -1
    assert lib.rc_chunk_batch(5, 0, 64, 64, 4, 1000) == -1
