"""Driver-contract tests: the flagship entry point must stay jittable and
the multi-chip dry run must compile + execute on a virtual mesh."""

import jax
import numpy as np

import __graft_entry__ as graft


def test_entry_jits_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    u, s, vt = out
    assert u.shape[0] == args[0].shape[0]
    assert np.all(np.isfinite(np.asarray(s)))
    # singular values descending per block
    sn = np.asarray(s)
    assert np.all(np.diff(sn, axis=-1) <= 1e-6)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    graft.dryrun_multichip(1)
