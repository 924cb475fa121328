"""Property-based tests (hypothesis) — randomized shapes/ranks, checking
the algebraic invariants the example-based suites check pointwise.

The reference has no property tests (SURVEY.md §4); these cover the
shape/permutation/invariant space more densely than the fixed
thin/thick matrix pairs.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

import rusty_compression_tpu as rc

dims = st.integers(min_value=3, max_value=40)
seeds = st.integers(min_value=0, max_value=2**31 - 1)

SETTINGS = dict(max_examples=10, deadline=None)


@settings(**SETTINGS)
@given(n=dims, seed=seeds)
def test_permutation_roundtrip(n, seed):
    rng = np.random.default_rng(seed)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    inv = rc.invert_permutation_vector(perm)
    np.testing.assert_array_equal(np.asarray(inv)[np.asarray(perm)],
                                  np.arange(n))
    a = jnp.asarray(rng.standard_normal((n, n)))
    for mode, invmode in ((rc.MatrixPermutationMode.COL,
                           rc.MatrixPermutationMode.COLINV),
                          (rc.MatrixPermutationMode.ROW,
                           rc.MatrixPermutationMode.ROWINV)):
        fwd = rc.apply_matrix_permutation(a, perm, mode)
        back = rc.apply_matrix_permutation(fwd, perm, invmode)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


@settings(**SETTINGS)
@given(m=dims, n=dims, seed=seeds)
def test_pivoted_qr_invariants(m, n, seed):
    a = rc.random_gaussian(jax.random.key(seed), (m, n))
    q, r, ind = rc.pivoted_qr(a)
    k = min(m, n)
    qn, rn, an = np.asarray(q), np.asarray(r), np.asarray(a)
    assert np.linalg.norm(np.conj(qn.T) @ qn - np.eye(k)) < 1e-10
    # full-rank per-column reconstruction (pivoted_qr.rs tests)
    np.testing.assert_allclose(qn @ rn, an[:, np.asarray(ind)], atol=1e-10)
    # diagonal non-increasing
    d = np.abs(np.diag(rn))
    assert np.all(d[1:] <= d[:-1] + 1e-12)
    # ind is a permutation
    assert sorted(np.asarray(ind)) == list(range(n))


@settings(**SETTINGS)
@given(m=dims, n=dims, seed=seeds)
def test_column_id_exactness(m, n, seed):
    k = min(m, n) // 2 + 1
    a = rc.random_gaussian(jax.random.key(seed), (m, n))
    cid = rc.QR.compute_from(a, max_rank=k).column_id()
    cn, an = np.asarray(cid.c), np.asarray(a)
    ind = np.asarray(cid.col_ind)
    for j in range(cid.rank):
        np.testing.assert_allclose(cn[:, j], an[:, ind[j]], atol=1e-10)
    # Z carries the identity on the chosen columns
    zn = np.asarray(cid.z)
    np.testing.assert_allclose(zn[:, ind[:k]], np.eye(k), atol=1e-10)


@settings(**SETTINGS)
@given(m=st.integers(10, 50), l=st.integers(2, 9), seed=seeds)
def test_cholesky_qr2_invariants(m, l, seed):
    y = rc.random_gaussian(jax.random.key(seed), (m, l))
    q, r = rc.cholesky_qr2(y)
    qn, rn, yn = np.asarray(q), np.asarray(r), np.asarray(y)
    assert np.linalg.norm(qn.T @ qn - np.eye(l)) < 1e-12
    np.testing.assert_allclose(qn @ rn, yn, atol=1e-10)
    assert np.allclose(rn, np.triu(rn))


@settings(**SETTINGS)
@given(m=st.integers(8, 40), n=st.integers(8, 40), seed=seeds)
def test_svd_qr_roundtrip(m, n, seed):
    a = rc.random_approximate_low_rank_matrix(
        jax.random.key(seed), (m, n), 1.0, 1e-8)
    qr = rc.SVD.compute_from(a).to_qr()
    err = float(rc.rel_diff_fro(qr.to_mat(), a))
    assert err < 1e-10
