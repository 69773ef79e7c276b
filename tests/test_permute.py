"""Matrix reordering (perm_mode — the SMAX permute_mat analog)."""
import numpy as np
import pytest

import basic_iterative_solvers_tpu as bis
from basic_iterative_solvers_tpu import generators, permute
from basic_iterative_solvers_tpu.factor import (level_sets_lower, split_LU)
from basic_iterative_solvers_tpu.types import PrecondType, SolverType


def test_permutation_is_valid():
    A = generators.anderson(4, 4, 4, ranpot=3.0, seed=1)
    for mode in ("none", "bfs", "rcm"):
        perm, inv = permute.compute_permutation(A, mode)
        np.testing.assert_array_equal(np.sort(perm), np.arange(A.n_rows))
        np.testing.assert_array_equal(perm[inv], np.arange(A.n_rows))
    with pytest.raises(ValueError):
        permute.compute_permutation(A, "zigzag")


def test_permute_csr_is_similarity_transform():
    A = generators.anderson(4, 3, 2, ranpot=5.0, seed=2)
    perm, inv = permute.compute_permutation(A, "rcm")
    Ap = permute.permute_csr(A, perm, inv)
    dense = A.to_dense()
    np.testing.assert_allclose(Ap.to_dense(), dense[np.ix_(perm, perm)])
    # rows stay column-sorted
    for i in range(Ap.n_rows):
        cols = Ap.col[Ap.row_ptr[i]:Ap.row_ptr[i + 1]]
        assert np.all(np.diff(cols) > 0)


def test_native_and_numpy_permute_agree(monkeypatch):
    from basic_iterative_solvers_tpu import _native
    if not _native.available():
        pytest.skip("native unavailable")
    A = generators.anderson(5, 4, 3, ranpot=2.0, seed=3)
    perm, inv = permute.compute_permutation(A, "bfs")
    Ap_native = permute.permute_csr(A, perm, inv)
    monkeypatch.setattr(_native, "_LIB", None)
    monkeypatch.setattr(_native, "_TRIED", True)
    perm2, inv2 = permute.compute_permutation(A, "bfs")
    np.testing.assert_array_equal(perm, perm2)
    Ap_np = permute.permute_csr(A, perm2, inv2)
    np.testing.assert_array_equal(Ap_native.row_ptr, Ap_np.row_ptr)
    np.testing.assert_array_equal(Ap_native.col, Ap_np.col)
    np.testing.assert_allclose(Ap_native.val, Ap_np.val, rtol=0)


def test_rcm_reduces_bandwidth():
    """RCM must restore a narrow band on a randomly shuffled lattice (its
    guarantee; bandwidth is what bounds the DIA width and the wavefront
    structure of the triangular solves)."""
    rng = np.random.default_rng(0)
    A = generators.anderson(6, 6, 6, ranpot=3.0, seed=4)
    # random symmetric shuffle to destroy the natural banded ordering
    p = rng.permutation(A.n_rows).astype(np.int32)
    ip = np.empty_like(p)
    ip[p] = np.arange(A.n_rows, dtype=np.int32)
    A_shuf = permute.permute_csr(A, p, ip)

    def bandwidth(M):
        rows = np.repeat(np.arange(M.n_rows), M.row_nnz())
        return int(np.abs(M.col - rows).max())

    bw_before = bandwidth(A_shuf)          # ≈ n after shuffling
    perm, inv = permute.compute_permutation(A_shuf, "rcm")
    A_rcm = permute.permute_csr(A_shuf, perm, inv)
    assert bandwidth(A_rcm) < bw_before // 2
    # and the level structure stays shallow enough for the scan solve
    levels = level_sets_lower(split_LU(A_rcm)[1]).max() + 1
    assert levels <= A.n_rows // 4


@pytest.mark.parametrize("mode", ["bfs", "rcm"])
def test_solve_with_permutation_matches(mode):
    """Permuted solve must return x_star in the ORIGINAL ordering."""
    A = generators.anderson(5, 5, 5, ranpot=8.0, seed=5)
    x_true = np.linspace(1.0, 2.0, A.n_rows)
    b = A.spmv(x_true)
    cfg = bis.SolverConfig(method=SolverType.BICGSTAB,
                           preconditioner=PrecondType.GAUSS_SEIDEL,
                           dtype=np.float64, tolerance=1e-12, harness="fused")
    cfg_p = bis.SolverConfig(method=SolverType.BICGSTAB,
                             preconditioner=PrecondType.GAUSS_SEIDEL,
                             dtype=np.float64, tolerance=1e-12,
                             harness="fused", perm_mode=mode)
    res = bis.solve(bis.preprocessing(A, cfg, b=b))
    res_p = bis.solve(bis.preprocessing(A, cfg_p, b=b))
    assert res_p.converged
    np.testing.assert_allclose(res_p.x_star, x_true, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(res_p.x_star, res.x_star, rtol=1e-7,
                               atol=1e-9)
