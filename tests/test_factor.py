"""Factorization-layer tests (reference split_LU / peel_diag tests,
/root/reference/tests/test_utilities.cpp:96-208, plus ILU(0) semantics from
LU_factors.hpp:320-539 which the reference never unit-tests)."""
import numpy as np
import pytest

from basic_iterative_solvers_tpu.matrix import MatrixCSR
from basic_iterative_solvers_tpu.factor import (
    MissingDiagonalError, ZeroDiagonalError, extract_scale, factor_LU,
    factor_ilu0, level_sets_lower, level_sets_upper, peel_diag, scale_mat,
    split_LU)
from basic_iterative_solvers_tpu.generators import banded, fdm_2d


def dense_ilu0(A_dense, pivot_tol=1e-8, pivot_rep=1e-4):
    """Independent dense oracle for pattern-restricted ILU(0) with the
    reference's pivot guards (LU_factors.hpp:355-413)."""
    n = A_dense.shape[0]
    pattern = A_dense != 0
    lu = A_dense.astype(np.float64).copy()
    for i in range(n):
        for k in range(i):
            if not pattern[i, k]:
                continue
            pivot = lu[k, k]
            if abs(pivot) < 1e-16:
                continue
            factor = lu[i, k] / pivot
            lu[i, k] = factor
            for j in range(k + 1, n):
                if pattern[i, j]:
                    lu[i, j] -= factor * lu[k, j]
        if abs(lu[i, i]) < pivot_tol:
            lu[i, i] = (1.0 if lu[i, i] >= 0 else -1.0) * pivot_rep
    L = np.tril(lu, -1) * pattern + np.eye(n)
    U = np.triu(lu) * pattern
    return L, U


def test_split_lu():
    A = banded(8, bandwidth=2, seed=1)
    L, Ls, U, Us = split_LU(A)
    D = A.to_dense()
    np.testing.assert_allclose(L.to_dense(), np.tril(D))
    np.testing.assert_allclose(Ls.to_dense(), np.tril(D, -1))
    np.testing.assert_allclose(U.to_dense(), np.triu(D))
    np.testing.assert_allclose(Us.to_dense(), np.triu(D, 1))
    assert L.nnz + Us.nnz == A.nnz
    assert U.nnz + Ls.nnz == A.nnz


def test_peel_diag():
    A = banded(6, bandwidth=1, seed=2)
    D, D_inv = peel_diag(A)
    np.testing.assert_allclose(D, np.diag(A.to_dense()))
    np.testing.assert_allclose(D_inv, 1.0 / D)


def test_peel_diag_missing():
    dense = np.array([[1.0, 2.0], [3.0, 0.0]])  # (1,1) empty
    A = MatrixCSR.from_dense(dense)
    with pytest.raises(MissingDiagonalError):
        peel_diag(A)


def test_peel_diag_zero():
    # explicit zero on the diagonal
    from basic_iterative_solvers_tpu.matrix import MatrixCOO, convert_coo_to_csr
    coo = MatrixCOO.from_arrays([0, 1, 1], [0, 0, 1], [1.0, 2.0, 0.0],
                                n_rows=2, n_cols=2)
    A = convert_coo_to_csr(coo)
    with pytest.raises(ZeroDiagonalError):
        peel_diag(A)


def test_extract_scale_and_scale_mat():
    A = banded(10, bandwidth=2, seed=3)
    s = extract_scale(A)
    np.testing.assert_allclose(s, 1.0 / np.sqrt(np.abs(np.diag(A.to_dense()))))
    B = scale_mat(A.copy(), s)
    expected = np.diag(s) @ A.to_dense() @ np.diag(s)
    np.testing.assert_allclose(B.to_dense(), expected, rtol=1e-14)
    # after symmetric scaling, |diag| == 1
    np.testing.assert_allclose(np.abs(np.diag(B.to_dense())), 1.0, rtol=1e-14)


@pytest.mark.parametrize("n,bw,seed", [(8, 2, 4), (15, 3, 5), (12, 1, 6)])
def test_ilu0_matches_dense_oracle(n, bw, seed):
    A = banded(n, bandwidth=bw, seed=seed)
    L, Ls, L_D, U, Us, U_D = factor_ilu0(A)
    L_ref, U_ref = dense_ilu0(A.to_dense())
    np.testing.assert_allclose(L.to_dense(), L_ref, rtol=1e-13, atol=1e-14)
    np.testing.assert_allclose(U.to_dense(), U_ref, rtol=1e-13, atol=1e-14)
    np.testing.assert_allclose(L_D, 1.0)
    np.testing.assert_allclose(U_D, np.diag(U_ref))
    # structure: L unit diag explicit, strict parts consistent
    np.testing.assert_allclose(Ls.to_dense(), L_ref - np.eye(n))
    np.testing.assert_allclose(Us.to_dense(), U_ref - np.diag(np.diag(U_ref)))


def test_ilu0_exact_when_no_fill():
    """For a matrix whose LU factorization has no fill-in (tridiagonal),
    ILU(0) equals the exact LU: L@U == A."""
    A = banded(10, bandwidth=1, seed=7)
    L, _, _, U, _, _ = factor_ilu0(A)
    np.testing.assert_allclose(L.to_dense() @ U.to_dense(), A.to_dense(),
                               rtol=1e-12, atol=1e-13)


def test_factor_lu_orchestrator():
    A = fdm_2d(4)
    f = factor_LU(A, ilu0=False)
    np.testing.assert_allclose(f.A_D, np.diag(A.to_dense()))
    np.testing.assert_allclose(f.L_D, 1.0)
    np.testing.assert_allclose(f.U_D, f.A_D)
    f2 = factor_LU(A, ilu0=True)
    L_ref, U_ref = dense_ilu0(A.to_dense())
    np.testing.assert_allclose(f2.L.to_dense(), L_ref, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(f2.U.to_dense(), U_ref, rtol=1e-12, atol=1e-13)


def test_level_sets():
    A = fdm_2d(4)
    _, Ls, _, Us = split_LU(A)
    lev = level_sets_lower(Ls)
    # dependencies respected: every strictly-lower neighbor has smaller level
    for i in range(Ls.n_rows):
        cols = Ls.col[Ls.row_ptr[i]:Ls.row_ptr[i + 1]]
        assert all(lev[c] < lev[i] for c in cols)
    levu = level_sets_upper(Us)
    for i in range(Us.n_rows):
        cols = Us.col[Us.row_ptr[i]:Us.row_ptr[i + 1]]
        assert all(levu[c] < levu[i] for c in cols)


def test_peel_diag_error_rows_unambiguous():
    """Native peel_diag encodes the offending row in an out-parameter, so
    a missing diagonal is never misreported as a zero diagonal regardless
    of the row index (ADVICE r1: old -(1000+i)/-(2000000+i) codes collided
    once i >= 1,999,000)."""
    import re
    # missing diagonal in the LAST row
    n = 5
    row_ptr = np.arange(n + 1, dtype=np.int64)
    col = np.array([0, 1, 2, 3, 3], dtype=np.int32)  # row 4 has col 3 only
    val = np.ones(5)
    A = MatrixCSR(n, n, 5, row_ptr, col, val)
    with pytest.raises(MissingDiagonalError, match=r"row 4$"):
        peel_diag(A)
    # zero diagonal in row 2
    col2 = np.arange(n, dtype=np.int32)
    val2 = np.array([1.0, 1.0, 0.0, 1.0, 1.0])
    B = MatrixCSR(n, n, 5, row_ptr, col2, val2)
    with pytest.raises(ZeroDiagonalError, match=r"row 2$"):
        peel_diag(B)


def test_lu_split_count_check():
    """SanityChecker::check_copied_L_U_elems analog (common.hpp:532-542)."""
    from basic_iterative_solvers_tpu.factor import split_LU
    from basic_iterative_solvers_tpu.utils.sanity import (LUSplitError,
                                                          check_lu_split_counts)
    A = fdm_2d(6)
    L, Ls, U, Us = split_LU(A)
    check_lu_split_counts(A, L, Ls, U, Us)   # passes
    with pytest.raises(LUSplitError):
        check_lu_split_counts(A, L, Ls, U, U)  # wrong strict part


def test_sanity_dumps(capsys):
    from basic_iterative_solvers_tpu.utils.sanity import (print_matrix,
                                                          print_vector)
    import sys
    A = fdm_2d(3)
    print_vector(np.arange(4.0), "v", out=sys.stdout)
    print_matrix(A, "A", out=sys.stdout)
    print_matrix(fdm_2d(10), "big", out=sys.stdout)
    out = capsys.readouterr().out
    assert "v = [0 1 2 3]" in out
    assert "A (9x9" in out
    assert "big: 100x100 CSR" in out
