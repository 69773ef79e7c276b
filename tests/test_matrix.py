"""COO/CSR data-layer tests (reference convert_coo_to_crs tests,
/root/reference/tests/test_utilities.cpp:64-94)."""
import numpy as np
import pytest

from basic_iterative_solvers_tpu.matrix import (
    MatrixCOO, MatrixCSR, convert_coo_to_csr, csr_to_coo)


def test_coo_to_csr_structure():
    coo = MatrixCOO.from_arrays([0, 2, 1, 0], [1, 2, 0, 0],
                                [5.0, 7.0, 3.0, 1.0], n_rows=3, n_cols=3)
    A = convert_coo_to_csr(coo)
    np.testing.assert_array_equal(A.row_ptr, [0, 2, 3, 4])
    np.testing.assert_array_equal(A.col, [0, 1, 0, 2])
    np.testing.assert_allclose(A.val, [1.0, 5.0, 3.0, 7.0])


def test_duplicates_rejected():
    coo = MatrixCOO.from_arrays([0, 0], [1, 1], [1.0, 2.0], n_rows=2, n_cols=2)
    with pytest.raises(ValueError):
        convert_coo_to_csr(coo)


def test_dense_roundtrip(rng):
    dense = rng.uniform(-1, 1, (7, 7)) * (rng.uniform(0, 1, (7, 7)) > 0.5)
    A = MatrixCSR.from_dense(dense)
    np.testing.assert_allclose(A.to_dense(), dense)
    coo = csr_to_coo(A)
    B = convert_coo_to_csr(coo)
    np.testing.assert_allclose(B.to_dense(), dense)


def test_host_spmv_oracle(rng):
    dense = rng.uniform(-1, 1, (9, 9)) * (rng.uniform(0, 1, (9, 9)) > 0.6)
    A = MatrixCSR.from_dense(dense)
    x = rng.uniform(-1, 1, 9)
    np.testing.assert_allclose(A.spmv(x), dense @ x, rtol=1e-14)


def test_diagonal():
    dense = np.array([[2.0, 1.0], [0.0, 0.0]])
    A = MatrixCSR.from_dense(dense)
    np.testing.assert_allclose(A.diagonal(), [2.0, 0.0])


def test_from_scipy_and_dense_solve_system():
    """Migration adapters: scipy.sparse and dense ndarray inputs to
    solve_system produce the same solve as the native MatrixCSR."""
    import scipy.sparse as sp

    import basic_iterative_solvers_tpu as bis
    from basic_iterative_solvers_tpu.matrix import MatrixCSR

    A = bis.generators.from_source("fdm:12")
    S = sp.csr_matrix((A.val, A.col, A.row_ptr), shape=(A.n_rows, A.n_cols))
    M = MatrixCSR.from_scipy(S)
    np.testing.assert_array_equal(M.row_ptr, A.row_ptr)
    np.testing.assert_array_equal(M.col, A.col)
    np.testing.assert_array_equal(M.val, A.val)

    kw = dict(method="cg", preconditioner="j", dtype=np.float64,
              tolerance=1e-10, harness="fused")
    r_csr = bis.solve_system(A, **kw)
    r_sp = bis.solve_system(S, **kw)
    r_dense = bis.solve_system(A.to_dense(), **kw)
    assert r_sp.converged and r_dense.converged
    assert r_sp.iter_count == r_csr.iter_count == r_dense.iter_count
    np.testing.assert_allclose(r_sp.x_star, r_csr.x_star, rtol=1e-12)

    # duplicate COO entries are summed on the way in
    coo = sp.coo_matrix((np.array([1.0, 2.0, 3.0]),
                         (np.array([0, 0, 1]), np.array([0, 0, 1]))),
                        shape=(2, 2))
    M2 = MatrixCSR.from_scipy(coo)
    assert M2.nnz == 2
    np.testing.assert_allclose(M2.val, [3.0, 3.0])
