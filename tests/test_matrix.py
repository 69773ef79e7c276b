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
