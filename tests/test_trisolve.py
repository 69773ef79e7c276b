"""Triangular-solve tests (reference sptrsv/bsptrsv tests,
/root/reference/tests/test_kernels.cpp:69-120, plus the level-scheduling the
reference only gets from SMAX)."""
import jax.numpy as jnp
import numpy as np
import pytest

from basic_iterative_solvers_tpu.factor import peel_diag, split_LU
from basic_iterative_solvers_tpu.generators import anderson, banded, fdm_2d
from basic_iterative_solvers_tpu.device_matrix import from_csr
from basic_iterative_solvers_tpu.ops.trisolve import (
    build_trisolve, trisolve, two_stage_solve)


def _host_forward(Ls, D, b):
    """Sequential oracle = native_sptrsv (kernels.hpp:54-76)."""
    n = Ls.n_rows
    x = np.zeros(n)
    for i in range(n):
        s, e = Ls.row_ptr[i], Ls.row_ptr[i + 1]
        acc = float(Ls.val[s:e] @ x[Ls.col[s:e]])
        x[i] = (b[i] - acc) / D[i]
    return x


def _host_backward(Us, D, b):
    """Sequential oracle = native_bsptrsv (kernels.hpp:88-107)."""
    n = Us.n_rows
    x = np.zeros(n)
    for i in range(n - 1, -1, -1):
        s, e = Us.row_ptr[i], Us.row_ptr[i + 1]
        acc = float(Us.val[s:e] @ x[Us.col[s:e]])
        x[i] = (b[i] - acc) / D[i]
    return x


@pytest.mark.parametrize("make", [
    lambda: banded(25, bandwidth=2, seed=0),
    lambda: fdm_2d(5),
    lambda: anderson(3, 3, 3, t=0.7, ranpot=8.0, seed=4),
])
def test_forward_solve(make, rng):
    A = make()
    _, Ls, _, Us = split_LU(A)
    D, _ = peel_diag(A)
    b = rng.uniform(-1, 1, A.n_rows)
    ts = build_trisolve(Ls, D, upper=False, dtype=np.float64)
    x = np.asarray(trisolve(ts, jnp.asarray(b)))
    np.testing.assert_allclose(x, _host_forward(Ls, D, b), rtol=1e-12,
                               atol=1e-13)
    # exactness: (Ls + diag(D)) x == b
    np.testing.assert_allclose(Ls.to_dense() @ x + D * x, b, rtol=1e-12,
                               atol=1e-12)


@pytest.mark.parametrize("make", [
    lambda: banded(25, bandwidth=2, seed=1),
    lambda: fdm_2d(5),
])
def test_backward_solve(make, rng):
    A = make()
    _, Ls, _, Us = split_LU(A)
    D, _ = peel_diag(A)
    b = rng.uniform(-1, 1, A.n_rows)
    ts = build_trisolve(Us, D, upper=True, dtype=np.float64)
    x = np.asarray(trisolve(ts, jnp.asarray(b)))
    np.testing.assert_allclose(x, _host_backward(Us, D, b), rtol=1e-12,
                               atol=1e-13)


def test_3x3_known_solutions():
    """Reference test_kernels.cpp:69-120 style: 3x3 triangular systems."""
    from basic_iterative_solvers_tpu.matrix import MatrixCSR
    # L = [[2,0,0],[1,3,0],[2,1,4]], solve L x = b
    L_dense = np.array([[2.0, 0, 0], [1, 3, 0], [2, 1, 4]])
    b = np.array([2.0, 7.0, 16.0])
    Ls = MatrixCSR.from_dense(np.tril(L_dense, -1))
    D = np.diag(L_dense)
    ts = build_trisolve(Ls, D, upper=False, dtype=np.float64)
    x = np.asarray(trisolve(ts, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(L_dense, b), rtol=1e-14)

    U_dense = np.array([[2.0, 1, 3], [0, 3, 2], [0, 0, 4]])
    bu = np.array([11.0, 11.0, 8.0])
    Us = MatrixCSR.from_dense(np.triu(U_dense, 1))
    ts_u = build_trisolve(Us, np.diag(U_dense), upper=True, dtype=np.float64)
    xu = np.asarray(trisolve(ts_u, jnp.asarray(bu)))
    np.testing.assert_allclose(xu, np.linalg.solve(U_dense, bu), rtol=1e-14)


def test_two_stage_richardson():
    """two_stage_solve = Σ_{k≤inner} (−D⁻¹T)ᵏ D⁻¹ y
    (reference two_stage_gauss_seidel, kernels.hpp:312-333)."""
    rng = np.random.default_rng(5)
    A = banded(20, bandwidth=2, seed=5)
    _, Ls, _, _ = split_LU(A)
    D, D_inv = peel_diag(A)
    y = rng.uniform(-1, 1, 20)
    T = Ls.to_dense()
    Dinv = np.diag(D_inv)
    for inner in (0, 1, 3):
        expected = np.zeros(20)
        term = Dinv @ y
        expected += term
        for _ in range(inner):
            term = -Dinv @ (T @ term)
            expected += term
        Ld = from_csr(Ls, np.float64)
        got = np.asarray(two_stage_solve(Ld, jnp.asarray(D_inv),
                                         jnp.asarray(y), inner))
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-13)
    # as inner → ∞ it converges to the exact (T+D)⁻¹ y
    Ld = from_csr(Ls, np.float64)
    got = np.asarray(two_stage_solve(Ld, jnp.asarray(D_inv), jnp.asarray(y), 60))
    np.testing.assert_allclose(got, np.linalg.solve(T + np.diag(D), y),
                               rtol=1e-8, atol=1e-9)
