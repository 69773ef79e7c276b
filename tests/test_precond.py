"""Preconditioner-apply tests (reference apply_preconditioner tests,
/root/reference/tests/test_kernels.cpp:156-225, extended to all 7 types)."""
import jax.numpy as jnp
import numpy as np
import pytest

from basic_iterative_solvers_tpu.config import SolverConfig
from basic_iterative_solvers_tpu.generators import banded, fdm_2d
from basic_iterative_solvers_tpu.precond import (
    apply_preconditioner, setup_preconditioner)
from basic_iterative_solvers_tpu.types import PrecondType
from tests.test_factor import dense_ilu0


def _dense_expected(pt, A_dense, y, inner=0):
    D = np.diag(np.diag(A_dense))
    Dv = np.diag(A_dense)
    Ls = np.tril(A_dense, -1)
    Us = np.triu(A_dense, 1)
    if pt == PrecondType.NONE:
        return y
    if pt == PrecondType.JACOBI:
        return y / Dv
    if pt == PrecondType.GAUSS_SEIDEL:
        return np.linalg.solve(Ls + D, y)
    if pt == PrecondType.BACKWARDS_GAUSS_SEIDEL:
        return np.linalg.solve(Us + D, y)
    if pt == PrecondType.SYMMETRIC_GAUSS_SEIDEL:
        return np.linalg.solve(Us + D, Dv * np.linalg.solve(Ls + D, y))
    if pt == PrecondType.TWO_STAGE_GS:
        Dinv = np.diag(1.0 / Dv)
        out = np.zeros_like(y)
        term = Dinv @ y
        out += term
        for _ in range(inner):
            term = -Dinv @ (Ls @ term)
            out += term
        return out
    if pt == PrecondType.SYMMETRIC_TWO_STAGE_GS:
        Dinv = np.diag(1.0 / Dv)

        def richardson(T, v):
            out = np.zeros_like(v)
            term = Dinv @ v
            out += term
            for _ in range(inner):
                term = -Dinv @ (T @ term)
                out += term
            return out

        return richardson(Us, Dv * richardson(Ls, y))
    if pt == PrecondType.ILU0:
        L, U = dense_ilu0(A_dense)
        return np.linalg.solve(U, np.linalg.solve(L, y))
    raise ValueError(pt)


@pytest.mark.parametrize("pt", list(PrecondType))
@pytest.mark.parametrize("inner", [0, 2])
def test_apply_matches_dense(pt, inner, rng):
    A = banded(18, bandwidth=2, seed=11)
    y = rng.uniform(-1, 1, 18)
    config = SolverConfig(preconditioner=pt, dtype=np.float64,
                          precond_inner_iters=inner)
    M = setup_preconditioner(A, config)
    z = np.asarray(apply_preconditioner(M, jnp.asarray(y)))
    expected = _dense_expected(pt, A.to_dense(), y, inner)
    np.testing.assert_allclose(z, expected, rtol=1e-11, atol=1e-12)


def test_outer_iters_composition(rng):
    """PRECOND_OUTER_ITERS applies M⁻¹ repeatedly (kernels.hpp:355-404)."""
    A = fdm_2d(4)
    y = rng.uniform(-1, 1, 16)
    config = SolverConfig(preconditioner=PrecondType.JACOBI,
                          dtype=np.float64, precond_outer_iters=3)
    M = setup_preconditioner(A, config)
    z = np.asarray(apply_preconditioner(M, jnp.asarray(y)))
    Dv = np.diag(A.to_dense())
    np.testing.assert_allclose(z, y / Dv ** 3, rtol=1e-12)


def test_jacobi_apply_reference_values():
    """reference test_kernels.cpp:156-225 style: exact expected outputs."""
    from basic_iterative_solvers_tpu.matrix import MatrixCSR
    A = MatrixCSR.from_dense(np.array([[2.0, 0, 0], [0, 4.0, 0], [0, 0, 8.0]]))
    config = SolverConfig(preconditioner=PrecondType.JACOBI, dtype=np.float64)
    M = setup_preconditioner(A, config)
    z = np.asarray(apply_preconditioner(M, jnp.asarray([2.0, 2.0, 2.0])))
    np.testing.assert_allclose(z, [1.0, 0.5, 0.25])
