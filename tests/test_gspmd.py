"""GSPMD multi-chip path: shard_setup + unmodified solvers on an 8-device
virtual CPU mesh must reproduce the single-device answers.

This is the "annotate shardings, let XLA insert collectives" mode; the
hand-written shard_map CG (test_sharded.py) is the explicit-communication
comparison path.
"""
import jax
import numpy as np
import pytest

import basic_iterative_solvers_tpu as bis
from basic_iterative_solvers_tpu import dia
from basic_iterative_solvers_tpu.parallel import make_mesh, shard_setup
from basic_iterative_solvers_tpu.types import PrecondType, SolverType

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _cfg(method, precond, **kw):
    return bis.SolverConfig(method=method, preconditioner=precond,
                            dtype=np.float64, tolerance=1e-11,
                            harness="fused", **kw)


@pytest.mark.parametrize("method,precond", [
    (SolverType.CONJUGATE_GRADIENT, PrecondType.NONE),
    (SolverType.CONJUGATE_GRADIENT, PrecondType.JACOBI),
    (SolverType.BICGSTAB, PrecondType.SYMMETRIC_TWO_STAGE_GS),
    (SolverType.GMRES, PrecondType.TWO_STAGE_GS),
    (SolverType.JACOBI, PrecondType.NONE),
])
def test_gspmd_matches_single_device(method, precond):
    A = dia.stencil_27pt_device(8, 8, 8, dtype=np.float64)
    cfg = _cfg(method, precond, precond_inner_iters=1)
    setup1 = bis.preprocessing_device(A, cfg)
    res1 = bis.solve(setup1)

    mesh = make_mesh(8)
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), mesh)
    res8 = bis.solve(setup8)

    assert res8.converged == res1.converged
    assert res8.iter_count == res1.iter_count
    np.testing.assert_allclose(res8.x_star, res1.x_star, rtol=1e-8,
                               atol=1e-10)


def test_gspmd_sharding_is_applied():
    A = dia.stencil_27pt_device(8, 8, 8, dtype=np.float64)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT, PrecondType.NONE)
    mesh = make_mesh(8)
    setup = shard_setup(bis.preprocessing_device(A, cfg), mesh)
    # DIA rows sharded over the mesh; npad = 8192 → 1024 rows per device
    shards = setup.A.data.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (setup.A.data.shape[0],
                                    setup.A.data.shape[1] // 8)
    assert setup.config.use_pallas is False


def test_gspmd_rejects_indivisible():
    A = dia.banded_device(100, bandwidth=1, dtype=np.float64)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT, PrecondType.NONE)
    setup = bis.preprocessing_device(A, cfg)
    mesh = make_mesh(3)
    with pytest.raises(ValueError):
        shard_setup(setup, mesh)  # npad=8192 not divisible by 3


def test_gspmd_planar_stencil():
    """shard_setup on a planar-resident stencil setup (forced 'on')."""
    from basic_iterative_solvers_tpu import stencil_op
    A = stencil_op.stencil_27pt_operator(8, 8, 8, dtype=np.float64)
    cfg = bis.SolverConfig(method=SolverType.CONJUGATE_GRADIENT,
                           preconditioner=PrecondType.JACOBI,
                           dtype=np.float64, tolerance=1e-11,
                           harness="fused", planar_vectors="on")
    setup1 = bis.preprocessing_device(A, cfg)
    res1 = bis.solve(setup1)
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8))
    res8 = bis.solve(setup8)
    assert res8.converged and res8.iter_count == res1.iter_count
    np.testing.assert_allclose(res8.x_star, res1.x_star, rtol=1e-9,
                               atol=1e-11)
