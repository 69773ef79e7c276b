"""shard_map-wrapped Pallas kernels on the 8-device virtual CPU mesh.

GSPMD mode (test_gspmd.py) proves multi-chip *correctness* with the XLA
compute paths; this file proves the performance design: `shard_setup(
mode="shard_map")` keeps the ACTUAL Pallas kernel bodies (run per shard
through the interpreter — the CPU CI tier) with explicit ppermute halo
exchange, and reproduces the single-device trajectories exactly.
"""
import jax
import numpy as np
import pytest

import basic_iterative_solvers_tpu as bis
from basic_iterative_solvers_tpu import dia, generators, stencil_op
from basic_iterative_solvers_tpu.ops import pallas_env
from basic_iterative_solvers_tpu.parallel import make_mesh, shard_setup
from basic_iterative_solvers_tpu.parallel.mesh_ops import MeshDIA, MeshStencil
from basic_iterative_solvers_tpu.types import PrecondType, SolverType

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture
def interpret():
    pallas_env.INTERPRET = True
    try:
        yield
    finally:
        pallas_env.INTERPRET = False


def _cfg(method, precond, **kw):
    kw.setdefault("harness", "fused")
    return bis.SolverConfig(method=method, preconditioner=precond,
                            dtype=np.float64, tolerance=1e-11, **kw)


def _check(res8, res1):
    assert res8.converged == res1.converged
    assert res8.iter_count == res1.iter_count
    np.testing.assert_allclose(res8.x_star, res1.x_star, rtol=1e-8,
                               atol=1e-10)


def test_mesh_stencil_cg_jacobi(interpret):
    """Planar-resident stencil CG through the per-shard resident kernel
    (incl. the fused in-kernel dot, psum-reduced)."""
    A = stencil_op.stencil_27pt_operator(8, 8, 8, dtype=np.float64)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT, PrecondType.JACOBI,
               planar_vectors="on")
    setup1 = bis.preprocessing_device(A, cfg)
    res1 = bis.solve(setup1)
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8),
                         mode="shard_map")
    assert isinstance(setup8.A, MeshStencil)
    assert setup8.config.use_pallas is True
    res8 = bis.solve(setup8)
    _check(res8, res1)


@pytest.mark.slow
def test_mesh_stencil_colored_sgs(interpret):
    """Exact multicolor SGS preconditioner: the fused GS color-step kernel
    (superstep chains included) runs per shard with halo exchange."""
    A = stencil_op.stencil_27pt_operator(8, 8, 8, dtype=np.float64)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT,
               PrecondType.SYMMETRIC_GAUSS_SEIDEL, planar_vectors="on")
    setup1 = bis.preprocessing_device(A, cfg)
    assert setup1.M.n_colors == 8
    res1 = bis.solve(setup1)
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8),
                         mode="shard_map")
    assert isinstance(setup8.M.A_full_dev, MeshStencil)
    res8 = bis.solve(setup8)
    _check(res8, res1)


@pytest.mark.slow
def test_mesh_stencil_two_stage_bicgstab(interpret):
    """Richardson (two-stage) preconditioner: the strict-part stencils are
    mesh-wrapped and every inner sweep is one more halo exchange."""
    A = stencil_op.stencil_27pt_operator(8, 8, 8, dtype=np.float64)
    cfg = _cfg(SolverType.BICGSTAB, PrecondType.SYMMETRIC_TWO_STAGE_GS,
               planar_vectors="on", precond_inner_iters=2)
    setup1 = bis.preprocessing_device(A, cfg)
    res1 = bis.solve(setup1)
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8),
                         mode="shard_map")
    assert isinstance(setup8.M.L_strict_dev, MeshStencil)
    assert isinstance(setup8.M.U_strict_dev, MeshStencil)
    res8 = bis.solve(setup8)
    _check(res8, res1)


@pytest.mark.slow
def test_mesh_stencil_gmres_restarts(interpret):
    """Multi-restart GMRES over the mesh kernels."""
    A = stencil_op.stencil_27pt_operator(8, 8, 8, dtype=np.float64)
    cfg = _cfg(SolverType.GMRES, PrecondType.JACOBI, planar_vectors="on",
               restart_length=12, orthog_mode="lowsync")
    setup1 = bis.preprocessing_device(A, cfg)
    res1 = bis.solve(setup1)
    assert res1.converged and res1.gmres_restart_count >= 1
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8),
                         mode="shard_map")
    res8 = bis.solve(setup8)
    assert res8.gmres_restart_count == res1.gmres_restart_count
    _check(res8, res1)


def test_mesh_dia_cg(interpret):
    """DIA setups: the tiled DIA kernel runs per shard on a halo-padded
    local window."""
    A = dia.stencil_27pt_device(8, 8, 8, dtype=np.float64)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT, PrecondType.JACOBI)
    setup1 = bis.preprocessing_device(A, cfg)
    res1 = bis.solve(setup1)
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8),
                         mode="shard_map")
    assert isinstance(setup8.A, MeshDIA)
    # data rows sharded: each device holds 1/8 of the padded row dim
    shards = setup8.A.inner.data.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[1] == setup8.A.inner.data.shape[1] // 8
    res8 = bis.solve(setup8)
    _check(res8, res1)


@pytest.mark.slow
def test_mesh_blocked_ilu0(interpret):
    """Flagship: exact colored ILU(0) through the superblock trisolve with
    the factor planes ROW-SHARDED (each device streams 1/8 of the factors
    per apply) and flat solver vectors around a planar mesh kernel."""
    from basic_iterative_solvers_tpu.ops.block_trisolve import (
        MeshSuperBlockTriSolve)
    src = "hpcg:8x8x8"
    cfg = bis.SolverConfig(
        method=SolverType.CONJUGATE_GRADIENT,
        preconditioner=PrecondType.ILU0, gs_mode="colored",
        dtype=np.float64, tolerance=1e-10, harness="fused",
        color_spec=generators.color_spec_for_source(src))
    A_csr = generators.from_source(src)
    A_op = stencil_op.from_source_operator(src, dtype=np.float64)
    setup1 = bis.preprocessing(A_csr, cfg, A_dev=A_op)
    assert setup1.M.L_block is not None
    res1 = bis.solve(setup1)

    setup8 = shard_setup(
        bis.preprocessing(generators.from_source(src), cfg, A_dev=A_op),
        make_mesh(8), mode="shard_map")
    assert isinstance(setup8.A, MeshStencil)
    assert isinstance(setup8.M.L_block, MeshSuperBlockTriSolve)
    # the factor planes are genuinely partitioned: local slab rows = 1/8
    for plane in setup8.M.L_block.inner.vals_cross:
        if plane is not None:
            sh = plane.addressable_shards
            assert len(sh) == 8
            assert sh[0].data.shape[1] == plane.shape[1] // 8
    res8 = bis.solve(setup8)
    _check(res8, res1)


def test_mesh_requires_capability():
    """Without interpret mode (CPU, f64) shard_map mode must refuse and
    auto mode must fall back to GSPMD."""
    A = dia.stencil_27pt_device(8, 8, 8, dtype=np.float64)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT, PrecondType.NONE)
    setup = bis.preprocessing_device(A, cfg)
    with pytest.raises(ValueError, match="shard_map mode unavailable"):
        shard_setup(setup, make_mesh(8), mode="shard_map")
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8))
    assert not isinstance(setup8.A, MeshDIA)       # GSPMD fallback
    assert setup8.config.use_pallas is False


def test_mesh_spmv_unit(interpret, rng):
    """Direct kernel-level check: mesh SpMV == single-device resident
    kernel on the same operator (re-encoded between geometries)."""
    import dataclasses
    from basic_iterative_solvers_tpu.ops.spmv import spmv
    from basic_iterative_solvers_tpu.parallel.mesh_ops import wrap_stencil
    from basic_iterative_solvers_tpu.stencil_op import (
        from_planar_vec, stencil_spmv_resident, to_planar_matrix,
        to_planar_vec)
    A = to_planar_matrix(stencil_op.from_source_operator(
        "hpcg:8x6x4", dtype=np.float32))
    x = rng.standard_normal(A.n_rows).astype(np.float32)
    y1 = from_planar_vec(A, stencil_spmv_resident(A, to_planar_vec(A, x)))

    A8 = dataclasses.replace(A, shards=8, diag=None)
    M = wrap_stencil(A8, make_mesh(8), "rows")
    y8 = from_planar_vec(A8, spmv(M, to_planar_vec(A8, x)))
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y1), rtol=2e-6,
                               atol=1e-5)


def test_mesh_lane_ell_spmv_unit(interpret, rng):
    """General sparsity: the windowed lane-gather kernel runs per shard
    with one ppermute'd neighbor tile of halo each side."""
    from basic_iterative_solvers_tpu.ops.lane_ell import (csr_to_lane_ell,
                                                          lane_ell_spmv_xla)
    from basic_iterative_solvers_tpu.ops.spmv import spmv
    from basic_iterative_solvers_tpu.parallel.mesh_ops import (MeshLaneELL,
                                                               wrap_lane_ell)
    A = generators.scattered_band(2048, 6, 200, seed=3)
    M = csr_to_lane_ell(A, dtype=np.float64)
    x = rng.standard_normal(A.n_rows)
    import jax.numpy as jnp
    y1 = np.asarray(lane_ell_spmv_xla(M, jnp.asarray(x)))
    W = wrap_lane_ell(M, make_mesh(8), "rows", np.float64)
    assert isinstance(W, MeshLaneELL)
    # slot planes genuinely row-sharded: 1/8 of the (padded) x2 rows each
    shards = W.inner.vals.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[1] == W.inner.R // 8
    y8 = np.asarray(spmv(W, jnp.asarray(x)))
    np.testing.assert_allclose(y8, y1, rtol=1e-12, atol=1e-12)


def test_mesh_lane_ell_cg_jacobi(interpret):
    """Scattered-pattern CG through the per-shard lane-ELL kernel (the
    path GSPMD mode can only serve with an all-gathered flat gather)."""
    from basic_iterative_solvers_tpu.parallel.mesh_ops import MeshLaneELL
    A = generators.scattered_band(2048, 6, 200, seed=3)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT, PrecondType.JACOBI,
               matrix_format="lane_ell")
    setup1 = bis.preprocessing(A, cfg)
    res1 = bis.solve(setup1)
    setup8 = shard_setup(bis.preprocessing(A, cfg), make_mesh(8),
                         mode="shard_map")
    assert isinstance(setup8.A, MeshLaneELL)
    assert setup8.config.use_pallas is True
    res8 = bis.solve(setup8)
    _check(res8, res1)


@pytest.mark.slow
def test_mesh_lane_ell_two_stage_bicgstab(interpret):
    """Richardson (two-stage) strict parts as mesh lane-ELL operators:
    every inner sweep is one more shard-local kernel + halo exchange."""
    from basic_iterative_solvers_tpu.parallel.mesh_ops import MeshLaneELL
    A = generators.scattered_band(2048, 6, 200, seed=3)
    cfg = _cfg(SolverType.BICGSTAB, PrecondType.TWO_STAGE_GS,
               matrix_format="lane_ell")
    setup1 = bis.preprocessing(A, cfg)
    res1 = bis.solve(setup1)
    setup8 = shard_setup(bis.preprocessing(A, cfg), make_mesh(8),
                         mode="shard_map")
    assert isinstance(setup8.A, MeshLaneELL)
    assert isinstance(setup8.M.L_strict_dev, MeshLaneELL)
    res8 = bis.solve(setup8)
    _check(res8, res1)


@pytest.mark.slow
def test_mesh_pipelined_cg(interpret):
    """Pipelined PCG (single fused reduction point — the multi-chip
    latency mode) through the per-shard stencil kernels."""
    A = stencil_op.stencil_27pt_operator(8, 8, 8, dtype=np.float64)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT, PrecondType.JACOBI,
               planar_vectors="on", cg_flavor="pipelined")
    setup1 = bis.preprocessing_device(A, cfg)
    res1 = bis.solve(setup1)
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8),
                         mode="shard_map")
    assert isinstance(setup8.A, MeshStencil)
    res8 = bis.solve(setup8)
    _check(res8, res1)


@pytest.mark.slow
def test_mesh_lane_ell_chebyshev(interpret):
    """Chebyshev polynomial M⁻¹ on the mesh lane-ELL path: a strong
    preconditioner for general sparsity that adds ZERO reductions per
    apply (pure shard-local SpMV chain + halo exchanges)."""
    from basic_iterative_solvers_tpu.parallel.mesh_ops import MeshLaneELL
    A = generators.scattered_band(2048, 6, 200, seed=3)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT, PrecondType.CHEBYSHEV,
               matrix_format="lane_ell")
    setup1 = bis.preprocessing(A, cfg)
    res1 = bis.solve(setup1)
    setup8 = shard_setup(bis.preprocessing(A, cfg), make_mesh(8),
                         mode="shard_map")
    assert isinstance(setup8.M.A_full_dev, MeshLaneELL)
    res8 = bis.solve(setup8)
    _check(res8, res1)


@pytest.mark.slow
def test_mesh_multigrid(interpret):
    """Geometric multigrid V-cycle M⁻¹ over a mesh: GSPMD partitions the
    whole cycle (trajectory matches single-device); the shard_map kernel
    path refuses planar-vector MG cleanly (its hierarchy is built against
    the unsharded planar geometry) and auto mode falls back to GSPMD."""
    import pytest

    A = stencil_op.stencil_27pt_operator(8, 8, 8, dtype=np.float64)
    cfg = _cfg(SolverType.CONJUGATE_GRADIENT, PrecondType.MULTIGRID,
               planar_vectors="on")
    res1 = bis.solve(bis.preprocessing_device(A, cfg))
    setup8 = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8),
                         mode="gspmd")
    _check(bis.solve(setup8), res1)
    with pytest.raises(ValueError, match="multigrid.*gspmd"):
        shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8),
                    mode="shard_map")
    # auto mode silently takes the GSPMD path
    setup_auto = shard_setup(bis.preprocessing_device(A, cfg), make_mesh(8))
    _check(bis.solve(setup_auto), res1)


@pytest.mark.slow
def test_mesh_lane_ell_greedy_colored_sgs(interpret):
    """General-CSR EXACT colored GS/SGS over the mesh: the greedy color-id
    array shards with the rows — each sweep step is one full-operator mesh
    SpMV + a masked elementwise update, so the masks partition exactly like
    the vectors (the reference reaches the same row-parallel structure via
    SMAX permutation, smax_helpers.hpp:44-80)."""
    from basic_iterative_solvers_tpu.parallel.mesh_ops import MeshLaneELL
    A = generators.scattered_band(2048, 6, 200, seed=3)
    for method, precond in (
            (SolverType.SYMMETRIC_GAUSS_SEIDEL, PrecondType.NONE),
            (SolverType.CONJUGATE_GRADIENT,
             PrecondType.SYMMETRIC_GAUSS_SEIDEL)):
        cfg = _cfg(method, precond,
                   matrix_format="lane_ell", gs_mode="colored")
        setup1 = bis.preprocessing(A, cfg)
        carr = setup1.color_arr if precond is PrecondType.NONE \
            else setup1.M.color_arr
        assert carr is not None, "expected a greedy color array"
        res1 = bis.solve(setup1)
        setup8 = shard_setup(bis.preprocessing(A, cfg), make_mesh(8),
                             mode="shard_map")
        assert isinstance(setup8.A, MeshLaneELL)
        carr8 = setup8.color_arr if precond is PrecondType.NONE \
            else setup8.M.color_arr
        assert len(carr8.addressable_shards) == 8  # ids sharded with rows
        res8 = bis.solve(setup8)
        _check(res8, res1)
