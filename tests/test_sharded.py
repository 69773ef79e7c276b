"""Multi-device tests on the 8-virtual-CPU mesh — the distributed tier the
reference has no analog for (SURVEY.md §2.6, §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basic_iterative_solvers_tpu.device_matrix import csr_to_dia
from basic_iterative_solvers_tpu.generators import fdm_2d, stencil_27pt
from basic_iterative_solvers_tpu.parallel import (
    make_mesh, make_sharded_cg, shard_dia)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return make_mesh(8)


@pytest.mark.slow
def test_sharded_spmv_matches_host(mesh8):
    A = stencil_27pt(16, 16, 16)  # 4096 rows; halo 16*16+16+1=273 < 1024 local
    Ad = csr_to_dia(A, np.float64)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, A.n_rows)
    cg = make_sharded_cg(Ad, jnp.zeros(A.n_rows), mesh8)
    # drive one spmv through the sharded step: r = b - A x with b = 0 → -Ax
    state = cg.init_state(
        jax.device_put(jnp.pad(jnp.asarray(x), (0, cg.npad - A.n_rows)),
                       jax.sharding.NamedSharding(mesh8,
                                                  jax.sharding.PartitionSpec("rows"))))
    r = np.asarray(state["r"])[:A.n_rows]
    np.testing.assert_allclose(-r, A.spmv(x), rtol=1e-12, atol=1e-12)


def test_sharded_cg_matches_single_device(mesh8):
    """Distributed CG reproduces the single-device trajectory."""
    import basic_iterative_solvers_tpu as bis
    A = fdm_2d(16)  # 256 rows
    x_star = np.linspace(1.0, 2.0, 256)
    b = A.spmv(x_star)
    Ad = csr_to_dia(A, np.float64)
    from basic_iterative_solvers_tpu.factor import peel_diag
    D, D_inv = peel_diag(A)

    cg = make_sharded_cg(Ad, jnp.asarray(b), mesh8, D_inv=jnp.asarray(D_inv))
    x0 = cg.b * 0.0  # sharded zeros
    state = cg.init_state(x0)
    step = cg.step_fn()
    norms_sharded = [float(state["residual_norm"])]
    for _ in range(60):
        state = step(state)
        norms_sharded.append(float(state["residual_norm"]))

    # single-device trajectory through the main solver stack
    cfg = bis.SolverConfig(method=bis.SolverType.CONJUGATE_GRADIENT,
                           preconditioner=bis.PrecondType.JACOBI,
                           dtype=np.float64, harness="host", max_iters=60,
                           tolerance=0.0)
    setup = bis.preprocessing(A, cfg, b=b, x0=np.zeros(256))
    result = bis.solve(setup)
    norms_single = result.residual_norms[:61]
    # atol floor: psum and single-device reductions differ in summation
    # order, visible only once ||r|| is at round-off scale.
    np.testing.assert_allclose(norms_sharded[:len(norms_single)],
                               norms_single, rtol=1e-9, atol=1e-15)
    # and it actually solves the system
    x = np.asarray(state["x"])[:256]
    np.testing.assert_allclose(x, x_star, atol=1e-6)


def test_halo_widths_guarded(mesh8):
    """Sharding must reject matrices whose halo exceeds the shard."""
    A = fdm_2d(96)  # offsets ±96; 9216 rows → npad 16384, local 2048: fine
    Ad = csr_to_dia(A, np.float64)
    shard_dia(Ad, mesh8)  # ok
    # Construct a pathological wide-offset matrix: halo > local
    from basic_iterative_solvers_tpu.matrix import MatrixCSR
    n = 8192
    dense_diag = np.eye(8)  # placeholder, built via COO below
    from basic_iterative_solvers_tpu.matrix import MatrixCOO, convert_coo_to_csr
    I = np.arange(n)
    coo = MatrixCOO.from_arrays(
        np.concatenate([I, I[:-4096]]),
        np.concatenate([I, I[:-4096] + 4096]),
        np.ones(2 * n - 4096), n_rows=n, n_cols=n)
    Aw = convert_coo_to_csr(coo)
    Adw = csr_to_dia(Aw, np.float64)
    with pytest.raises(ValueError, match="halo"):
        shard_dia(Adw, mesh8)


@pytest.mark.slow
def test_sharded_cg_two_stage_matches_single_device(mesh8):
    """Distributed PCG with the symmetric two-stage (Richardson) M⁻¹ —
    each inner sweep is one more ppermute halo exchange — reproduces the
    single-device trajectory (round-1 VERDICT: the shard_map path lacked
    the Richardson family its docstring advertised)."""
    import basic_iterative_solvers_tpu as bis
    A = fdm_2d(16)  # 256 rows
    x_star = np.linspace(1.0, 2.0, 256)
    b = A.spmv(x_star)
    Ad = csr_to_dia(A, np.float64)
    from basic_iterative_solvers_tpu.factor import peel_diag
    D, D_inv = peel_diag(A)

    cg = make_sharded_cg(Ad, jnp.asarray(b), mesh8,
                         D_inv=jnp.asarray(D_inv), two_stage=True,
                         inner_iters=2)
    state = cg.init_state(cg.b * 0.0)
    step = cg.step_fn()
    norms_sharded = [float(state["residual_norm"])]
    for _ in range(40):
        state = step(state)
        norms_sharded.append(float(state["residual_norm"]))

    cfg = bis.SolverConfig(method=bis.SolverType.CONJUGATE_GRADIENT,
                           preconditioner=bis.PrecondType.SYMMETRIC_TWO_STAGE_GS,
                           precond_inner_iters=2, dtype=np.float64,
                           harness="host", max_iters=40, tolerance=0.0)
    setup = bis.preprocessing(A, cfg, b=b, x0=np.zeros(256))
    result = bis.solve(setup)
    norms_single = result.residual_norms[:41]
    np.testing.assert_allclose(norms_sharded[:len(norms_single)],
                               norms_single, rtol=1e-9, atol=1e-15)
    x = np.asarray(state["x"])[:256]
    np.testing.assert_allclose(x, x_star, atol=1e-6)
