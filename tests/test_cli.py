"""CLI tests (reference parse_cli, utilities.hpp:12-108 + main pipeline)."""
import subprocess
import sys

import numpy as np
import pytest

from basic_iterative_solvers_tpu.cli import parse_cli
from basic_iterative_solvers_tpu.types import PrecondType, SolverType


def test_parse_basic():
    src, opts, extras = parse_cli(["m.mtx", "-cg", "-p", "ilu0", "-rl", "25",
                                   "-scale", "1"])
    assert src == "m.mtx"
    assert opts["method"] == SolverType.CONJUGATE_GRADIENT
    assert opts["preconditioner"] == PrecondType.ILU0
    assert opts["restart_length"] == 25
    assert opts["num_scale"] is True


def test_parse_all_methods():
    for flag, st in [("-j", SolverType.JACOBI), ("-gs", SolverType.GAUSS_SEIDEL),
                     ("-sgs", SolverType.SYMMETRIC_GAUSS_SEIDEL),
                     ("-cg", SolverType.CONJUGATE_GRADIENT),
                     ("-gm", SolverType.GMRES), ("-bi", SolverType.BICGSTAB)]:
        _, opts, _ = parse_cli(["x", flag])
        assert opts["method"] == st


def test_parse_errors():
    with pytest.raises(SystemExit):
        parse_cli(["only_matrix"])
    with pytest.raises(SystemExit):
        parse_cli(["m.mtx", "-zz"])
    with pytest.raises(SystemExit):
        parse_cli(["m.mtx", "-cg", "-p", "nope"])


def test_parse_extras():
    _, _, extras = parse_cli(["x", "-bi", "--dtype", "float32",
                              "--harness", "fused", "--max-iters", "7",
                              "--tol", "1e-9", "--format", "ell"])
    assert extras["dtype"] == np.float32
    assert extras["harness"] == "fused"
    assert extras["max_iters"] == 7
    assert extras["tolerance"] == 1e-9
    assert extras["matrix_format"] == "ell"


def test_kernel_timers_keeps_fused_harness():
    """--kernel-timers no longer forces the host harness: the fused
    single-dispatch loop gets per-phase DEVICE attribution from a traced
    re-run (utils/xprof.py print_phase_table) instead."""
    for argv in (["x", "-cg", "--kernel-timers", "--harness", "fused"],
                 ["x", "-cg", "--harness", "fused", "--kernel-timers"]):
        _, _, extras = parse_cli(argv)
        assert extras["kernel_timers"] is True
        assert extras["harness"] == "fused"


def test_cli_end_to_end():
    """Full pipeline through the process boundary (the reference's main)."""
    out = subprocess.run(
        [sys.executable, "-m", "basic_iterative_solvers_tpu",
         "fdm:8", "-cg", "-p", "j", "--dtype", "float64",
         "--harness", "host", "--platform", "cpu"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "converged in:" in out.stdout
    assert "Residual Norms" in out.stdout
    assert "conjugate-gradient with preconditioner: jacobi" in out.stdout


def test_cli_profile_and_debug_checks(tmp_path, capsys):
    from basic_iterative_solvers_tpu.cli import run
    rc = run(["fdm:8", "-gm", "-rl", "20", "--platform", "cpu",
              "--harness", "host", "--debug-checks",
              "--profile", str(tmp_path / "trace")])
    assert rc == 0
    assert (tmp_path / "trace").exists()
    out = capsys.readouterr().out
    assert "converged" in out


def test_write_mtx_roundtrip(tmp_path):
    import numpy as np
    from basic_iterative_solvers_tpu import generators, read_mtx, write_mtx
    A = generators.banded(30, bandwidth=2, seed=7)
    path = tmp_path / "m.mtx"
    write_mtx(str(path), A, comment="roundtrip")
    B = read_mtx(str(path))
    np.testing.assert_array_equal(A.row_ptr, B.row_ptr)
    np.testing.assert_array_equal(A.col, B.col)
    np.testing.assert_allclose(A.val, B.val, rtol=1e-15)


def test_args_dataclass_to_config():
    import numpy as np
    from basic_iterative_solvers_tpu import Args
    from basic_iterative_solvers_tpu.types import PrecondType, SolverType
    a = Args(matrix_source="fdm:8", method=SolverType.BICGSTAB,
             preconditioner=PrecondType.JACOBI, perm_mode="rcm",
             dtype="float64", harness="host")
    cfg = a.to_config()
    assert cfg.method == SolverType.BICGSTAB
    assert cfg.perm_mode == "rcm"
    assert cfg.spec_dtype() == np.float64
    assert cfg.harness == "host"


def test_solve_system_convenience():
    import numpy as np
    import basic_iterative_solvers_tpu as bis
    res = bis.solve_system("fdm:12", method="cg", preconditioner="j",
                           dtype=np.float64, tolerance=1e-10)
    assert res.converged
    # device matrix input + enum method
    A = bis.dia.fdm_2d_device(12, dtype=np.float64)
    res2 = bis.solve_system(A, method=bis.SolverType.CONJUGATE_GRADIENT,
                            preconditioner=bis.PrecondType.JACOBI,
                            dtype=np.float64, tolerance=1e-10,
                            harness="fused")
    assert res2.converged and res2.iter_count == res.iter_count
    # CSR input with host-path preconditioner
    A_csr = bis.generators.fdm_2d(12)
    res3 = bis.solve_system(A_csr, method="bi", preconditioner="ilu0",
                            dtype=np.float64, tolerance=1e-10)
    assert res3.converged


def test_kernel_timers_cg(capsys):
    """--kernel-timers: per-kernel TIME attribution (reference
    TIME(timers->spmv, ...), methods/cg.hpp:16-52) + hierarchical table."""
    from basic_iterative_solvers_tpu.cli import run
    # ilu0 runs on the host-CSR path with level-scheduled trisolves, so
    # the sptrsv row appears (colored sgs would use masked spmv sweeps)
    rc = run(["fdm:10", "-cg", "-p", "ilu0", "--platform", "cpu",
              "--dtype", "float64", "--kernel-timers", "--tol", "1e-8"])
    assert rc == 0
    err = capsys.readouterr().err
    for section in ("spmv", "precond", "sptrsv", "dot", "sum"):
        assert section in err, f"missing kernel row: {section}"


def test_kernel_timers_gmres_sections(capsys):
    """GMRES gets the reference's orthog/least-sq/update-g breakdown
    (utilities.hpp:154-324)."""
    from basic_iterative_solvers_tpu.cli import run
    rc = run(["fdm:10", "-gm", "-rl", "15", "--platform", "cpu",
              "--dtype", "float64", "--kernel-timers", "--tol", "1e-8"])
    assert rc == 0
    err = capsys.readouterr().err
    for section in ("orthog", "least_sq", "update_g", "spmv"):
        assert section in err, f"missing kernel row: {section}"


def test_cli_new_gmres_flags(capsys):
    from basic_iterative_solvers_tpu.cli import run
    rc = run(["fdm:8", "-gm", "-rl", "20", "--orthog", "lowsync",
              "--platform", "cpu", "--dtype", "float64",
              "--harness", "fused", "--tol", "1e-9"])
    assert rc == 0
    assert "converged" in capsys.readouterr().out


def test_args_dataclass_new_knobs():
    from basic_iterative_solvers_tpu import Args
    a = Args(gs_mode="colored", orthog_mode="lowsync",
             gmres_basis_dtype="bfloat16")
    cfg = a.to_config()
    assert cfg.gs_mode == "colored"
    assert cfg.orthog_mode == "lowsync"
    assert cfg.gmres_basis_dtype == "bfloat16"


def test_parse_bench_mode():
    """Reference parity: the benchmark-harness parser variant drops the
    method flag (utilities.hpp:12-108 bench_mode parameter)."""
    src, opts, extras = parse_cli(["hpcg:8x8x8", "-p", "sgs", "-rl", "30"],
                                  bench_mode=True)
    assert src == "hpcg:8x8x8"
    assert "method" not in opts
    assert opts["preconditioner"] == PrecondType.SYMMETRIC_GAUSS_SEIDEL
    assert opts["restart_length"] == 30
