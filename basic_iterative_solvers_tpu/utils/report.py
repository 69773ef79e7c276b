"""Result reporting.

Output-shape analog of the reference postprocessing
(/root/reference/postprocessing.hpp:8-68): per-sample residual-norm table
with per-iteration times, then a convergence summary naming solver,
preconditioner, iteration count, stopping criterion and final residual.
Plus the roofline accounting that replaces LIKWID hardware counters.
"""
from __future__ import annotations

import sys

import numpy as np

from ..types import PrecondType, SolverType, to_string


def print_residuals(result, out=sys.stdout) -> None:
    """Residual Norms / Time for iteration table
    (reference print_residuals, postprocessing.hpp:8-30)."""
    norms = result.residual_norms
    times = result.time_per_iteration
    k = result.res_check_len
    print(f"\n{'':15}Residual Norms{'':27}Time for iteration", file=out)
    print("+" + "-" * 42 + "+" + " " * 8 + "+" + "-" * 25 + "+", file=out)
    for i, rn in enumerate(norms):
        line = f"||A*x_{i * k} - b||_2 = {rn:.16e}"
        if i > 0 and i < len(times):
            line += f"{times[i]:>25.6f}[s]"
        print(line, file=out)


def summary_output(result, out=sys.stdout) -> None:
    """Convergence summary (reference summary_output,
    postprocessing.hpp:33-68)."""
    print_residuals(result, out)
    iter_count = result.iter_count
    if result.method == SolverType.GMRES:
        # restarts count as iterations in the summary (postprocessing.hpp:39-40)
        iter_count += result.gmres_restart_count
    name = to_string(result.method)
    if result.method == SolverType.GMRES:
        name += f"({result.restart_length})"
    line = f"\nSolver: {name}"
    if result.preconditioner not in (None, PrecondType.NONE):
        line += f" with preconditioner: {to_string(result.preconditioner)}"
    if result.converged:
        line += f" converged in: {iter_count} iterations."
    else:
        line += f" did not converge after {iter_count} iterations."
    print(line, file=out)
    print('With the stopping criteria "tol * ||Ax_0 - b||_2" is: '
          f"{result.stopping_criteria:.16e}", file=out)
    print("The residual of the final iteration is: ||A*x_star - b||_2 = "
          f"{result.final_residual_norm:.16e}.", file=out)


def roofline_report(setup, result, hbm_gbps: float = 819.0,
                    out=sys.stderr) -> None:
    """Per-solve achieved-bandwidth estimate vs the HBM roofline — the TPU
    analog of the reference's LIKWID counters (SURVEY.md §5)."""
    from ..device_matrix import device_matrix_nnz_bytes

    itemsize = np.dtype(setup.dtype).itemsize
    n = setup.n
    spmv_bytes = device_matrix_nnz_bytes(setup.A) + 2 * n * itemsize
    iters = max(1, result.iter_count)
    secs = result.solve_seconds / iters
    print(f"[roofline] {iters} iters, {secs * 1e3:.3f} ms/iter; "
          f"SpMV stream ≥ {spmv_bytes / 1e6:.1f} MB "
          f"(floor {spmv_bytes / (hbm_gbps * 1e9) * 1e3:.3f} ms at "
          f"{hbm_gbps:.0f} GB/s)", file=out)
