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


def print_residuals(result, out=None) -> None:
    """Residual Norms / Time for iteration table
    (reference print_residuals, postprocessing.hpp:8-30)."""
    out = sys.stdout if out is None else out  # resolve at call time
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
    if getattr(result, "uniform_iteration_times", False):
        print("(fused harness: per-iteration times are the solve-average — "
              "the whole solve is one device dispatch)", file=out)


def summary_output(result, out=None) -> None:
    """Convergence summary (reference summary_output,
    postprocessing.hpp:33-68)."""
    out = sys.stdout if out is None else out  # resolve at call time
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


#: Practical single-chip HBM streaming bandwidth to measure against.  The
#: v5e spec sheet says 819 GB/s, but large fused streams on this class of
#: part sustain ~450 GB/s in practice (XLA's own stream benchmarks hit 372);
#: measuring "achieved %" against the spec number under-reports real
#: efficiency and misleads tuning.  Override per call for other parts.
MEASURED_HBM_GBPS = 450.0


def iteration_traffic_bytes(setup) -> int:
    """Estimated HBM bytes moved per solver iteration: SpMV streams plus
    every vector pass of the method recurrence and its preconditioner.

    The reference's LIKWID markers count only the three sparse kernels
    (kernels.hpp:25-40); a bandwidth-bound solver's true per-iteration
    traffic includes all the BLAS-1 passes too, so the roofline is computed
    against the total.  Pass counts are static estimates from the method
    recurrences (methods/{cg,jacobi,gmres,bicgstab}.hpp)."""
    from ..device_matrix import device_matrix_nnz_bytes
    from ..precond import estimated_precond_passes

    config = setup.config
    itemsize = np.dtype(setup.dtype).itemsize
    vec = setup.b.size * itemsize              # one full vector pass
    spmv = device_matrix_nnz_bytes(setup.A) + 2 * vec   # read x, write y

    # (n_spmv, n_vector_passes, n_precond_applies) per iteration
    shapes = {
        SolverType.JACOBI: (1, 5, 0),          # x_new, normalize, sample dot
        SolverType.GAUSS_SEIDEL: (2, 4, 0),    # U_strict·x + level solve
        SolverType.SYMMETRIC_GAUSS_SEIDEL: (4, 8, 0),
        SolverType.CONJUGATE_GRADIENT: (1, 10, 1),   # 3 dots + 3 axpys
        SolverType.BICGSTAB: (2, 16, 2),
        SolverType.GMRES: (1, 4, 1),           # + basis streaming below
    }
    n_spmv, n_vec, n_prec = shapes[config.method]
    if (getattr(setup, "gs_L_block", None) is not None
            and config.method in (SolverType.GAUSS_SEIDEL,
                                  SolverType.SYMMETRIC_GAUSS_SEIDEL)):
        # blocked residual-form sweep: ONE residual SpMV (the carried
        # residual feeds both the sweep and the sampled norm) + the
        # blocked trisolve passes (const mode → window/vector passes only)
        from ..precond import Preconditioner, estimated_precond_passes
        from ..types import PrecondType
        sym = config.method == SolverType.SYMMETRIC_GAUSS_SEIDEL
        Mb = Preconditioner(
            ptype=(PrecondType.SYMMETRIC_GAUSS_SEIDEL if sym
                   else PrecondType.GAUSS_SEIDEL),
            outer_iters=1, inner_iters=1, use_pallas=config.use_pallas,
            L_block=setup.gs_L_block, U_block=setup.gs_U_block)
        return int(spmv + (4 + estimated_precond_passes(Mb)) * vec)
    if setup.n_colors > 0 and config.method in (
            SolverType.GAUSS_SEIDEL, SolverType.SYMMETRIC_GAUSS_SEIDEL):
        # colored sweeps: one SpMV + one masked update per kernel step per
        # sweep; grid-spec supersteps chain sx colors per step (coloring.py)
        steps = setup.n_colors
        spec = setup.color_spec
        if (spec is not None and getattr(spec, "kind", None) == "grid"
                and spec.params[3] > 1):
            steps = max(1, setup.n_colors // spec.params[3])
        sweeps = 2 if config.method == SolverType.SYMMETRIC_GAUSS_SEIDEL else 1
        n_spmv = sweeps * steps + 1                   # +1 explicit sample
        n_vec = 3 * sweeps * steps + 2
    total = n_spmv * spmv + n_vec * vec
    if config.method == SolverType.GMRES:
        # basis streaming: passes over the ~(j+1)-row active basis per
        # iteration — lowsync 2, cgs2 4, mgs 2 (dot + axpy per row);
        # average j over a restart cycle = m/2.  Basis rows may be stored
        # narrower than the solve dtype (gmres_basis_dtype).
        m = config.restart_length
        passes = {"lowsync": 2, "cgs2": 4, "mgs": 2,
                  "fused": 2}[config.orthog_mode]
        bd = config.gmres_basis_dtype
        bvec = vec if bd is None else setup.b.size * 2 \
            if str(bd) in ("bfloat16", "bf16") else \
            setup.b.size * np.dtype(bd).itemsize
        total += passes * (m / 2 + 1) * bvec
    total += n_prec * estimated_precond_passes(setup.M) * vec
    return int(total)


def roofline_report(setup, result, hbm_gbps: float = MEASURED_HBM_GBPS,
                    out=None, secs_per_iter: float = None) -> None:
    """Per-solve achieved-bandwidth estimate vs the practical HBM roofline —
    the TPU analog of the reference's LIKWID counters (SURVEY.md §5).
    Counts TOTAL per-iteration traffic (SpMV + every vector pass) against the
    measured streaming bandwidth, and prints the achieved fraction so perf
    regressions are visible.  `secs_per_iter` overrides the solve-wall
    average — --iter-times passes the xprof DEVICE wall median there, since
    the instrumented host wall includes trace + re-run overhead and would
    read as a phantom 20x regression."""
    out = sys.stderr if out is None else out  # resolve at call time
    iters = max(1, result.iter_count)
    secs = (result.solve_seconds / iters if secs_per_iter is None
            else secs_per_iter)
    traffic = iteration_traffic_bytes(setup)
    floor_ms = traffic / (hbm_gbps * 1e9) * 1e3
    achieved_gbps = traffic / max(secs, 1e-12) / 1e9
    pct = 100.0 * achieved_gbps / hbm_gbps
    note = ""
    if pct > 110.0:
        # not an error: the "practical" rate is XLA's streaming figure;
        # explicit-DMA Pallas pipelines sustain ~580 GB/s on this part, and
        # working sets smaller than VMEM (128 MiB on v5e) run ON-CHIP —
        # the while-loop carries never round-trip through HBM at all
        note = (" [working set fits VMEM: on-chip rates]"
                if traffic < 110 * 1024 * 1024
                else " [above the XLA-stream rate: explicit-DMA kernels]")
    print(f"[roofline] {iters} iters, {secs * 1e3:.3f} ms/iter; est. "
          f"traffic {traffic / 1e6:.1f} MB/iter -> {achieved_gbps:.0f} GB/s "
          f"achieved = {pct:.0f}% of {hbm_gbps:.0f} GB/s practical roofline "
          f"(floor {floor_ms:.3f} ms/iter){note}", file=out)


def print_kernel_report(timers, result=None, out=None) -> None:
    """Hierarchical per-kernel timer table — the reference's print_timers
    (/root/reference/utilities/utilities.hpp:154-324): phase rows indented
    with their kernel children (spmv/precond/sptrsv/dot/norm/sum and the
    GMRES orthog/least_sq/update_g sections).  Kernel rows appear when the
    host harness ran with kernel_timers (utils/ktimers.py)."""
    out = sys.stderr if out is None else out
    names = set(timers.names())

    def g(n):
        return timers[n].check() if n in names else None

    rows = [(0, "total"), (1, "read_matrix"), (1, "preprocessing")]
    rows += [(2, n) for n in timers.names()
             if n.startswith("preprocessing_")]
    rows += [(1, "solve"),
             (2, "spmv"), (2, "precond"), (3, "sptrsv"),
             (2, "orthog"), (2, "least_sq"), (2, "update_g"),
             (2, "dot"), (2, "norm"), (2, "sum"),
             (1, "postprocessing")]
    width = 44
    lines = ["+" + "-" * (width + 14) + "+"]
    for depth, name in rows:
        v = g(name)
        if v is None:
            continue
        label = "| " * depth + name
        lines.append(f"| {label:<{width}} {v:10.6f} s |")
    lines.append("+" + "-" * (width + 14) + "+")
    print("\n".join(lines), file=out)
