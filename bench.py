"""Headline benchmark.

Replicates the reference's published benchmark setup (BASELINE.md): solve
with the HPCG 27-point stencil matrix, b = 2.0, x0 = 1.0, and report **CG
time per iteration** — the reference measures 11.8 ms/iter for
unpreconditioned CG on HPCG-128-128-128 (~2.1M rows) on a Sapphire Rapids
socket.  We run the same matrix shape on one TPU chip, fp32, fused harness.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "ms_per_iter", "vs_baseline": N}
vs_baseline = reference_ms / our_ms  (>1 means faster than the reference).
Extra diagnostics go to stderr.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINES_MS = {
    # method -> reference ms/iter on HPCG-128 (BASELINE.md table)
    "cg": 11.8,
    "jacobi": 22.3,
    "gs": 46.5,
    "sgs": 46.5,
    "gmres": 23.8,
    "bicgstab": 24.0,
    "pcg": 105.3,
    "pgmres": 118.9,
    "pbicgstab": 247.9,
}

METHOD_MAP = {
    "cg": ("CONJUGATE_GRADIENT", "NONE"),
    "jacobi": ("JACOBI", "NONE"),
    "gs": ("GAUSS_SEIDEL", "NONE"),
    "sgs": ("SYMMETRIC_GAUSS_SEIDEL", "NONE"),
    "gmres": ("GMRES", "NONE"),
    "bicgstab": ("BICGSTAB", "NONE"),
    "pcg": ("CONJUGATE_GRADIENT", "SYMMETRIC_GAUSS_SEIDEL"),
    "pgmres": ("GMRES", "SYMMETRIC_GAUSS_SEIDEL"),
    "pbicgstab": ("BICGSTAB", "SYMMETRIC_GAUSS_SEIDEL"),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", default="hpcg:128x128x128")
    ap.add_argument("--method", default="cg", choices=sorted(METHOD_MAP))
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--matrix-dtype", default=None,
                    help="matrix data storage dtype (e.g. bfloat16); "
                         "default = --dtype")
    ap.add_argument("--format", default="auto",
                    choices=("auto", "dia", "stencil"),
                    help="device operator format for generator sources: "
                         "'stencil' = matrix-free constant-stencil kernel "
                         "(fastest for the generated benchmark matrices), "
                         "'dia' = explicit diagonal storage; auto picks "
                         "stencil when the source supports it")
    ap.add_argument("--restart-length", type=int, default=50)
    ap.add_argument("--precond-inner-iters", type=int, default=1)
    ap.add_argument("--orthog", default="cgs2", choices=("mgs", "cgs2"),
                    help="GMRES orthogonalization (cgs2 = batched MXU form)")
    args = ap.parse_args()

    import jax
    import basic_iterative_solvers_tpu as bis

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    method_name, precond_name = METHOD_MAP[args.method]
    dtype = np.dtype(args.dtype)

    if method_name in ("GAUSS_SEIDEL", "SYMMETRIC_GAUSS_SEIDEL"):
        # Exact GS sweeps on a 3-D stencil are inherently sequential (the
        # -1 offset makes every row depend on the previous: level count = n),
        # so there is no parallel exact form on ANY hardware — the reference
        # runs them serially (46.5 ms/iter and DNC).  Benchmark them on a
        # smaller system or via the two-stage (Richardson) smoother instead.
        log("ERROR: exact Gauss-Seidel sweeps are serial by construction on "
            "stencil matrices (level count == n rows); the reference runs "
            "them single-threaded.  Use a smaller matrix (e.g. "
            "--matrix hpcg:32x32x32 via the CLI) or the two-stage smoother "
            "(-p 2st/s2st).")
        sys.exit(2)

    # Generator specs build the matrix *on device* (dia.from_source_device):
    # construction and all of setup are diagonal-row slices on the TPU, no
    # O(nnz) host passes.  File sources go through the host CSR pipeline.
    is_gen = bis.dia._GEN_RE.match(args.matrix) is not None
    mat_dt = bis.SolverConfig(matrix_dtype=args.matrix_dtype,
                              dtype=dtype).mat_dtype()
    t0 = time.perf_counter()
    if is_gen:
        fmt = args.format
        if fmt == "auto":
            fmt = ("stencil"
                   if bis.stencil_op._GEN_RE.match(args.matrix) else "dia")
        if fmt == "stencil":
            A = bis.stencil_op.from_source_operator(args.matrix, dtype=mat_dt)
            jax.block_until_ready(A.coeffs)
            n_rows = A.n_rows
            nnz = "(matrix-free)"
        else:
            A = bis.dia.from_source_device(args.matrix, dtype=mat_dt)
            jax.block_until_ready(A.data)
            n_rows = A.n_rows
            nnz = int(jax.jit(lambda d: (d != 0).sum())(A.data))
    else:
        A = bis.generators.from_source(args.matrix)
        n_rows, nnz = A.n_rows, A.nnz
    log(f"matrix {args.matrix}: {n_rows} rows, {nnz} nnz "
        f"({time.perf_counter() - t0:.1f}s to build)")

    # Preconditioned variants: on TPU the sharded-friendly symmetric
    # two-stage (Richardson) form replaces exact triangular sweeps when the
    # matrix is large; exact level-scheduled solves remain available.
    if precond_name == "SYMMETRIC_GAUSS_SEIDEL" and (is_gen
                                                     or A.n_rows > 500_000):
        precond_name = "SYMMETRIC_TWO_STAGE_GS"
    cfg = bis.SolverConfig(
        method=getattr(bis.SolverType, method_name),
        preconditioner=getattr(bis.PrecondType, precond_name),
        dtype=dtype, matrix_dtype=args.matrix_dtype, harness="fused",
        max_iters=args.iters, tolerance=0.0,   # run exactly `iters` iterations
        restart_length=args.restart_length,
        orthog_mode=args.orthog,
        precond_inner_iters=args.precond_inner_iters)

    t0 = time.perf_counter()
    # Reference figure setup: b = 2.0, x0 = 1.0 (BASELINE.md).
    if is_gen:
        import jax.numpy as jnp
        setup = bis.preprocessing_device(
            A, cfg, b=jnp.full(n_rows, 2.0, dtype=dtype),
            x0=jnp.full(n_rows, 1.0, dtype=dtype))
    else:
        setup = bis.preprocessing(A, cfg,
                                  b=np.full(A.n_rows, 2.0),
                                  x0=np.full(A.n_rows, 1.0))
    log(f"preprocessing: {time.perf_counter() - t0:.1f}s "
        f"(device format: {type(setup.A).__name__})")

    # Run twice with the same method instance: the first call compiles the
    # fused while-loop; the second reuses the cached executable.
    from basic_iterative_solvers_tpu.solvers import make_method
    method = make_method(setup)
    t0 = time.perf_counter()
    res = bis.solve(setup, method=method)
    log(f"warmup solve: {time.perf_counter() - t0:.1f}s "
        f"({res.iter_count} iters, incl. compile)")
    best = float("inf")
    for rep in range(args.repeats):
        res = bis.solve(setup, method=method)
        ms = 1e3 * res.solve_seconds / max(1, res.iter_count)
        log(f"measured solve[{rep}]: {res.solve_seconds:.3f}s, "
            f"{res.iter_count} iters, {ms:.3f} ms/iter")
        best = min(best, ms)
    ms_per_iter = best
    log(f"best: {ms_per_iter:.3f} ms/iter, final ||r|| = "
        f"{res.final_residual_norm:.3e}")

    # roofline accounting (stderr only)
    from basic_iterative_solvers_tpu.device_matrix import device_matrix_nnz_bytes
    itemsize = np.dtype(args.dtype).itemsize
    spmv_bytes = device_matrix_nnz_bytes(setup.A) + 2 * n_rows * itemsize
    log(f"spmv traffic ≥ {spmv_bytes / 1e6:.0f} MB; at 819 GB/s (v5e) "
        f"floor = {spmv_bytes / 819e9 * 1e3:.3f} ms")

    base = BASELINES_MS[args.method]
    print(json.dumps({
        "metric": f"{args.method}_ms_per_iter_{args.matrix.replace(':', '_')}",
        "value": round(ms_per_iter, 4),
        "unit": "ms_per_iter",
        "vs_baseline": round(base / ms_per_iter, 3),
    }))


if __name__ == "__main__":
    main()
