"""Fully-fused device-side solve loop — the TPU performance mode.

The reference's harness is a host do-while around per-iteration kernel
launches (solver_harness.hpp:15-51).  On TPU, host round-trips per iteration
waste the accelerator; this driver runs the *entire* solve as one
``lax.while_loop`` under jit: stopping criterion, divergence check,
residual-history recording and (for GMRES) restarts all happen on device.
Semantics match the host harness: sample every `res_check_len` iterations,
stop on ``||r|| < tol*||r0||`` / max_iters / NaN (solver.hpp:166-191).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import SolveResult, SolverSetup


def fused_solve(setup: SolverSetup, init_state: Callable, iterate: Callable,
                sample_norm: Callable,
                final_x: Callable,
                restart_fn: Optional[Callable] = None) -> SolveResult:
    """Generic fused driver.

    init_state() -> state dict with 'residual_norm' set to ||b - A x0||;
    iterate(state) -> state; sample_norm(state) -> device scalar;
    restart_fn(state, iter_count, stopping) -> (state, restarted_bool)
    for GMRES, else None.
    """
    config = setup.config
    max_iters = config.max_iters
    k = config.res_check_len
    max_hist = max_iters * 2 + 2

    def run(state0):
        r0 = state0["residual_norm"]
        stopping = config.tolerance * r0
        norms = jnp.zeros(max_hist, dtype=r0.dtype).at[0].set(r0)

        def cond(carry):
            state, it, norms_, hist, restarts = carry
            rn = state["residual_norm"]
            not_conv = jnp.abs(rn) >= stopping
            under_max = it < (max_iters - restarts)
            finite = jnp.isfinite(rn)
            return not_conv & under_max & finite

        def body(carry):
            state, it, norms_, hist, restarts = carry
            state = iterate(state)
            it = it + 1
            do_sample = (it % k) == 0
            rn = jax.lax.cond(do_sample, lambda s: sample_norm(s),
                              lambda s: s["residual_norm"], state)
            state = dict(state, residual_norm=rn)
            norms_ = jax.lax.cond(
                do_sample, lambda n: n.at[hist].set(rn), lambda n: n, norms_)
            hist = hist + do_sample.astype(jnp.int32)
            if restart_fn is not None:
                state, restarted = restart_fn(state, it, stopping)
                restarts = restarts + restarted.astype(jnp.int32)
                norms_ = jax.lax.cond(
                    restarted,
                    lambda n: n.at[hist].set(state["residual_norm"]),
                    lambda n: n, norms_)
                hist = hist + restarted.astype(jnp.int32)
            return (state, it, norms_, hist, restarts)

        carry = (state0, jnp.int32(0), norms, jnp.int32(1), jnp.int32(0))
        state, it, norms, hist, restarts = jax.lax.while_loop(cond, body, carry)
        return state, it, norms, hist, restarts, stopping

    run_jit = jax.jit(run)
    state0 = jax.jit(init_state)()
    state0 = jax.block_until_ready(state0)
    t0 = time.perf_counter()
    state, it, norms, hist, restarts, stopping = jax.block_until_ready(
        run_jit(state0))
    solve_seconds = time.perf_counter() - t0

    it = int(it)
    hist = int(hist)
    restarts = int(restarts)
    norms = np.array(norms)[:hist + 1]
    residual_norm = float(state["residual_norm"])
    x_star = np.asarray(final_x(state))
    final_norm = float(np.linalg.norm(
        np.asarray(setup.b, dtype=np.float64)
        - setup.A_host.spmv(x_star.astype(np.float64))))
    norms[hist] = final_norm
    times = np.full(hist + 1, solve_seconds / max(1, it))

    return SolveResult(
        x_star=x_star, iter_count=it,
        converged=bool(residual_norm < float(stopping)),
        stopping_criteria=float(stopping),
        residual_norms=norms, time_per_iteration=times,
        final_residual_norm=final_norm,
        gmres_restart_count=restarts,
        method=config.method, preconditioner=config.preconditioner,
        restart_length=config.restart_length,
        res_check_len=k, solve_seconds=solve_seconds)
