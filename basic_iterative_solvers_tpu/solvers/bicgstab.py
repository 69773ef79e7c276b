"""Preconditioned BiCGSTAB.

Re-design of BiCGSTABSolver (/root/reference/methods/bicgstab.hpp), which
follows the flexible-BiCGSTAB formulation it cites (bicgstab.hpp:6-7).
Per iteration (bicgstab_separate_iteration, bicgstab.hpp:8-83):

    y    = M⁻¹·p
    v    = A·y
    α    = ρ / (r̂₀, v)
    s    = r − α·v
    ŝ    = M⁻¹·s
    t    = A·ŝ
    ω    = (t, s) / (t, t)
    x'   = (x + α·y) + ω·ŝ
    r'   = s − ω·t
    ρ'   = (r̂₀, r')
    β    = (ρ'/ρ)(α/ω)
    p'   = r' + β(p − ω·v)

Initialization (bicgstab.hpp:147-169): r = b − A·x₀ (the running residual
starts *unpreconditioned*), the shadow residual r̂₀ = M⁻¹r₀ and p₀ = r̂₀,
ρ₀ = (r₀, M⁻¹r₀).  Sampled norm is ||r'||₂ (bicgstab.hpp:220-223).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.blas1 import dot, euclidean_vec_norm, subtract_vectors, sum_vectors
from ..ops.spmv import spmv, spmv_dots
from ..precond import apply_preconditioner
from .base import SolverSetup
from .fused import fused_solve


def _finite_or_zero(s):
    return jnp.where(jnp.isfinite(s), s, jnp.zeros_like(s))


class BiCGSTABMethod:
    supports_fused = True

    def __init__(self, setup: SolverSetup):
        self.setup = setup
        self.A = setup.A
        self.M = setup.M
        self.b = setup.b
        self.use_pallas = setup.config.use_pallas
        # tolerance=0 benchmark guard (SolverConfig.breakdown_stall): past
        # the attainable floor BiCGSTAB's ρ/ω quotients divide ~0/~0 and
        # the recurrence goes NaN — zeroed scalars freeze the state so
        # timed tolerance=0 runs keep doing representative finite work
        self._stall = setup.config.breakdown_stall

    def init_state(self):
        x = self.setup.x0
        r = subtract_vectors(self.b, spmv(self.A, x, self.use_pallas))
        r_prec = apply_preconditioner(self.M, r)
        rho = dot(r, r_prec)
        return {"x": x, "r": r, "p": r_prec, "r0hat": r_prec, "rho": rho,
                "residual_norm": euclidean_vec_norm(r)}

    def initial_residual_norm(self, state):
        return state["residual_norm"]

    def iterate(self, state):
        x, r, p = state["x"], state["r"], state["p"]
        r0hat, rho = state["r0hat"], state["rho"]
        y = apply_preconditioner(self.M, p)
        # α and ω dots are accumulated inside the SpMV kernels where the
        # format supports it (ops.spmv.spmv_dots) — no separate passes.
        v, r0hat_v = spmv_dots(self.A, y, aux=r0hat,
                               use_pallas=self.use_pallas)
        alpha = rho / r0hat_v
        if self._stall:
            alpha = _finite_or_zero(alpha)
        s = subtract_vectors(r, v, alpha)
        s_hat = apply_preconditioner(self.M, s)
        t, t_s, t_t = spmv_dots(self.A, s_hat, aux=s, with_self=True,
                                use_pallas=self.use_pallas)
        omega = t_s / t_t
        if self._stall:
            omega = _finite_or_zero(omega)
        x_new = sum_vectors(sum_vectors(x, y, alpha), s_hat, omega)
        r_new = subtract_vectors(s, t, omega)
        rho_new = dot(r0hat, r_new)
        beta = (rho_new / rho) * (alpha / omega)
        if self._stall:
            beta = _finite_or_zero(beta)
        p_new = sum_vectors(r_new, subtract_vectors(p, v, omega), beta)
        return {"x": x_new, "r": r_new, "p": p_new, "r0hat": r0hat,
                "rho": rho_new,
                "residual_norm": euclidean_vec_norm(r_new)}

    def sample_norm(self, state):
        return state["residual_norm"]

    def check_restart(self, state, iter_count, residual_norm, stopping):
        return state, False, residual_norm

    def final_x(self, state):
        return state["x"]

    def solve_fused(self):
        return fused_solve(self.setup, self.init_state, self.iterate,
                           self.sample_norm, self.final_x, cache_on=self)
