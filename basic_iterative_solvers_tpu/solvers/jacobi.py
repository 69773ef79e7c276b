"""Jacobi solver.

Re-design of JacobiSolver (/root/reference/methods/jacobi.hpp): the
"separate" iteration the reference actually runs (jacobi.hpp:43-52) —
full SpMV then a normalize step — expressed functionally:

    t = A·x
    x' = (b − (t − D·x)) / D        [normalize_x, jacobi.hpp:27-40]

Residual sampling recomputes ||b − A·x'|| explicitly with an extra SpMV,
exactly like the reference (jacobi.hpp:102-107).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.spmv import spmv
from .base import SolverSetup
from .fused import fused_solve


class JacobiMethod:
    supports_fused = True

    def __init__(self, setup: SolverSetup):
        if setup.A_D is None:
            raise ValueError("Jacobi requires the matrix diagonal")
        self.setup = setup
        self.A = setup.A
        self.b = setup.b
        self.D = setup.A_D
        self.use_pallas = setup.config.use_pallas

    def init_state(self):
        x = self.setup.x0
        r = self.b - spmv(self.A, x, self.use_pallas)
        return {"x": x,
                "residual_norm": jnp.sqrt(jnp.dot(r, r))}

    def initial_residual_norm(self, state):
        return state["residual_norm"]

    def iterate(self, state):
        x = state["x"]
        t = spmv(self.A, x, self.use_pallas)
        x_new = (self.b - (t - self.D * x)) / self.D
        return dict(state, x=x_new)

    def sample_norm(self, state):
        r = self.b - spmv(self.A, state["x"], self.use_pallas)
        return jnp.sqrt(jnp.dot(r, r))

    def check_restart(self, state, iter_count, residual_norm, stopping):
        return state, False, residual_norm

    def final_x(self, state):
        return state["x"]

    def solve_fused(self):
        return fused_solve(self.setup, self.init_state, self.iterate,
                           self.sample_norm, self.final_x, cache_on=self)
