"""Method factory — the analog of the reference's solver factory switch
(/root/reference/main.cpp:22-44)."""
from __future__ import annotations

from ..types import SolverType
from .base import SolverSetup
from .bicgstab import BiCGSTABMethod
from .cg import ConjugateGradientMethod
from .gauss_seidel import GaussSeidelMethod, SymmetricGaussSeidelMethod
from .gmres import GMRESMethod
from .jacobi import JacobiMethod

_METHODS = {
    SolverType.JACOBI: JacobiMethod,
    SolverType.GAUSS_SEIDEL: GaussSeidelMethod,
    SolverType.SYMMETRIC_GAUSS_SEIDEL: SymmetricGaussSeidelMethod,
    SolverType.CONJUGATE_GRADIENT: ConjugateGradientMethod,
    SolverType.BICGSTAB: BiCGSTABMethod,
    SolverType.GMRES: GMRESMethod,
}


def make_method(setup: SolverSetup):
    cfg = setup.config
    if cfg.method == SolverType.CONJUGATE_GRADIENT:
        if cfg.cg_flavor == "pipelined":
            from .cg import PipelinedCGMethod
            return PipelinedCGMethod(setup)
        if cfg.cg_flavor != "classic":
            raise ValueError(f"unknown cg_flavor: {cfg.cg_flavor!r} "
                             "(expected 'classic' or 'pipelined')")
    try:
        cls = _METHODS[setup.config.method]
    except KeyError:
        raise ValueError(f"unsupported solver: {setup.config.method}")
    return cls(setup)
