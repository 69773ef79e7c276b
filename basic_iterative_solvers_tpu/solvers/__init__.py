from .base import SolverSetup, SolveResult, preprocessing, solve  # noqa: F401
from .factory import make_method  # noqa: F401
