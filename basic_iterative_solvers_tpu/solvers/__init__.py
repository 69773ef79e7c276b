from .base import (SolverSetup, SolveResult, preprocessing,  # noqa: F401
                   preprocessing_device, explicit_residual_norm, solve)
from .factory import make_method  # noqa: F401
