"""Pallas execution environment switch.

The TPU kernels normally run only on a real TPU backend; CPU falls back to
XLA implementations.  Tests flip `INTERPRET` (see tests/conftest.py fixture
`pallas_interpret`) to run the ACTUAL kernel bodies through the Pallas
interpreter on CPU — covering the Mosaic code paths (rolls, window slices,
async copies, aliasing) that the fallback paths bypass.
"""
import jax

#: when True, pallas_call sites run with interpret=True and the kernel
#: gates treat the backend as Pallas-capable
INTERPRET = False


def pallas_capable() -> bool:
    """True when Pallas kernels can execute (real TPU or interpret mode)."""
    return INTERPRET or jax.default_backend() == "tpu"
