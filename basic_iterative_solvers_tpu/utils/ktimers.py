"""Per-kernel stacked timers — the reference's TIME(timers->spmv, ...) layer.

The reference wraps EVERY kernel call site in a named stopwatch
(/root/reference/methods/cg.hpp:16-52, common.hpp:249-254) and prints a
solver-specific hierarchical table with GMRES orthog/least-sq/update-g
sections (/root/reference/utilities/utilities.hpp:154-324).  Under jit that
attribution is impossible (XLA fuses everything), so kernel timing is a
HOST-harness analysis mode: with ``SolverConfig.kernel_timers`` the harness
runs the method's iterate eagerly (each op dispatched on its own) and every
instrumented call site synchronizes on its outputs and accumulates into the
active `Timers` registry.  Off (the default), the hooks are zero-cost
pass-throughs and tracing is unaffected.
"""
from __future__ import annotations

from typing import Optional

import jax

from .timers import Timers

_ACTIVE: Optional[Timers] = None


def activate(timers: Optional[Timers]) -> None:
    """Install (or clear, with None) the kernel-timer registry."""
    global _ACTIVE
    _ACTIVE = timers


def active() -> Optional[Timers]:
    return _ACTIVE


def ktime(name: str, fn, *args, **kwargs):
    """Run fn; when kernel timing is active AND we are not inside a trace,
    block on the outputs and charge the wall time to `name`."""
    t = _ACTIVE
    if t is None:
        return fn(*args, **kwargs)
    if any(isinstance(a, jax.core.Tracer) for a in jax.tree.leaves(args)):
        return fn(*args, **kwargs)   # inside jit — no per-op attribution
    sw = t[name]
    sw.start()
    try:
        out = jax.block_until_ready(fn(*args, **kwargs))
    finally:
        sw.stop()
    return out
