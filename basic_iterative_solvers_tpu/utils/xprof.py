"""Measured per-iteration device walls from an xprof trace.

The reference records `time_per_iteration[]` with a running stopwatch split
around each host-driven iteration (/root/reference/solver.hpp:166-171,
printed per sample in postprocessing.hpp:8-30).  The fused TPU harness is
ONE device dispatch, so host walls can't see iteration boundaries — and
host-mode walls here are dominated by the ~1 ms remote-dispatch latency.

This module recovers genuinely measured per-iteration times by running the
compiled fused loop once under `jax.profiler.trace` and segmenting the
device op timeline on its periodic structure: every op inside the
`lax.while_loop` body executes exactly once per iteration, so successive
start times of any body op mark iteration boundaries.  The marker op is
chosen automatically (the most frequent op name on the device's "XLA Ops"
line).  Tracing adds overhead to the traced run (it is NOT used for the
headline ms/iter numbers — those come from untraced walls); the per-
iteration SHAPE (e.g. GMRES's within-cycle growth) is what this recovers.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
from typing import Optional

import numpy as np


def _load_trace_events(logdir: str):
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        return None
    with gzip.open(files[-1], "rt") as f:
        d = json.load(f)
    return d.get("traceEvents", [])


def _device_op_events(events):
    """Complete events on the accelerator's 'XLA Ops' thread."""
    dev_pids = set()
    op_tids = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if (e.get("name") == "process_name"
                and "device:" in e.get("args", {}).get("name", "")
                and "CPU" not in e["args"]["name"]):
            dev_pids.add(e["pid"])
        if (e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"):
            op_tids[e["pid"]] = e["tid"]
    for pid in (dev_pids or op_tids.keys()):
        tid = op_tids.get(pid)
        if tid is None:
            continue
        ops = [e for e in events
               if e.get("ph") == "X" and e.get("pid") == pid
               and e.get("tid") == tid]
        if ops:
            ops.sort(key=lambda e: e["ts"])
            return ops
    return []


def iteration_times_from_trace(logdir: str,
                               n_iters: Optional[int] = None):
    """Per-iteration device walls (seconds) parsed from a trace directory,
    or None when the trace has no usable device op timeline.

    When `n_iters` is given, only marker ops occurring exactly that many
    times qualify (guards against fusions duplicated by unrolling)."""
    events = _load_trace_events(logdir)
    if not events:
        return None
    ops = _device_op_events(events)
    if not ops:
        return None
    counts = collections.Counter(e["name"] for e in ops)
    if n_iters is not None:
        cands = [n for n, c in counts.items() if c == n_iters]
    else:
        top = max(counts.values())
        if top < 3:
            return None
        cands = [n for n, c in counts.items() if c == top]
    if not cands:
        return None
    # earliest-starting qualifying op = the body's first marker
    first_start = {n: None for n in cands}
    for e in ops:
        if e["name"] in first_start and first_start[e["name"]] is None:
            first_start[e["name"]] = e["ts"]
    marker = min(cands, key=lambda n: first_start[n])
    starts = np.array([e["ts"] for e in ops if e["name"] == marker])
    if starts.size < 2:
        return None
    # iteration k = [start_k, start_{k+1}); the last iteration extends to
    # the end of the final event in the window
    end = max(e["ts"] + e.get("dur", 0) for e in ops)
    bounds = np.append(starts, end)
    return np.diff(bounds) * 1e-6          # trace timestamps are in µs


def measure_iteration_times(method, n_iters: Optional[int] = None,
                            logdir: Optional[str] = None):
    """Re-run a method's compiled fused loop under a profiler trace and
    return measured per-iteration device walls (seconds), or None.

    The method must have solved once in fused mode (so the runner and its
    executable exist); the traced run reuses them — no recompilation.
    """
    import jax
    runner = getattr(method, "_fused_runner", None)
    if runner is None:
        return None
    state0 = jax.block_until_ready(runner._init_jit())
    ctx = (tempfile.TemporaryDirectory() if logdir is None else None)
    d = ctx.name if ctx is not None else logdir
    try:
        with jax.profiler.trace(d):
            jax.block_until_ready(runner._run_jit(state0))
        times = iteration_times_from_trace(d, n_iters=n_iters)
    finally:
        if ctx is not None:
            ctx.cleanup()
    return times


def attach_iteration_times(result, method):
    """Fill result.time_per_iteration with measured device walls (the
    reference's genuinely-measured series, solver.hpp:166-171); returns
    True on success.  Only meaningful for res_check_len == 1 fused runs
    (one history sample per iteration)."""
    if result.res_check_len != 1:
        # the history has one row per res_check_len iterations — the
        # per-iteration slot mapping below would misattribute the walls
        return False
    times = measure_iteration_times(method, n_iters=result.iter_count)
    if times is None or times.size == 0:
        return False
    # history layout: [initial norm, one entry per iteration with an extra
    # entry after each completed restart cycle, final explicit]; map the
    # measured walls onto the per-ITERATION slots (restart rows stay 0)
    tpi = np.zeros_like(result.time_per_iteration)
    idx = np.arange(1, times.size + 1)
    slots = idx.copy()
    if result.gmres_restart_count > 0 and result.restart_length > 0:
        slots = idx + (idx - 1) // result.restart_length
    keep = slots < tpi.size - 1
    tpi[slots[keep]] = times[keep]
    result.time_per_iteration = tpi
    result.uniform_iteration_times = False
    return True


# ---------------------------------------------------------------------------
# Per-phase device-time attribution (reference print_timers analog for the
# fused harness, /root/reference/utilities/utilities.hpp:154-324)
# ---------------------------------------------------------------------------

#: op-name → phase buckets.  Pallas kernels carry explicit names
#: (pl.pallas_call(name=...)); XLA's own fusions/reshapes land in the
#: vector/glue buckets by their HLO op kind.
PHASE_BUCKETS = (
    ("spmv", ("spmv_",)),
    ("sptrsv", ("sptrsv_",)),
    ("orthog", ("orthog_",)),
    ("layout_glue", ("reshape", "copy", "transpose", "bitcast", "pad",
                     "slice", "concatenate", "broadcast")),
    ("blas1", ("fusion", "multiply", "add", "subtract", "divide", "dot",
               "reduce", "rsqrt", "sqrt", "select", "compare", "maximum",
               "convert", "iota", "scatter", "dynamic")),
)


def bucket_of(op_name: str) -> str:
    for bucket, prefixes in PHASE_BUCKETS:
        for p in prefixes:
            if op_name.startswith(p):
                return bucket
    return "other"


def phase_table_from_trace(logdir: str):
    """Aggregate device op walls by phase bucket.

    Returns (table, meta): table maps bucket → seconds (device wall summed
    over ops), meta has 'device_wall' (first-op start → last-op end) and
    'n_ops'.  None when the trace has no usable device timeline."""
    events = _load_trace_events(logdir)
    if not events:
        return None
    ops = _device_op_events(events)
    if not ops:
        return None
    table = collections.defaultdict(float)
    per_op = collections.defaultdict(float)
    t0 = min(e["ts"] for e in ops)
    t1 = max(e["ts"] + e.get("dur", 0) for e in ops)
    for e in ops:
        name = e["name"]
        if name.startswith("while"):        # the loop wrapper op overlaps
            continue                        # every body op — skip it
        d = e.get("dur", 0) * 1e-6
        table[bucket_of(name)] += d
        per_op[name] += d
    meta = {"device_wall": (t1 - t0) * 1e-6, "n_ops": len(ops),
            "per_op": dict(sorted(per_op.items(), key=lambda kv: -kv[1]))}
    return dict(table), meta


def measure_phase_table(method, logdir: Optional[str] = None):
    """Traced re-run of a method's compiled fused loop → per-phase device
    seconds (see phase_table_from_trace); None off-TPU / no runner."""
    import jax
    runner = getattr(method, "_fused_runner", None)
    if runner is None:
        return None
    state0 = jax.block_until_ready(runner._init_jit())
    ctx = (tempfile.TemporaryDirectory() if logdir is None else None)
    d = ctx.name if ctx is not None else logdir
    try:
        with jax.profiler.trace(d):
            jax.block_until_ready(runner._run_jit(state0))
        out = phase_table_from_trace(d)
    finally:
        if ctx is not None:
            ctx.cleanup()
    return out


def print_phase_table(table, meta, n_iters=None, out=None) -> None:
    """The reference's hierarchical timer table, filled from DEVICE walls
    (utilities.hpp:154-324 prints host stopwatch splits; the fused harness
    is one dispatch, so attribution comes from the trace)."""
    import sys
    out = sys.stderr if out is None else out
    width = 44
    dev = meta["device_wall"]
    rows = [(0, "solve (device wall)", dev)]
    order = ("spmv", "sptrsv", "orthog", "blas1", "layout_glue", "other")
    acct = 0.0
    for k in order:
        if k in table:
            rows.append((1, k, table[k]))
            acct += table[k]
    lines = ["+" + "-" * (width + 26) + "+"]
    for depth, name, v in rows:
        label = "| " * depth + name
        per_it = f" ({v / n_iters * 1e3:8.4f} ms/iter)" if n_iters else ""
        lines.append(f"| {label:<{width}} {v:10.6f} s{per_it:>20} |")
    lines.append("+" + "-" * (width + 26) + "+")
    lines.append(f"| accounted: {acct:.6f} s of {dev:.6f} s device wall"
                 f" ({100 * acct / max(dev, 1e-12):.0f}%; ops overlap)")
    print("\n".join(lines), file=out)
