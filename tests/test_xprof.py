"""Per-iteration device walls from xprof traces (utils/xprof.py).

The TPU behavior (bucket-step GMRES within-cycle growth, restart spike)
is verified on hardware; CI pins the trace parsing and the history-slot
mapping on synthetic traces, plus the graceful no-device fallback on CPU.
"""
import gzip
import json
import os

import numpy as np

from basic_iterative_solvers_tpu.utils import xprof


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _meta(pid, tid=None, name=None):
    if tid is None:
        return {"ph": "M", "pid": pid, "name": "process_name",
                "args": {"name": name}}
    return {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
            "args": {"name": name}}


def _synthetic_events(starts, dur=50.0):
    ev = [_meta(3, name="/device:TPU:0"),
          _meta(3, 7, "XLA Ops"),
          _meta(9, name="/host:CPU")]
    for t in starts:
        # one marker op + one secondary op per iteration
        ev.append({"ph": "X", "pid": 3, "tid": 7, "name": "body_fusion",
                   "ts": t, "dur": dur})
        ev.append({"ph": "X", "pid": 3, "tid": 7, "name": "reduce_fusion",
                   "ts": t + dur, "dur": 20.0})
    # a once-only op must never be picked as the marker
    ev.append({"ph": "X", "pid": 3, "tid": 7, "name": "epilogue",
               "ts": starts[-1] + 500.0, "dur": 10.0})
    return ev


def test_iteration_times_from_synthetic_trace(tmp_path):
    starts = [1000.0, 1100.0, 1250.0, 1500.0]     # growing iterations
    d = _write_trace(tmp_path, _synthetic_events(starts))
    times = xprof.iteration_times_from_trace(d)
    assert times is not None and times.size == 4
    # gaps between marker starts, in seconds; last iteration runs to the
    # final event end (epilogue at 2000+10)
    np.testing.assert_allclose(times[:3] * 1e6, [100.0, 150.0, 250.0])
    np.testing.assert_allclose(times[3] * 1e6, 2010.0 - 1500.0)


def test_iteration_times_n_iters_filter(tmp_path):
    starts = [0.0, 100.0, 200.0]
    d = _write_trace(tmp_path, _synthetic_events(starts))
    assert xprof.iteration_times_from_trace(d, n_iters=3) is not None
    assert xprof.iteration_times_from_trace(d, n_iters=7) is None


def test_attach_slot_mapping_with_restarts(monkeypatch):
    """GMRES histories interleave restart rows; measured walls must land
    on the per-iteration slots only."""
    from basic_iterative_solvers_tpu.solvers.base import SolveResult
    times = np.array([1e-3, 2e-3, 3e-3, 4e-3, 5e-3])
    monkeypatch.setattr(xprof, "measure_iteration_times",
                        lambda method, n_iters=None: times)
    # 5 iterations with restart_length=2 -> history rows:
    # [r0, it1, it2, RESTART, it3, it4, RESTART, it5, final]
    res = SolveResult(
        x_star=np.zeros(3), iter_count=5, converged=True,
        stopping_criteria=0.0, residual_norms=np.zeros(9),
        time_per_iteration=np.zeros(9), final_residual_norm=0.0,
        gmres_restart_count=2, restart_length=2)
    assert xprof.attach_iteration_times(res, method=object())
    tpi = res.time_per_iteration
    np.testing.assert_allclose(tpi[[1, 2, 4, 5, 7]], times)
    assert tpi[3] == 0.0 and tpi[6] == 0.0     # restart rows untouched
    assert not res.uniform_iteration_times


def test_graceful_without_device_trace(tmp_path):
    d = _write_trace(tmp_path, [_meta(9, name="/host:CPU")])
    assert xprof.iteration_times_from_trace(d) is None
    assert xprof.iteration_times_from_trace(str(tmp_path / "nope")) is None


def test_cpu_attach_returns_false():
    """On backends whose traces carry no device op line, the API degrades
    to False (the host harness's walls remain in place)."""
    import basic_iterative_solvers_tpu as bis
    from basic_iterative_solvers_tpu.solvers import make_method
    A = bis.generators.from_source("fdm:8")
    cfg = bis.SolverConfig(method=bis.SolverType.CONJUGATE_GRADIENT,
                           dtype=np.float64, harness="fused",
                           tolerance=0.0, max_iters=5)
    setup = bis.preprocessing(A, cfg)
    method = make_method(setup)
    res = bis.solve(setup, method=method)
    assert xprof.attach_iteration_times(res, method) in (True, False)
