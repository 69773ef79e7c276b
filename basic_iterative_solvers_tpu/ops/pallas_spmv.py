"""Pallas TPU kernel for DIA SpMV.

The XLA DIA path (ops/spmv.py) re-reads the x vector from HBM once per
diagonal (n_diags streams of the same data).  This kernel tiles rows, DMAs
the x window a row tile needs into VMEM **once**, and accumulates all
diagonals against that window — so HBM traffic drops to
    nnz_stored * itemsize  (diagonal data, auto-pipelined by Pallas)
  + n * itemsize           (x, read once)
  + n * itemsize           (y, written once),
which is the speed-of-light for this operation.  Replaces native_spmv
(/root/reference/kernels.hpp:22-42) as the hot kernel.

Constraints: offsets are static; row count is padded to a multiple of the
tile at build time (device_matrix.csr_to_dia), so the grid divides evenly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows per grid step; csr_to_dia pads the row dimension to a multiple.
ROW_TILE = 8192

#: largest x-window (elements) we allow in VMEM before falling back to XLA.
MAX_WINDOW = 2_000_000


def _dia_kernel(offsets, hneg, window_len, data_ref, xp_ref, y_ref,
                window, sem):
    i = pl.program_id(0)
    # Pull this tile's x window (rows [i*R, i*R + R + H)) into VMEM once.
    copy = pltpu.make_async_copy(
        xp_ref.at[pl.ds(i * ROW_TILE, window_len)], window, sem)
    copy.start()
    copy.wait()
    acc = jnp.zeros((ROW_TILE,), dtype=y_ref.dtype)
    for d, off in enumerate(offsets):
        start = off + hneg  # static per-diagonal shift inside the window
        acc = acc + data_ref[d, :] * window[pl.ds(start, ROW_TILE)]
    y_ref[:] = acc


def dia_spmv_pallas(A, x: jax.Array) -> jax.Array:
    """y = A @ x for DeviceDIA A. Falls back to the XLA path off-TPU or when
    the x window would not fit VMEM."""
    from ..device_matrix import DeviceDIA
    assert isinstance(A, DeviceDIA)
    n = A.n_rows
    npad = A.data.shape[1]
    offsets = A.offsets
    hneg = max(0, -min(offsets))
    hpos = max(0, max(offsets))
    # Mosaic requires 1-D HBM DMA slices to be 1024-aligned in offset and
    # size; tile starts (i*ROW_TILE) already are, so round the window up.
    window_len = -(-(ROW_TILE + hneg + hpos) // 1024) * 1024
    on_tpu = jax.default_backend() == "tpu"
    if (npad % ROW_TILE != 0) or window_len > MAX_WINDOW or not on_tpu:
        from .spmv import spmv_dia
        return spmv_dia(A, x, use_pallas=False)

    # xp[hneg + i] = x[i]; window for tile i is xp[i*R : i*R + window_len],
    # so xp must extend to (npad - R) + window_len.
    xp = jnp.zeros(npad - ROW_TILE + window_len,
                   dtype=x.dtype).at[hneg:hneg + n].set(x)
    grid = (npad // ROW_TILE,)
    k = len(offsets)

    kernel = lambda data_ref, xp_ref, y_ref, window, sem: _dia_kernel(  # noqa: E731
        offsets, hneg, window_len, data_ref, xp_ref, y_ref, window, sem)

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # note: jnp.int32(0), not 0 — under jax_enable_x64 a literal 0
            # traces as i64 and Mosaic rejects the mixed-width index map.
            pl.BlockSpec((k, ROW_TILE), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # xp stays in HBM
        ],
        out_specs=pl.BlockSpec((ROW_TILE,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((window_len,), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * k * npad,
            bytes_accessed=(k * npad + 2 * n) * x.dtype.itemsize,
            transcendentals=0),
    )(A.data, xp)
    return y[:n]
