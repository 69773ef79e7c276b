"""Windowed lane-ELL: the general-sparsity Pallas SpMV format.

The reference's core object is arbitrary CSR, and `native_spmv`
(/root/reference/kernels.hpp:22-42) walks it row by row.  On TPU an
arbitrary gather `x[cols]` does not map onto the hardware: Mosaic supports
dynamic gathers only along the LANE axis (within each 128-element vector
register row, `jnp.take_along_axis(..., axis=1)`), so the format must be
designed around that primitive.

Layout (built once at setup from CSR):

* x lives as a 2-D planar array ``x2 = pad(x).reshape(R, 128)``; matrix row
  i maps to slot (i // 128, i % 128).
* Every nonzero A[i, j] is stored at one of K ELL slots of row i as
  ``val`` + a packed index ``(rowoff + S) * 128 + lane`` where
  ``rowoff = j//128 - i//128`` and ``lane = j % 128``.
* S = max |rowoff| over the matrix: the kernel's x window per output tile is
  the stencil-style clamped 3-block window (rows [t-1, t+2)·TB of x2), so
  eligibility requires S ≤ TB (bounded column span — what RCM/BFS reordering
  (permute.py) produces for general matrices; wide scattered patterns fall
  back to the XLA-gather DeviceELL).

Kernel: for each static shift s ∈ [-S, S], the window rows aligned at s are
a STATIC slice and the in-register lane gather fetches
``g[r, l] = rows_s[r, lane[k, r, l]]``; contributions are masked by
``rowoff == s``.  Per output tile that is (2S+1)·K lane gathers — pure VPU
work on VMEM-resident data; HBM traffic is 8 bytes per ELL slot
(f32 val + packed int32 index) plus the x window and y, i.e. CSR-parity
bytes with none of CSR's serialization.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..matrix import MatrixCSR
from . import pallas_env
from .pallas_spmv import _VMEM_LIMIT

#: lanes per x2 row (the TPU vreg minor dimension)
LANES = 128

#: default output tile (x2 rows per kernel step); the x window is 3 tiles
_TB = 256


@partial(jax.tree_util.register_dataclass,
         data_fields=["vals", "idx"],
         meta_fields=["n_rows", "n_cols", "K", "S", "R", "TB",
                      "slot_ranges"])
@dataclasses.dataclass
class DeviceLaneELL:
    """Lane-gather ELL storage (see module docstring).

    vals[k, r, l] multiplies x2[r + rowoff, lane] where the packed
    idx[k, r, l] = (rowoff + S)·128 + lane; padding slots have val 0 and
    idx = S·128 (rowoff 0, lane 0 — always in range)."""

    vals: jax.Array               # (K, R, 128) dtype
    idx: jax.Array                # (K, R, 128) int32, packed (rowoff, lane)
    n_rows: int
    n_cols: int
    K: int
    S: int
    R: int
    TB: int
    #: per-slot (min, max) rowoff over all rows — rows are rowoff-sorted at
    #: build time, so each slot's shift range is a small static window and
    #: the kernel gathers only those shifts (instead of all 2S+1)
    slot_ranges: Tuple[Tuple[int, int], ...] = ()

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nnz_stored(self) -> int:
        return self.vals.size


def lane_ell_span(A: MatrixCSR) -> int:
    """Max |j//128 − i//128| over nonzeros — the kernel's shift radius S."""
    if A.nnz == 0:
        return 0
    from .. import _native
    stats = _native.csr_pattern_stats(A, cap=1)   # only span needed
    if stats is not None:
        return stats[1]
    rows = np.repeat(np.arange(A.n_rows, dtype=np.int64), A.row_nnz())
    return int(np.abs(A.col.astype(np.int64) // LANES
                      - rows // LANES).max())


def csr_to_lane_ell(A: MatrixCSR, dtype=np.float32,
                    tile_rows: int = _TB) -> DeviceLaneELL:
    if A.n_rows != A.n_cols:
        raise ValueError("lane-ELL requires a square matrix")
    n = A.n_rows
    R = max(1, -(-n // LANES))
    S = lane_ell_span(A)
    # window constraint: S ≤ TB (3-block window); small matrices shrink the
    # tile to R so grid padding never dominates
    TB = max(8 * -(-S // 8), min(tile_rows, 8 * -(-R // 8)), 8)
    R_pad = -(-R // TB) * TB
    row_nnz = A.row_nnz()
    K = max(1, int(row_nnz.max()) if n else 1)

    # C fast path: CSR columns ascend within each row, so the (rowoff,
    # lane)-sorted slot order IS the storage order — two sequential C
    # sweeps replace the global nnz lexsort + fancy scatters + per-slot
    # pad-fix passes below (~20x on the throttled host at 90M nnz)
    from .. import _native
    built = _native.lane_ell_build(A, K, S, R_pad, dtype)
    if built is not None:
        vals_n, idx_n, ranges_n = built
        return DeviceLaneELL(vals=jnp.asarray(vals_n),
                             idx=jnp.asarray(idx_n),
                             n_rows=n, n_cols=n, K=K, S=S, R=R_pad, TB=TB,
                             slot_ranges=ranges_n)

    rows = np.repeat(np.arange(n, dtype=np.int64), row_nnz)
    cols = A.col.astype(np.int64)
    rowoff = cols // LANES - rows // LANES
    lane = cols % LANES
    # rowoff-sort each row's entries so slot k sees a narrow static shift
    # window across the whole matrix (kernel loops only those shifts)
    order = np.lexsort((lane, rowoff, rows))
    rows, rowoff, lane = rows[order], rowoff[order], lane[order]
    val_sorted = A.val[order]
    slot = np.arange(A.nnz, dtype=np.int64) - A.row_ptr[:-1][rows]

    vals = np.zeros((K, R_pad, LANES), dtype=dtype)
    idx = np.zeros((K, R_pad, LANES), dtype=np.int32)
    r2, l2 = rows // LANES, rows % LANES
    vals[slot, r2, l2] = val_sorted.astype(dtype)
    idx[slot, r2, l2] = ((rowoff + S) * LANES + lane).astype(np.int32)
    # per-slot static shift ranges; pad slots reuse each slot's own lo so
    # they never widen the range (their val is 0, gather target irrelevant,
    # but the packed rowoff must lie inside the slot's range)
    ranges = []
    for k in range(K):
        sel = slot == k
        if np.any(sel):
            lo = int(rowoff[sel].min())
            hi = int(rowoff[sel].max())
        else:
            lo = hi = 0
        ranges.append((lo, hi))
        pad_mask = vals[k] == 0
        # all-pad positions get packed index (lo + S)*LANES (lane 0)
        idx[k] = np.where(pad_mask & (idx[k] == 0),
                          np.int32((lo + S) * LANES), idx[k])
    return DeviceLaneELL(vals=jnp.asarray(vals), idx=jnp.asarray(idx),
                         n_rows=n, n_cols=n, K=K, S=S, R=R_pad, TB=TB,
                         slot_ranges=tuple(ranges))


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------

def _pad_x2(M: DeviceLaneELL, x: jax.Array) -> jax.Array:
    npad = M.R * LANES
    return jnp.zeros(npad, dtype=x.dtype).at[:M.n_rows].set(x).reshape(
        M.R, LANES)


def lane_ell_spmv_xla(M: DeviceLaneELL, x: jax.Array) -> jax.Array:
    """XLA fallback (CPU tests / ineligible backends): flat gather."""
    x2 = _pad_x2(M, x)
    xf = x2.reshape(-1)
    r = jax.lax.broadcasted_iota(jnp.int32, (M.R, LANES), 0)
    y = jnp.zeros((M.R, LANES), dtype=x.dtype)
    for k in range(M.K):
        rowoff = M.idx[k] // LANES - M.S
        lane = M.idx[k] % LANES
        flat = (r + rowoff) * LANES + lane
        flat = jnp.clip(flat, 0, M.R * LANES - 1)  # pad slots stay in range
        y = y + M.vals[k] * jnp.take(xf, flat.reshape(-1),
                                     axis=0).reshape(M.R, LANES)
    return y.reshape(-1)[:M.n_rows]


def _lane_ell_kernel_call(M: DeviceLaneELL, vals: jax.Array, idx: jax.Array,
                          xsrc: jax.Array, win_maps, grid_n: int) -> jax.Array:
    """Shared pallas_call for the lane-gather kernel.

    `vals`/`idx` are (K, grid_n·TB, 128) slot planes; `xsrc` is the window
    source array and `win_maps` three (TB, 128)-block index maps into it
    selecting the 3-tile x window of each output tile (clamped self-windows
    on the single-device path, halo-padded windows on the mesh path).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TB, S, K = M.TB, M.S, M.K
    R_out = grid_n * TB

    def kernel(vals_ref, idx_ref, w0, w1, w2, y_ref):
        from jax._src.config import enable_x64 as _x64_ctx
        window = jnp.concatenate([w0[:], w1[:], w2[:]], axis=0)  # (3TB, 128)
        acc = jnp.zeros((TB, LANES), dtype=y_ref.dtype)
        ranges = M.slot_ranges or ((-S, S),) * K
        for k in range(K):
            pk = idx_ref[k]
            lk = jax.lax.rem(pk, jnp.int32(LANES))
            rk = jax.lax.div(pk, jnp.int32(LANES)) - jnp.int32(S)
            vk = vals_ref[k]
            lo, hi = ranges[k]
            for s in range(lo, hi + 1):
                rows_s = jax.lax.slice(window, (TB + s, 0),
                                       (2 * TB + s, LANES))
                # x64 off for the gather: take_along_axis canonicalizes its
                # indices to int64 under the package-global x64 mode, and
                # Mosaic has no 64-bit types — the int32 indices must stay
                # int32
                with _x64_ctx(False):
                    g = jnp.take_along_axis(rows_s, lk, axis=1)
                contrib = vk * g
                if lo != hi:   # single-shift slots need no mask at all
                    contrib = jnp.where(rk == jnp.int32(s), contrib, 0.0)
                acc = acc + contrib
        y_ref[:] = acc

    in_specs = [
        pl.BlockSpec((K, TB, LANES), lambda i: (jnp.int32(0), i, jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, TB, LANES), lambda i: (jnp.int32(0), i, jnp.int32(0)),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((TB, LANES), m, memory_space=pltpu.VMEM)
         for m in win_maps]
    itemsize = xsrc.dtype.itemsize
    return pl.pallas_call(
        kernel, grid=(grid_n,),
        name="spmv_lane_ell",
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, LANES), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_out, LANES), xsrc.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * R_out * LANES,
            bytes_accessed=(K * R_out * LANES * (itemsize + 4)
                            + 2 * R_out * LANES * itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=pallas_env.INTERPRET,
    )(vals, idx, xsrc, xsrc, xsrc)


def lane_ell_spmv_pallas(M: DeviceLaneELL, x: jax.Array) -> jax.Array:
    """Pallas kernel: clamped 3-block x window + per-shift lane gathers."""
    TB, R = M.TB, M.R
    x2 = _pad_x2(M, x)
    grid_n = R // TB
    last = grid_n - 1
    maps = (lambda i: (jnp.maximum(i - 1, 0), jnp.int32(0)),
            lambda i: (i, jnp.int32(0)),
            lambda i: (jnp.minimum(i + 1, jnp.int32(last)), jnp.int32(0)))
    y2 = _lane_ell_kernel_call(M, M.vals, M.idx, x2, maps, grid_n)
    return y2.reshape(-1)[:M.n_rows]


def lane_ell_spmv_halo(M: DeviceLaneELL, vals: jax.Array, idx: jax.Array,
                       x2pad: jax.Array, grid_n: int) -> jax.Array:
    """Shard-local SpMV over a halo-padded x window (parallel/mesh_ops.py).

    `x2pad` is (grid_n·TB + 2·TB, 128): one neighbor tile each side of the
    shard's local rows (ppermute'd; zeros at the global edges — those rows
    feed only zero-valued pad slots, since rowoff never crosses the matrix
    boundary).  `vals`/`idx` are the shard's (K, grid_n·TB, 128) planes.
    """
    maps = (lambda i: (i, jnp.int32(0)),
            lambda i: (i + jnp.int32(1), jnp.int32(0)),
            lambda i: (i + jnp.int32(2), jnp.int32(0)))
    return _lane_ell_kernel_call(M, vals, idx, x2pad, maps, grid_n)


def lane_ell_extend_rows(M: DeviceLaneELL, R_new: int) -> DeviceLaneELL:
    """Pad the slot planes with inert rows (val 0, per-slot in-range index)
    so R divides a mesh's per-shard tile count.  O(pad) one-time device
    work; y rows beyond the original R are exact zeros."""
    if R_new == M.R:
        return M
    if R_new < M.R or R_new % M.TB:
        raise ValueError(f"bad extension {M.R} -> {R_new} (TB={M.TB})")
    K, pad = M.K, R_new - M.R
    vals = jnp.concatenate(
        [M.vals, jnp.zeros((K, pad, LANES), M.vals.dtype)], axis=1)
    ranges = M.slot_ranges or ((0, 0),) * K
    los = jnp.asarray([(lo + M.S) * LANES for lo, _ in ranges],
                      jnp.int32).reshape(K, 1, 1)
    idx = jnp.concatenate(
        [M.idx, jnp.broadcast_to(los, (K, pad, LANES))], axis=1)
    return dataclasses.replace(M, vals=vals, idx=idx, R=R_new)


def lane_ell_spmv(M: DeviceLaneELL, x: jax.Array,
                  use_pallas: bool = True) -> jax.Array:
    """Clamped-window eligibility: the 3-block window covers shifts |s| ≤ TB;
    edge clamping is safe because rows whose sources would fall outside
    [0, R) do not exist (rowoff never crosses the matrix boundary)."""
    if use_pallas and pallas_env.pallas_capable() and x.dtype.itemsize <= 4:
        return lane_ell_spmv_pallas(M, x)
    return lane_ell_spmv_xla(M, x)
