"""Pallas TPU kernel for DIA SpMV.

The XLA DIA path (ops/spmv.py) re-reads the x vector from HBM once per
diagonal and pays a full-array lane relayout per shifted slice.  This kernel
tiles rows and reads, per tile, the two consecutive x blocks that cover the
tile's halo window — both auto-pipelined (double-buffered) by Pallas along
with the diagonal data, so there are no manual-DMA stalls.  All diagonal
shifts then happen on the VMEM-resident window with static offsets.

HBM traffic:  nnz_stored * itemsize   (diagonal data)
            + 2n * itemsize           (x read twice: lo + hi block streams)
            + n * itemsize            (y written once)
— within 2x of speed-of-light for this op, with no gathers and no HBM
relayouts.  Replaces native_spmv (/root/reference/kernels.hpp:22-42) as the
hot kernel.

The row tile R is chosen at build time (device_matrix.csr_to_dia) to be
≥ the halo width H = hneg + hpos, so the window of tile i is always inside
blocks i and i+1 of the padded x.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_env

#: minimum rows per grid step (multiple of the 8x128 f32 tile)
MIN_ROW_TILE = 8192

#: VMEM budget for the double-buffered operand blocks (bytes).  v5e has
#: 128 MiB of VMEM per core; Mosaic's default scoped limit is 16 MiB, so the
#: kernel requests a higher ceiling (vmem_limit_bytes below) and this budget
#: keeps block sizing safely under it.
VMEM_BUDGET = 48 * 1024 * 1024
_VMEM_LIMIT = 96 * 1024 * 1024


_LANE = 128  # vreg lane count; slices at multiples of this are relayout-free


def _dia_kernel(offsets, hneg, R, data_ref, xlo_ref, xhi_ref, y_ref):
    """Shifted-slice accumulation with lane-aligned reads.

    A slice at an arbitrary offset costs a cross-lane rotate per diagonal —
    that, not HBM, bounds the naive kernel.  Diagonals are therefore grouped
    by their offset's residue mod the lane width: one rotate of the window
    per distinct residue (stencil matrices have very few — e.g. HPCG on a
    128-multiple grid has 3), then every slice in the group starts at a
    lane-aligned position.
    """
    window = jnp.concatenate([xlo_ref[:], xhi_ref[:]])   # (2R,) in VMEM
    groups = {}
    for d, off in enumerate(offsets):
        start = off + hneg  # static in [0, R + H) ⊆ [0, 2R)
        r = start % _LANE
        groups.setdefault(r, []).append((d, start - r))
    acc = jnp.zeros((R,), dtype=y_ref.dtype)
    for r, items in sorted(groups.items()):
        # Wr[j] = window[j + r]: one un-aligned shift per residue group;
        # every slice below then starts at a lane multiple.  (base + R never
        # reads past 2R - r: base ≤ hneg + hpos - r ≤ R - r.)
        Wr = jax.lax.slice(window, (r,), (2 * R,)) if r else window
        for d, base in items:
            acc = acc + data_ref[d, :] * jax.lax.slice(Wr, (base,),
                                                       (base + R,))
    y_ref[:] = acc


def dia_pallas_core(offsets, hneg: int, R: int, data: jax.Array,
                    xp: jax.Array) -> jax.Array:
    """The tiled kernel launch on a pre-padded window vector.

    `data` is (k, npad) with npad a multiple of the row tile R; `xp` is the
    halo-padded x with xp[hneg + i] = x[i], sized (npad/R + 1)·R so tile
    i's window [i·R, i·R + R + H) is covered by blocks i and i+1.  Shared
    by the single-chip path and the shard-local mesh path
    (parallel/mesh_ops.py), which feeds ppermute-exchanged halo entries in
    xp's edge regions instead of zeros.
    """
    k = data.shape[0]
    npad = data.shape[1]
    grid_n = npad // R
    kernel = lambda data_ref, xlo, xhi, y_ref: _dia_kernel(  # noqa: E731
        offsets, hneg, R, data_ref, xlo, xhi, y_ref)

    # note: jnp.int32 literals — under jax_enable_x64 a python 0 traces as
    # i64 and Mosaic rejects mixed-width index maps.
    return pl.pallas_call(
        kernel,
        name="spmv_dia",
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((k, R), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((R,), lambda i: (i + jnp.int32(1),),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * npad,
            bytes_accessed=(k * npad * data.dtype.itemsize
                            + 3 * npad * xp.dtype.itemsize),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=pallas_env.INTERPRET,
    )(data, xp, xp)


def dia_pallas_eligible(A, itemsize: int) -> bool:
    """Static structure/VMEM checks shared with the mesh path."""
    npad = A.data.shape[1]
    offsets = A.offsets
    R = A.row_tile
    k = len(offsets)
    hneg = max(0, -min(offsets))
    hpos = max(0, max(offsets))
    d_itemsize = A.data.dtype.itemsize
    # data + xlo + xhi (+y), all double-buffered by the Pallas pipeline
    vmem_need = 2 * (k * R * d_itemsize + 3 * R * itemsize)
    return ((npad % R == 0) and (hneg + hpos) <= R
            and vmem_need <= VMEM_BUDGET and d_itemsize <= itemsize)


def dia_spmv_pallas(A, x: jax.Array) -> jax.Array:
    """y = A @ x for DeviceDIA A. Falls back to the XLA path off-TPU or when
    the operand blocks would not fit VMEM."""
    from ..device_matrix import DeviceDIA
    assert isinstance(A, DeviceDIA)
    n = A.n_rows
    npad = A.data.shape[1]
    offsets = A.offsets
    R = A.row_tile
    hneg = max(0, -min(offsets))
    itemsize = x.dtype.itemsize
    on_tpu = pallas_env.pallas_capable()
    # Mosaic has no f64 register tiling — 8-byte dtypes take the XLA path.
    # Narrower matrix data (bf16 mode) is fine: products promote to x.dtype.
    if (not on_tpu or itemsize > 4
            or not dia_pallas_eligible(A, itemsize)):
        from .spmv import spmv_dia
        return spmv_dia(A, x, use_pallas=False)

    grid_n = npad // R
    xp = jnp.zeros((grid_n + 1) * R, dtype=x.dtype).at[hneg:hneg + n].set(x)
    return dia_pallas_core(offsets, hneg, R, A.data, xp)[:n]
