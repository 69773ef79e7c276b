"""Mesh-wrapped device operators: Pallas kernels INSIDE shard_map.

GSPMD (`shard_setup` mode="gspmd") annotates shardings and lets XLA
partition the jnp graphs — but Pallas calls are not auto-partitionable, so
that mode abandons the kernel layer.  This module is the performance-real
multi-chip path: each operator is wrapped with its mesh, and its SpMV /
fused-GS apply runs as

    shard_map( ppermute halo slabs  →  the SAME Pallas kernel per shard )

— explicit neighbor exchange over ICI (the halo-overlap design SURVEY.md
§2.6/§5 calls for; the reference's row-parallel native_spmv analog,
/root/reference/kernels.hpp:22-42), with dots reduced by `lax.psum`.

Layout contracts:
* Stencil (planar-resident): the planar row count is padded to a multiple
  of TR·n_devices (DeviceStencil.shards), so each shard owns whole kernel
  tiles; the kernel receives the shard's global row offset (output masks /
  color ids stay globally correct) and (TR, 128) neighbor halo blocks that
  replace the clamped edge windows (stencil_op._resident_kernel).
* DIA: the padded row count is a multiple of row_tile·n_devices; each
  shard rebuilds its local halo-padded x window with the hneg/hpos
  boundary entries ppermute'd from its neighbors and runs the tiled kernel
  (ops/pallas_spmv.dia_pallas_core).

Wrappers are built by `parallel.sharded.shard_setup(mode="shard_map")`
only when the kernels can actually execute (real TPU with ≤4-byte solve
dtype, or Pallas interpret mode — the CPU CI tier).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..device_matrix import DeviceDIA
from ..ops import pallas_env
from ..stencil_op import (DeviceStencil, _planar_geometry, _planar_ok,
                          stencil_gs_color_step, stencil_spmv_resident)


def mesh_pallas_capable(dtype) -> bool:
    """Can the per-shard kernels execute for this solve dtype?"""
    if pallas_env.INTERPRET:
        return True   # the interpreter runs any dtype (CPU CI tier)
    return (jax.default_backend() == "tpu"
            and np.dtype(dtype).itemsize <= 4)


@partial(jax.tree_util.register_dataclass,
         data_fields=["inner"], meta_fields=["mesh", "axis"])
@dataclasses.dataclass
class MeshStencil:
    """A planar-resident DeviceStencil bound to a 1-D row mesh.

    inner.shards == mesh size along `axis`, so the planar layout's padded
    rows divide into whole TR tiles per shard.  SpMV and the fused GS
    color step run shard-locally (kernels above), everything elementwise
    on its planar vectors partitions via GSPMD.
    """

    inner: DeviceStencil
    mesh: jax.sharding.Mesh
    axis: str

    # ---- delegation (report/roofline/structure probes) ----
    @property
    def dtype(self):
        return self.inner.dtype

    @property
    def n_rows(self):
        return self.inner.n_rows

    @property
    def n_cols(self):
        return self.inner.n_cols

    @property
    def nnz_stored(self):
        return self.inner.nnz_stored

    @property
    def planar(self):
        return self.inner.planar

    @property
    def legs(self):
        return self.inner.legs

    @property
    def dims(self):
        return self.inner.dims

    @property
    def offsets(self):
        return self.inner.offsets

    @property
    def n_devices(self):
        return int(self.mesh.shape[self.axis])


@partial(jax.tree_util.register_dataclass,
         data_fields=["inner"], meta_fields=["mesh", "axis"])
@dataclasses.dataclass
class MeshDIA:
    """A DeviceDIA bound to a 1-D row mesh (data rows sharded P(None, axis),
    padded rows a multiple of row_tile·n_devices)."""

    inner: DeviceDIA
    mesh: jax.sharding.Mesh
    axis: str

    @property
    def dtype(self):
        return self.inner.dtype

    @property
    def n_rows(self):
        return self.inner.n_rows

    @property
    def n_cols(self):
        return self.inner.n_cols

    @property
    def nnz_stored(self):
        return self.inner.nnz_stored

    @property
    def offsets(self):
        return self.inner.offsets

    @property
    def data(self):
        return self.inner.data

    @property
    def row_tile(self):
        return self.inner.row_tile

    @property
    def n_devices(self):
        return int(self.mesh.shape[self.axis])


def _halo_blocks(x2: jax.Array, TR: int, axis: str):
    """(top, bot) (TR, L) neighbor slabs: top = left neighbor's last tile,
    bot = right neighbor's first tile; global-edge shards receive zeros
    (ppermute drops unmatched sources) — those zeros feed only masked
    outputs (stencil_op geometry: drmax ≤ rows_plane + 1 halo rows)."""
    n_dev = jax.lax.axis_size(axis)
    top = jax.lax.ppermute(x2[-TR:], axis,
                           perm=[(i, i + 1) for i in range(n_dev - 1)])
    bot = jax.lax.ppermute(x2[:TR], axis,
                           perm=[(i + 1, i) for i in range(n_dev - 1)])
    return top, bot


def mesh_stencil_spmv(A: MeshStencil, xp: jax.Array, dots=(),
                      aux: Optional[jax.Array] = None):
    """y = A @ x on sharded vectors; `dots` as in stencil_spmv_resident,
    reduced with psum.  Returns y or (y, *dots).

    Vectors may be planar-resident (device-native setups) or FLAT (e.g.
    the ILU(0)-blocked path) — flat inputs are planar-encoded around the
    shard-local kernel (GSPMD reshapes; same two extra passes the
    single-chip flat mode pays).  Dot partials are computed on the planar
    form; planar halos are exactly zero, so the values equal the flat dots.
    """
    from ..stencil_op import from_planar_vec, to_planar_vec
    St = A.inner
    flat = xp.ndim == 1            # planar-resident vectors are 2-D
    if flat:
        xp = to_planar_vec(St, xp)
        if aux is not None:
            aux = to_planar_vec(St, aux)
    L, rows_plane, rows_total, drmax, TR, rows_pad = _planar_geometry(St)
    n_dev = A.n_devices
    R_local = rows_pad // n_dev
    axis = A.axis
    has_diag = St.diag is not None
    vspec = P(axis, None)     # planar vectors are 2-D (rows, lanes)

    def local(coeffs, diag, xl, auxl):
        top, bot = _halo_blocks(xl, TR, axis)
        row0 = (jax.lax.axis_index(axis) * jnp.int32(R_local))
        St_l = dataclasses.replace(St, coeffs=coeffs, diag=diag)
        outs = stencil_spmv_resident(St_l, xl, dots=dots, aux=auxl,
                                     halo=(top, bot), row0=row0)
        if not dots:
            return outs
        return (outs[0],) + tuple(jax.lax.psum(p, axis) for p in outs[1:])

    in_specs = (P(), vspec if has_diag else None, vspec,
                vspec if aux is not None else None)
    out_specs = (vspec if not dots
                 else (vspec,) + tuple(P() for _ in dots))
    f = jax.shard_map(local, mesh=A.mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
    outs = f(St.coeffs, St.diag, xp, aux)
    if not flat:
        return outs
    if not dots:
        return from_planar_vec(St, outs)
    return (from_planar_vec(St, outs[0]),) + tuple(outs[1:])


def mesh_gs_color_step(A: MeshStencil, xp: jax.Array, rhs: jax.Array,
                       dinv: jax.Array, spec, color) -> jax.Array:
    """Shard-local fused multicolor-GS color step (superstep chains
    included — they are lane-local, so no extra exchange)."""
    St = A.inner
    L, rows_plane, rows_total, drmax, TR, rows_pad = _planar_geometry(St)
    n_dev = A.n_devices
    R_local = rows_pad // n_dev
    axis = A.axis
    has_diag = St.diag is not None
    vspec = P(axis, None)

    def local(coeffs, diag, xl, rl, dl):
        top, bot = _halo_blocks(xl, TR, axis)
        row0 = (jax.lax.axis_index(axis) * jnp.int32(R_local))
        St_l = dataclasses.replace(St, coeffs=coeffs, diag=diag)
        return stencil_gs_color_step(St_l, xl, rl, dl, spec, color,
                                     halo=(top, bot), row0=row0)

    in_specs = (P(), vspec if has_diag else None, vspec, vspec,
                vspec)
    f = jax.shard_map(local, mesh=A.mesh, in_specs=in_specs,
                      out_specs=vspec, check_vma=False)
    return f(St.coeffs, St.diag, xp, rhs, dinv)


def mesh_dia_spmv(A: MeshDIA, x: jax.Array) -> jax.Array:
    """y = A @ x: per-shard tiled DIA kernel with ppermute'd halo entries
    in the local x window (ops/pallas_spmv.dia_pallas_core)."""
    from ..ops.pallas_spmv import dia_pallas_core
    D = A.inner
    offsets = D.offsets
    n = D.n_rows
    if not offsets:
        return jnp.zeros(n, dtype=x.dtype)
    R = D.row_tile
    npad = D.data.shape[1]
    n_dev = A.n_devices
    R_local = npad // n_dev
    axis = A.axis
    hneg = max(0, -min(offsets))
    hpos = max(0, max(offsets))
    xfull = x if n == npad else jnp.pad(x, (0, npad - n))

    def local(data_l, xl):
        n_d = jax.lax.axis_size(axis)
        xp = jnp.zeros(R_local + R, dtype=xl.dtype)
        xp = jax.lax.dynamic_update_slice(xp, xl, (hneg,))
        if hneg:
            left = jax.lax.ppermute(
                xl[-hneg:], axis, perm=[(i, i + 1) for i in range(n_d - 1)])
            xp = jax.lax.dynamic_update_slice(xp, left, (0,))
        if hpos:
            right = jax.lax.ppermute(
                xl[:hpos], axis, perm=[(i + 1, i) for i in range(n_d - 1)])
            xp = jax.lax.dynamic_update_slice(xp, right,
                                              (hneg + R_local,))
        return dia_pallas_core(offsets, hneg, R, data_l, xp)

    f = jax.shard_map(local, mesh=A.mesh,
                      in_specs=(P(None, axis), P(axis)),
                      out_specs=P(axis), check_vma=False)
    y = f(D.data, xfull)
    return y[:n] if n != npad else y


@partial(jax.tree_util.register_dataclass,
         data_fields=["inner"], meta_fields=["mesh", "axis"])
@dataclasses.dataclass
class MeshLaneELL:
    """A DeviceLaneELL bound to a 1-D row mesh: slot planes sharded
    P(None, axis, None) with R a multiple of TB·n_devices, SpMV as the
    per-shard lane-gather kernel over a one-tile ppermute'd halo window
    (S ≤ TB by the format invariant, so neighbor tiles always suffice)."""

    inner: "DeviceLaneELL"
    mesh: jax.sharding.Mesh
    axis: str

    @property
    def dtype(self):
        return self.inner.dtype

    @property
    def n_rows(self):
        return self.inner.n_rows

    @property
    def n_cols(self):
        return self.inner.n_cols

    @property
    def nnz_stored(self):
        return self.inner.nnz_stored

    @property
    def n_devices(self):
        return int(self.mesh.shape[self.axis])


def unwrap(A):
    """The underlying single-device operator of a mesh wrapper (identity
    for plain operators)."""
    if isinstance(A, (MeshStencil, MeshDIA, MeshLaneELL)):
        return A.inner
    return A


def wrap_stencil(St: DeviceStencil, mesh, axis: str) -> MeshStencil:
    """Validate and bind a planar stencil to the mesh (shards must already
    match the mesh size — shard_setup rebuilds the geometry first)."""
    n_dev = int(mesh.shape[axis])
    if not St.planar:
        raise ValueError("mesh stencil needs planar-resident layout")
    if St.shards != n_dev:
        raise ValueError(
            f"stencil shards={St.shards} != mesh size {n_dev}")
    if not _planar_ok(St):
        raise ValueError("stencil legs exceed the planar kernel's window")
    return MeshStencil(inner=St, mesh=mesh, axis=axis)


def wrap_lane_ell(M, mesh, axis: str, dtype) -> MeshLaneELL:
    """Pad the lane-ELL row dimension to TB·n_devices (inert rows) and
    bind to the mesh; raises when the kernel cannot execute here."""
    from ..ops.lane_ell import lane_ell_extend_rows
    if not mesh_pallas_capable(dtype):
        raise ValueError("lane-ELL mesh kernels cannot execute here")
    n_dev = int(mesh.shape[axis])
    chunk = M.TB * n_dev
    R2 = -(-M.R // chunk) * chunk
    M = lane_ell_extend_rows(M, R2)
    sh = jax.sharding.NamedSharding(mesh, P(None, axis, None))
    M = dataclasses.replace(M, vals=jax.device_put(M.vals, sh),
                            idx=jax.device_put(M.idx, sh))
    return MeshLaneELL(inner=M, mesh=mesh, axis=axis)


def mesh_lane_ell_spmv(A: MeshLaneELL, x: jax.Array) -> jax.Array:
    """y = A @ x: per-shard windowed lane-gather kernel; the 3-tile x
    window is rebuilt per shard from the local rows plus one ppermute'd
    neighbor tile each side (ops/lane_ell.lane_ell_spmv_halo) — the
    general-sparsity analog of the reference's row-parallel native_spmv
    (/root/reference/kernels.hpp:22-42) without the GSPMD all-gather."""
    from ..ops.lane_ell import lane_ell_spmv_halo
    M = A.inner
    n, R, TB, LANES = M.n_rows, M.R, M.TB, M.vals.shape[2]
    n_dev = A.n_devices
    R_local = R // n_dev
    grid_n = R_local // TB
    axis = A.axis
    npad = R * LANES
    xfull = x if n == npad else jnp.pad(x, (0, npad - n))
    x2 = xfull.reshape(R, LANES)

    def local(vals_l, idx_l, xl):
        top, bot = _halo_blocks(xl, TB, axis)
        x2pad = jnp.concatenate([top, xl, bot], axis=0)
        return lane_ell_spmv_halo(M, vals_l, idx_l, x2pad, grid_n)

    f = jax.shard_map(local, mesh=A.mesh,
                      in_specs=(P(None, axis, None), P(None, axis, None),
                                P(axis, None)),
                      out_specs=P(axis, None), check_vma=False)
    y2 = f(M.vals, M.idx, x2)
    return y2.reshape(-1)[:n]


def wrap_dia(D: DeviceDIA, mesh, axis: str, dtype) -> MeshDIA:
    """Pad the DIA row dimension to row_tile·n_devices and bind to the
    mesh; raises when the kernel is structurally ineligible."""
    from ..ops.pallas_spmv import dia_pallas_eligible
    n_dev = int(mesh.shape[axis])
    R = D.row_tile
    npad = D.data.shape[1]
    chunk = R * n_dev
    npad2 = -(-npad // chunk) * chunk
    if npad2 != npad:
        D = dataclasses.replace(
            D, data=jnp.pad(D.data, ((0, 0), (0, npad2 - npad))))
    if not dia_pallas_eligible(D, np.dtype(dtype).itemsize):
        raise ValueError("DIA structure ineligible for the Pallas kernel")
    offsets = D.offsets
    hneg = max(0, -min(offsets)) if offsets else 0
    hpos = max(0, max(offsets)) if offsets else 0
    if hneg > npad2 // n_dev or hpos > npad2 // n_dev:
        raise ValueError("halo exceeds the local shard length")
    return MeshDIA(inner=D, mesh=mesh, axis=axis)
