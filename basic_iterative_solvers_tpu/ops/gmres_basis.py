"""Fused GMRES basis-pass kernels (orthog_mode="fused").

The lowsync orthogonalization (solvers/gmres.py) is basis-streaming-bound:
two full passes over the stored Krylov basis per iteration.  On the XLA
path those passes run at ~590 GB/s, but the iteration carries ~0.6 ms of
FIXED cost the contractions don't account for: the single-row basis write
RMWs 8/16-sublane tiles of the flat (m+1, N) array (~0.17 ms at 2.1M rows),
w is stacked/reshaped between layouts, the new basis vector needs a
separate normalize+cast pass, and the Gram column needs v_j restreamed.

These kernels restructure the iteration so the basis traffic is EXACTLY
two streams of the active rows and nothing else:

* V is stored (m_pad, R, L) in the basis dtype — every basis vector owns
  its own (8,128)/(16,128) tiles, so the per-iteration row write is a pure
  tile-aligned DMA store, not a read-modify-write of interleaved rows.
* Rows are stored UNNORMALIZED (Vraw[i] = c_i · v_i with v_i the unit
  Arnoldi vector); the solver carries s_i = 1/c_i and folds the scales
  into the (m+1)-sized coefficient math outside the kernels.  The
  normalization pass over the new vector disappears entirely: c_{j+1} is
  just ‖w_corrected‖, measured for free inside the correction pass.
* `project_gram` computes BOTH reductions the lowsync scheme needs —
  Pw[i] = <Vraw_i, w> and Pv[i] = <Vraw_i, Vraw_j> (the exact Gram
  column, with Vraw_j = the carried v_cur operand) — in ONE pass.
* `correct_write` applies w -= Σ h̃_i·Vraw_i, writes the basis-dtype row
  DIRECTLY into V[j+1] (clean tiles), accumulates ‖w_corr‖², and returns
  the rounded-to-storage f32 copy as the next iteration's v_cur — the
  second pass also replaces the XLA path's norm pass, cast pass and RMW.

Rows are streamed in 8-row buckets through a 2-slot VMEM window with
cross-grid-step DMA prefetch (the next bucket's copy is always in flight),
the pattern proven at ~580 GB/s by ops/block_trisolve.py.  Rows beyond j
contribute zero by construction: their stored values are zero after a
Krylov reset AND their scales s_i / coefficients h̃_i are zero, so no
masking is needed in the hot loop.

Reference anchor: orthogonalize_V + V row storage
(/root/reference/methods/gmres.hpp:6-53, 158-160, 225).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_env

LANES = 128
_VMEM_LIMIT = 100 * 1024 * 1024


class BasisPlan(NamedTuple):
    """Static geometry for the fused basis kernels."""
    R: int          # vector rows (sublane axis)
    L: int          # vector lanes (multiple of 128)
    CW: int         # rows per column-chunk window (8·2^k)
    n_chunks: int   # R // CW
    m_pad: int      # basis rows, padded to a multiple of 8
    max_b: int      # m_pad // 8 — static bucket-loop bound


def plan_for(vec_shape, m: int, basis_dtype) -> Optional[BasisPlan]:
    """A BasisPlan for (m+1)-row bases over vectors of `vec_shape`, or
    None when the fused kernels don't apply (odd shapes, f64 basis)."""
    if len(vec_shape) != 2:
        return None
    R, L = int(vec_shape[0]), int(vec_shape[1])
    if L % LANES or R < 16:
        return None
    if jnp.dtype(basis_dtype) not in (jnp.dtype(jnp.float32),
                                      jnp.dtype(jnp.bfloat16)):
        return None
    itemsize = jnp.dtype(basis_dtype).itemsize
    # largest power-of-two chunk (≥16: bf16 sublane tile — window slices
    # stay tile-aligned; power of two: the in-kernel ‖·‖² sublane fold
    # halves down to 8 rows) that divides R within an ~4 MB window
    budget = max(1, (4 * 1024 * 1024) // (8 * L * itemsize))
    cw = 0
    cand = 16
    while cand <= min(R, budget):
        if R % cand == 0:
            cw = cand
        cand *= 2
    if cw < 16:
        return None
    m_pad = -(-(m + 1) // 8) * 8
    return BasisPlan(R=R, L=L, CW=cw, n_chunks=R // cw, m_pad=m_pad,
                     max_b=m_pad // 8)


def _i32(x):
    return jnp.int32(x)


def _stream_buckets(V_ref, win, sem, i, nb, n_chunks, max_b, CW, consume):
    """Static-unrolled 8-row bucket stream with cross-step DMA prefetch.

    Work item g = i·nb + b (grid step i, bucket b) lives in VMEM slot g%2;
    processing item g first starts the copy for item g+1 (possibly bucket 0
    of grid step i+1 — columns differ, so those reads never overlap the
    row-write DMA of the current step), then waits on g and calls
    consume(b, window).  nb is the same for every grid step of one launch
    (j is fixed), so the slot parity is globally consistent.  consume runs
    under pl.when — it must only write to refs.
    """
    def dma(ii, bb, slot):
        return pltpu.make_async_copy(
            V_ref.at[pl.ds(bb * _i32(8), 8), pl.ds(ii * _i32(CW), CW)],
            win.at[slot], sem.at[slot])

    @pl.when(i == _i32(0))
    def _():
        dma(_i32(0), _i32(0), _i32(0)).start()

    for b in range(max_b):
        @pl.when(_i32(b) < nb)
        def _(b=b):
            g = i * nb + _i32(b)
            has_next_b = _i32(b + 1) < nb
            nxt_b = jnp.where(has_next_b, _i32(b + 1), _i32(0))
            nxt_i = jnp.where(has_next_b, i, i + _i32(1))

            @pl.when(nxt_i < _i32(n_chunks))
            def _():
                dma(nxt_i, nxt_b, (g + _i32(1)) % _i32(2)).start()

            slot = g % _i32(2)
            dma(i, _i32(b), slot).wait()
            consume(b, win[slot])


def project_gram(V, w, vc, j, *, plan: BasisPlan):
    """Pw[i] = <Vraw_i, w>, Pv[i] = <Vraw_i, vc> for all basis rows in one
    stream of rows 0..j (raw products — the caller applies the s-scales).

    V: (m_pad, R, L) basis dtype; w, vc: (R, L) f32; j: i32 scalar.
    Returns (Pw, Pv) as (m_pad,) f32.
    """
    CW, L, m_pad, max_b = plan.CW, plan.L, plan.m_pad, plan.max_b
    n_chunks = plan.n_chunks

    def kernel(j_ref, w_ref, vc_ref, V_ref, accw_ref, accv_ref, win, sem):
        i = pl.program_id(0)
        nb = (j_ref[0] + _i32(8)) // _i32(8)   # buckets holding rows 0..j

        @pl.when(i == _i32(0))
        def _():
            accw_ref[...] = jnp.zeros_like(accw_ref)
            accv_ref[...] = jnp.zeros_like(accv_ref)

        w32 = w_ref[...]
        vc32 = vc_ref[...]

        def consume(b, wb):
            for r in range(8):
                row = wb[r].astype(jnp.float32)                  # (CW, L)
                pw = jnp.sum(row * w32, axis=0, keepdims=True)   # (1, L)
                pv = jnp.sum(row * vc32, axis=0, keepdims=True)
                accw_ref[b * 8 + r:b * 8 + r + 1, :] += pw
                accv_ref[b * 8 + r:b * 8 + r + 1, :] += pv

        _stream_buckets(V_ref, win, sem, i, nb, n_chunks, max_b, CW,
                        consume)

    accw, accv = pl.pallas_call(
        kernel,
        name="orthog_project_gram",
        grid=(n_chunks,),
        in_specs=[
            # NB explicit index map: a bare SMEM spec synthesizes a default
            # map whose literal 0 traces as i64 under the package's x64 mode
            # and Mosaic then dies at `func.return (i64)` on real TPU.
            pl.BlockSpec((1,), lambda i: (_i32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CW, L), lambda i: (i, _i32(0))),
            pl.BlockSpec((CW, L), lambda i: (i, _i32(0))),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((m_pad, L), lambda i: (_i32(0), _i32(0))),
            pl.BlockSpec((m_pad, L), lambda i: (_i32(0), _i32(0))),
        ],
        out_shape=[jax.ShapeDtypeStruct((m_pad, L), jnp.float32),
                   jax.ShapeDtypeStruct((m_pad, L), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2, 8, CW, L), V.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * plan.R * L,
            bytes_accessed=(m_pad * plan.R * L * V.dtype.itemsize
                            + 8 * plan.R * L),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=pallas_env.INTERPRET,
    )(jnp.asarray([j], dtype=jnp.int32), w, vc, V)
    return jnp.sum(accw, axis=1), jnp.sum(accv, axis=1)


def correct_write(V, w, ht, j, *, plan: BasisPlan):
    """wc = w − Σᵢ h̃ᵢ·Vraw_i; stores wc (in the basis dtype) as row j+1 of
    V via a clean tile-aligned DMA, and returns
      (V', vnext, nrm2): the updated basis, the storage-rounded f32 copy of
      the new row (the next iteration's v_cur), and ‖vnext‖².

    ht must be zero beyond row j (rows > j then contribute nothing even if
    their storage holds stale values).  V: (m_pad, R, L); w: (R, L) f32;
    ht: (m_pad,) f32.
    """
    CW, L, m_pad, max_b = plan.CW, plan.L, plan.m_pad, plan.max_b
    n_chunks = plan.n_chunks
    vdt = V.dtype

    def kernel(j_ref, ht_ref, w_ref, V_ref, Vout_ref, vn_ref, accn_ref,
               win, sem, acc_scr, obuf, osem):
        i = pl.program_id(0)
        jv = j_ref[0]
        nb = (jv + _i32(8)) // _i32(8)

        @pl.when(i == _i32(0))
        def _():
            accn_ref[...] = jnp.zeros_like(accn_ref)

        acc_scr[...] = w_ref[...]                    # (CW, L) f32

        def consume(b, wb):
            acc = acc_scr[...]
            for r in range(8):
                acc = acc - ht_ref[b * 8 + r] * wb[r].astype(jnp.float32)
            acc_scr[...] = acc

        _stream_buckets(V_ref, win, sem, i, nb, n_chunks, max_b, CW,
                        consume)

        rounded = acc_scr[...].astype(vdt)
        vnext = rounded.astype(jnp.float32)
        vn_ref[...] = vnext
        # ‖·‖² lane partials: fold sublanes pairwise down to 8 rows, then
        # accumulate — nrm2 is of the ROUNDED vector, so s_{j+1} = 1/√nrm2
        # makes the scaled stored row exactly unit (G diagonal stays 1).
        sq = vnext * vnext
        rows = CW
        while rows > 8:
            rows //= 2
            sq = sq[:rows] + sq[rows:]
        accn_ref[...] += sq

        # row j+1 write: the row owns its tiles, so this is a pure store
        obuf[...] = rounded
        ocp = pltpu.make_async_copy(
            obuf, Vout_ref.at[jv + _i32(1), pl.ds(i * _i32(CW), CW)], osem)
        ocp.start()
        ocp.wait()

    V_new, vnext, accn = pl.pallas_call(
        kernel,
        name="orthog_correct_write",
        grid=(n_chunks,),
        in_specs=[
            # explicit i32 index maps — see project_gram's SMEM spec note
            pl.BlockSpec((1,), lambda i: (_i32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m_pad,), lambda i: (_i32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CW, L), lambda i: (i, _i32(0))),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((CW, L), lambda i: (i, _i32(0))),
            pl.BlockSpec((8, L), lambda i: (_i32(0), _i32(0))),
        ],
        out_shape=[jax.ShapeDtypeStruct(V.shape, vdt),
                   jax.ShapeDtypeStruct((plan.R, L), jnp.float32),
                   jax.ShapeDtypeStruct((8, L), jnp.float32)],
        input_output_aliases={3: 0},
        scratch_shapes=[
            pltpu.VMEM((2, 8, CW, L), vdt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((CW, L), jnp.float32),
            pltpu.VMEM((CW, L), vdt),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * plan.R * L,
            bytes_accessed=(m_pad * plan.R * L * vdt.itemsize
                            + 12 * plan.R * L),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=pallas_env.INTERPRET,
    )(jnp.asarray([j], dtype=jnp.int32), ht, w, V)
    return V_new, vnext, jnp.sum(accn)
