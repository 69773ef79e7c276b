"""Pallas-kernel coverage on CPU via the interpreter.

The TPU kernels (Mosaic rolls, window slices, async copies, in-place
aliasing) normally execute only on real hardware; these tests run the
ACTUAL kernel bodies through `pallas_call(interpret=True)` and pin them
against the XLA fallback implementations — the CI tier for the code the
fallbacks bypass.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import basic_iterative_solvers_tpu as bis
from basic_iterative_solvers_tpu.ops import pallas_env


@pytest.fixture
def interpret():
    pallas_env.INTERPRET = True
    try:
        yield
    finally:
        pallas_env.INTERPRET = False


def test_dia_kernel_interpret(interpret, rng):
    from basic_iterative_solvers_tpu.dia import from_source_device
    from basic_iterative_solvers_tpu.ops.spmv import spmv
    A = from_source_device("band:700,2", dtype=np.float32)
    x = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    y_k = np.asarray(spmv(A, x, use_pallas=True))
    y_x = np.asarray(spmv(A, x, use_pallas=False))
    np.testing.assert_allclose(y_k, y_x, rtol=2e-6, atol=1e-6)


def test_stencil_resident_kernel_interpret(interpret, rng):
    from basic_iterative_solvers_tpu.stencil_op import (
        from_source_operator, stencil_spmv_resident,
        stencil_spmv_resident_xla, to_planar_matrix, to_planar_vec)
    A = to_planar_matrix(from_source_operator("hpcg:8x6x4",
                                              dtype=np.float32))
    xp = to_planar_vec(A, jnp.asarray(
        rng.standard_normal(A.n_rows).astype(np.float32)))
    y_k = np.asarray(stencil_spmv_resident(A, xp))
    y_x = np.asarray(stencil_spmv_resident_xla(A, xp))
    np.testing.assert_allclose(y_k, y_x, rtol=2e-6, atol=1e-5)


def test_fused_gs_superstep_interpret(interpret, rng):
    """The fused masked-sweep kernel incl. the in-register x-parity chain
    equals the unfused (SpMV + masked update) sweep."""
    from basic_iterative_solvers_tpu.coloring import (colored_sweep,
                                                      spec_for_device)
    from basic_iterative_solvers_tpu.stencil_op import (
        from_source_operator, stencil_diag_vec, to_planar_matrix,
        to_planar_vec)
    A = to_planar_matrix(from_source_operator("hpcg:8x6x4",
                                              dtype=np.float32))
    spec = spec_for_device(A)
    assert spec.kind == "grid" and spec.params[3] == 2
    D = stencil_diag_vec(A)
    D_inv = jnp.where(D != 0, 1.0 / D, 1.0).astype(np.float32)
    y = to_planar_vec(A, jnp.asarray(
        rng.standard_normal(A.n_rows).astype(np.float32)))
    for reverse in (False, True):
        z_f = colored_sweep(A, D_inv, y, None, spec, None, spec.n_colors,
                            reverse=reverse, use_pallas=True)
        z_x = colored_sweep(A, D_inv, y, None, spec, None, spec.n_colors,
                            reverse=reverse, use_pallas=False)
        np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_x),
                                   rtol=2e-5, atol=1e-5)


def test_lane_ell_kernel_interpret(interpret, rng):
    from basic_iterative_solvers_tpu.ops.lane_ell import (csr_to_lane_ell,
                                                          lane_ell_spmv)
    A = bis.generators.from_source("sband:1500,5,60")
    M = csr_to_lane_ell(A, dtype=np.float32)
    x = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    y_k = np.asarray(lane_ell_spmv(M, x, use_pallas=True))
    y_x = np.asarray(lane_ell_spmv(M, x, use_pallas=False))
    np.testing.assert_allclose(y_k, y_x, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("src", ["hpcg:8x8x8", "hpcg:6x4x8"],
                         ids=["fused", "split"])
@pytest.mark.slow
def test_superblock_trisolve_kernel_interpret(interpret, rng, src):
    from basic_iterative_solvers_tpu.ops.block_trisolve import (
        SuperBlockTriSolve, blocked_sgs, blocked_trisolve,
        build_superblock_trisolve, spec_colors_np)
    A = bis.generators.from_source(src)
    spec = bis.generators.color_spec_for_source(src)
    colors = spec_colors_np(spec, A.n_rows)
    rows = np.repeat(np.arange(A.n_rows), A.row_nnz())
    D = np.zeros(A.n_rows)
    D[rows[A.col == rows]] = A.val[A.col == rows]
    L = build_superblock_trisolve(A, D, colors, spec, upper=False,
                                  dtype=np.float32, need_d=True)
    U = build_superblock_trisolve(A, D, colors, spec, upper=True,
                                  dtype=np.float32)
    assert isinstance(L, SuperBlockTriSolve)
    y = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(blocked_trisolve(L, y, use_pallas=True)),
        np.asarray(blocked_trisolve(L, y, use_pallas=False)),
        rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(blocked_sgs(L, U, y, use_pallas=True)),
        np.asarray(blocked_sgs(L, U, y, use_pallas=False)),
        rtol=2e-5, atol=1e-5)


def test_rankspace_trisolve_kernel_interpret(interpret, rng):
    from basic_iterative_solvers_tpu.coloring import mod_color_spec
    from basic_iterative_solvers_tpu.ops.block_trisolve import (
        BlockedTriSolve, blocked_trisolve, build_blocked_trisolve,
        spec_colors_np)
    A = bis.generators.from_source("band:900,2")
    spec = mod_color_spec([1, 2], A.n_rows)
    colors = spec_colors_np(spec, A.n_rows)
    rows = np.repeat(np.arange(A.n_rows), A.row_nnz())
    D = np.zeros(A.n_rows)
    D[rows[A.col == rows]] = A.val[A.col == rows]
    B = build_blocked_trisolve(A, D, colors, spec, upper=False,
                               dtype=np.float32)
    assert isinstance(B, BlockedTriSolve)
    y = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(blocked_trisolve(B, y, use_pallas=True)),
        np.asarray(blocked_trisolve(B, y, use_pallas=False)),
        rtol=2e-5, atol=1e-5)


def test_gmres_basis_kernels_interpret(interpret, rng):
    """The fused GMRES basis kernels (project_gram, correct_write) against
    NumPy oracles, on a multi-chunk plan (exercises the cross-grid-step
    DMA prefetch).  bf16 storage is covered end-to-end by
    test_gmres_fused_bf16_basis_debug_checks."""
    from basic_iterative_solvers_tpu.ops import gmres_basis as gb
    R, L, m = 512, 512, 10
    plan = gb.plan_for((R, L), m, jnp.float32)
    assert plan is not None and plan.n_chunks > 1
    V = rng.standard_normal((plan.m_pad, R, L)).astype(np.float32)
    Vd = jnp.asarray(V)
    Vnp = V
    w = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))
    for j in (0, m - 1):
        nb = (j + 8) // 8
        rows = min(nb * 8, plan.m_pad)
        Pw, Pv = gb.project_gram(Vd, w, vc, j, plan=plan)
        ew = np.tensordot(Vnp[:rows], np.asarray(w), axes=([1, 2], [0, 1]))
        ev = np.tensordot(Vnp[:rows], np.asarray(vc), axes=([1, 2], [0, 1]))
        np.testing.assert_allclose(np.asarray(Pw)[:rows], ew,
                                   rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(Pv)[:rows], ev,
                                   rtol=1e-4, atol=1e-2)
        ht = np.zeros(plan.m_pad, np.float32)
        ht[: j + 1] = rng.standard_normal(j + 1).astype(np.float32)
        Vn, vnext, nrm2 = gb.correct_write(Vd, w, jnp.asarray(ht), j,
                                           plan=plan)
        wc_r = np.asarray(w) - np.tensordot(ht[:rows], Vnp[:rows],
                                            axes=([0], [0]))
        vnext = np.asarray(vnext)
        np.testing.assert_allclose(vnext, wc_r, rtol=0, atol=1e-5)
        np.testing.assert_allclose(float(nrm2), float(np.sum(vnext ** 2)),
                                   rtol=1e-5)
        Vn_np = np.asarray(Vn.astype(jnp.float32))
        # the written row is exactly the returned vector; all other rows
        # (incl. the streamed-but-unwritten ones) are preserved bit-exact
        np.testing.assert_array_equal(Vn_np[j + 1], vnext)
        others = [i for i in range(plan.m_pad) if i != j + 1]
        np.testing.assert_array_equal(Vn_np[others], Vnp[others])


@pytest.mark.slow
def test_gmres_fused_matches_lowsync(interpret):
    """orthog_mode='fused' (scaled-raw basis + explicit-DMA kernels) must
    reproduce the lowsync trajectory, including across restarts."""
    kw = dict(method="gm", dtype=np.float32, tolerance=1e-5, max_iters=300,
              restart_length=8, harness="fused")
    rf = bis.solve_system("hpcg:16x16x16", orthog_mode="fused", **kw)
    rl = bis.solve_system("hpcg:16x16x16", orthog_mode="lowsync", **kw)
    assert rf.converged and rl.converged
    assert rf.gmres_restart_count >= 1       # exercises the s/G reset
    assert abs(rf.iter_count - rl.iter_count) <= 2
    np.testing.assert_allclose(rf.x_star, rl.x_star, rtol=0, atol=1e-4)


@pytest.mark.slow
def test_gmres_fused_bf16_basis_debug_checks(interpret):
    """Fused mode with a bf16 scaled-raw basis converges equivalently, and
    the per-iteration V-orthonormality SanityChecker passes on the host
    harness (the diag(s)·Vraw basis is unit to storage precision)."""
    kw = dict(method="gm", dtype=np.float32, tolerance=1e-5, max_iters=200,
              restart_length=20)
    rb = bis.solve_system("hpcg:16x16x16", orthog_mode="fused",
                          gmres_basis_dtype="bfloat16", harness="fused", **kw)
    rh = bis.solve_system("hpcg:16x16x16", orthog_mode="fused",
                          harness="host", debug_checks=True, **kw)
    assert rb.converged and rh.converged
    assert abs(rb.iter_count - rh.iter_count) <= 3


def test_stencil_stream_kernel_interpret(interpret, rng, monkeypatch):
    """The single-fetch streaming SpMV (3-slot VMEM ring, one-step
    lookahead) matches the XLA oracle and the windowed kernel, including
    the fused in-kernel dots and a dense diagonal.  The row tile is shrunk
    so a small grid spans several ring revolutions (grid_n = 8)."""
    from basic_iterative_solvers_tpu import stencil_op as so
    monkeypatch.setattr(so, "_ROW_TILE_2D", 64)
    A = so.to_planar_matrix(so.from_source_operator("hpcg:8x6x62",
                                                    dtype=np.float32))
    x = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    a = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    xp, ap = so.to_planar_vec(A, x), so.to_planar_vec(A, a)
    assert xp.shape[0] // 64 == 8

    y_s, dx_s, ds_s, da_s = so.stencil_spmv_stream(
        A, xp, dots=("x", "self", "aux"), aux=ap)
    y_w, dx_w, ds_w, da_w = so.stencil_spmv_resident(
        A, xp, dots=("x", "self", "aux"), aux=ap)
    y_o = so.stencil_spmv_resident_xla(A, xp)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_o),
                               rtol=2e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y_w))
    for s, w in ((dx_s, dx_w), (ds_s, ds_w), (da_s, da_w)):
        np.testing.assert_allclose(float(s), float(w), rtol=1e-6)


def test_stencil_stream_diag_interpret(interpret, rng, monkeypatch):
    """Streaming kernel with a dense diagonal (Anderson-style operator)."""
    from basic_iterative_solvers_tpu import stencil_op as so
    monkeypatch.setattr(so, "_ROW_TILE_2D", 64)
    nx, ny, nz = 8, 6, 30
    n = nx * ny * nz
    d = rng.standard_normal(n).astype(np.float32)
    legs = [((0, 0, 0), 1.0)] + [
        (off, -1.0) for off in [(1, 0, 0), (-1, 0, 0), (0, 1, 0),
                                (0, -1, 0), (0, 0, 1), (0, 0, -1)]]
    A = so.to_planar_matrix(so.make_stencil(legs, nx, ny, nz,
                                            diag=jnp.asarray(d)))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    xp = so.to_planar_vec(A, x)
    assert xp.shape[0] // 64 >= 4
    y_s = so.stencil_spmv_stream(A, xp)
    y_o = so.stencil_spmv_resident_xla(A, xp)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_o),
                               rtol=2e-6, atol=1e-5)


def test_stencil_stream_wide_lanes_interpret(interpret, rng, monkeypatch):
    """Streaming kernel with nx > 128 (L = 256: multi-vreg lane rolls —
    the 256^3/384^3 capacity geometry, scaled down)."""
    from basic_iterative_solvers_tpu import stencil_op as so
    monkeypatch.setattr(so, "_ROW_TILE_2D", 32)
    A = so.to_planar_matrix(so.from_source_operator("hpcg:160x6x14",
                                                    dtype=np.float32))
    x = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    xp = so.to_planar_vec(A, x)
    assert xp.shape[1] == 256 and xp.shape[0] // 32 >= 4
    y_s, d_s = so.stencil_spmv_stream(A, xp, dots=("x",))
    y_o = so.stencil_spmv_resident_xla(A, xp)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_o),
                               rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(float(d_s), float(jnp.sum(y_o * xp)),
                               rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("src", ["hpcg:128x16x16", "hpcg:384x32x32"],
                         ids=["nx128", "nx384-aligned"])
def test_packed_flat_io_ilu0_interpret(interpret, rng, src, monkeypatch):
    """Packed-table translation ILU(0) through the FLAT-IO fast path
    (strided z-slab window DMAs replace the permute/unpermute passes):
    bitwise-identical to the blocked-kernel path, which itself matches the
    XLA oracle to float-reassociation tolerance."""
    import jax.numpy as jnp

    from basic_iterative_solvers_tpu.coloring import spec_for_device
    from basic_iterative_solvers_tpu.ops import block_trisolve as bt
    monkeypatch.setattr(bt, "PACK_MIN_ROWS", 0)
    A = bis.stencil_op.from_source_operator(src, dtype=np.float32)
    spec = spec_for_device(A)
    L, U = bt.build_superblock_ilu0_pair_stencil(A, spec, dtype=np.float32)
    assert L.is_packed and U.is_packed
    assert bt._flat_io_eligible(L, True, jnp.zeros(A.n_rows, jnp.float32))
    y = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    got = np.asarray(bt.blocked_ilu0(L, U, y, use_pallas=True))
    yb = bt._permute_any(L, y)
    xb = bt._solve_any(U, bt._solve_any(L, yb, True), True)
    ref_blocked = np.asarray(bt._unpermute_any(U, xb))
    assert np.array_equal(got, ref_blocked)
    ref_xla = np.asarray(bt.blocked_ilu0(L, U, y, use_pallas=False))
    np.testing.assert_allclose(got, ref_xla, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_packed_mode_bitwise_vs_plane_interpret(interpret, rng, monkeypatch):
    """Packed-table planes regenerate BITWISE-equal to the full plane
    slabs (the clamp distances are verified at build time)."""
    import jax.numpy as jnp

    from basic_iterative_solvers_tpu.coloring import spec_for_device
    from basic_iterative_solvers_tpu.ops import block_trisolve as bt
    monkeypatch.setattr(bt, "PACK_MIN_ROWS", 0)
    A = bis.stencil_op.from_source_operator("hpcg:128x16x16",
                                            dtype=np.float32)
    spec = spec_for_device(A)
    L, U = bt.build_superblock_ilu0_pair_stencil(A, spec, dtype=np.float32)
    old = bt.NO_PACKED
    bt.NO_PACKED = True
    try:
        Lp, Up = bt.build_superblock_ilu0_pair_stencil(A, spec,
                                                       dtype=np.float32)
    finally:
        bt.NO_PACKED = old
    assert L.is_packed and not Lp.is_packed
    y = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    yb = bt._permute_any(L, y)
    got = bt._unpermute_any(U, bt._solve_any(U, bt._solve_any(L, yb, True),
                                             True))
    ref = bt._unpermute_any(Up, bt._solve_any(
        Up, bt._solve_any(Lp, yb, True), True))
    assert np.array_equal(np.asarray(got), np.asarray(ref))
