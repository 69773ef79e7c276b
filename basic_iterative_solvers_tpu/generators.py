"""Built-in matrix generators.

The reference optionally links the external SCAMAC library to generate test
matrices (e.g. the Anderson model) instead of reading a file
(/root/reference/sparse_matrix.hpp:560-735, /root/reference/main.cpp:48-54).
Here the generators are built in, pure NumPy, dependency-free:

* ``anderson``       — 3-D Anderson localization model (SCAMAC's headline
                       generator): H = diag(eps_i) - t * (6-neighbor hopping),
                       eps_i ~ U[-ranpot/2, ranpot/2].
* ``free_fermion_chain`` / ``hubbard`` / ``spin_chain_xxz`` — SCAMAC
                       quantum-model families (fixed-quantum-number sector
                       bases; exact Jordan-Wigner sign bookkeeping for the
                       fermions, sign-free spin flips for XXZ), via
                       ``scamac:FreeFermionChain,...`` / ``scamac:Hubbard,...``
                       / ``scamac:SpinChainXXZ,...``.
* ``stencil_27pt``   — the HPCG benchmark matrix (26 on the diagonal, -1 on
                       all 26 geometric neighbors of a 3-D grid); this is the
                       matrix behind the reference's published baselines
                       (HPCG-128-128-128, /root/reference/README.md:3-6).
* ``fdm_2d``         — 2-D 5-point finite-difference Laplacian matching the
                       in-tree fixture data/matrices/FDM-2d-16.mtx
                       (diag -4, neighbors +1).
* ``banded``         — general banded matrix analog of matrix_band_klein.mtx.

All build COO row-sorted, then convert to CSR.  A matrix "source string" in
the CLI may be a path to a .mtx file or a generator spec such as
``scamac:Anderson,Lx=20,Ly=20,Lz=20,t=1.0,ranpot=5.0,seed=1``,
``hpcg:64x64x64`` or ``fdm:16``.
"""
from __future__ import annotations

import re
import numpy as np

from .matrix import MatrixCOO, MatrixCSR, convert_coo_to_csr


def stencil_27pt(nx: int, ny: int = None, nz: int = None,
                 diag: float = 26.0, off: float = -1.0) -> MatrixCSR:
    """HPCG-style 27-point stencil on an nx×ny×nz grid (open boundary).

    Builds CSR directly in column-sorted order (no global sort): with
    x-fastest row numbering, the 27 linear offsets dx + nx*dy + nx*ny*dz
    processed in (dz, dy, dx)-ascending order are numerically ascending, so
    each row's entries land column-sorted by construction.
    """
    ny = nx if ny is None else ny
    nz = nx if nz is None else nz
    n = nx * ny * nz
    from . import _native
    if _native.available() and n < 2**31:
        built = _native.hpcg_csr(nx, ny, nz, diag, off)
        if built is not None:
            row_ptr, col, val = built
            return MatrixCSR(n, n, int(row_ptr[-1]), row_ptr, col, val)
    # Arrays shaped (nz, ny, nx) so C-order ravel iterates x fastest:
    # raveled position == row index i = x + nx*(y + ny*z).
    Zg, Yg, Xg = np.meshgrid(np.arange(nz, dtype=np.int32),
                             np.arange(ny, dtype=np.int32),
                             np.arange(nx, dtype=np.int32), indexing="ij")
    Xr, Yr, Zr = Xg.ravel(), Yg.ravel(), Zg.ravel()

    stencil = [(dx, dy, dz)
               for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    masks = []
    for (dx, dy, dz) in stencil:
        masks.append(((Xr + dx >= 0) & (Xr + dx < nx)
                      & (Yr + dy >= 0) & (Yr + dy < ny)
                      & (Zr + dz >= 0) & (Zr + dz < nz)))
    counts = np.zeros(n, dtype=np.int64)
    for m in masks:
        counts += m
    row_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    nnz = int(row_ptr[-1])
    col = np.empty(nnz, dtype=np.int32)
    val = np.empty(nnz, dtype=np.float64)
    acc = np.zeros(n, dtype=np.int64)
    rows_all = np.arange(n, dtype=np.int64)
    for (dx, dy, dz), m in zip(stencil, masks):
        lin_off = dx + nx * (dy + ny * dz)
        rows = rows_all[m]
        pos = row_ptr[rows] + acc[rows]
        col[pos] = (rows + lin_off).astype(np.int32)
        val[pos] = diag if (dx, dy, dz) == (0, 0, 0) else off
        acc[rows] += 1
    return MatrixCSR(n, n, nnz, row_ptr, col, val)


def anderson(Lx: int, Ly: int = None, Lz: int = None, t: float = 1.0,
             ranpot: float = 0.0, seed: int = 1,
             boundary: str = "open") -> MatrixCSR:
    """3-D Anderson model (SCAMAC 'Anderson' analog).

    H[i,i] = eps_i ~ U[-ranpot/2, ranpot/2]; H[i,j] = -t for the 6 nearest
    neighbors of a 3-D cubic lattice.  ``boundary`` ∈ {open, periodic}.
    """
    Ly = Lx if Ly is None else Ly
    Lz = Lx if Lz is None else Lz
    n = Lx * Ly * Lz
    rng = np.random.default_rng(seed)
    eps = rng.uniform(-ranpot / 2.0, ranpot / 2.0, size=n)

    X, Y, Z = np.meshgrid(np.arange(Lx), np.arange(Ly), np.arange(Lz),
                          indexing="ij")
    idx = (X + Lx * (Y + Ly * Z)).ravel()
    I_all = [idx]
    J_all = [idx]
    V_all = [eps[idx]]
    for (dx, dy, dz) in [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
                         (0, 0, -1), (0, 0, 1)]:
        Xn, Yn, Zn = X + dx, Y + dy, Z + dz
        if boundary == "periodic":
            valid = np.ones(n, dtype=bool)
            Xn, Yn, Zn = Xn % Lx, Yn % Ly, Zn % Lz
        else:
            valid = ((Xn >= 0) & (Xn < Lx) & (Yn >= 0) & (Yn < Ly)
                     & (Zn >= 0) & (Zn < Lz)).ravel()
            Xn = np.clip(Xn, 0, Lx - 1)
            Yn = np.clip(Yn, 0, Ly - 1)
            Zn = np.clip(Zn, 0, Lz - 1)
        jdx = (Xn + Lx * (Yn + Ly * Zn)).ravel()
        I_all.append(idx[valid.ravel()])
        J_all.append(jdx[valid.ravel()])
        V_all.append(np.full(int(valid.sum()), -t, dtype=np.float64))
    coo = MatrixCOO.from_arrays(np.concatenate(I_all), np.concatenate(J_all),
                                np.concatenate(V_all), n_rows=n, n_cols=n,
                                is_symmetric=True)
    return convert_coo_to_csr(coo)


def fdm_2d(nx: int, diag: float = -4.0, off: float = 1.0) -> MatrixCSR:
    """2-D 5-point FDM Laplacian on an nx×nx grid (the FDM-2d-16 fixture)."""
    n = nx * nx
    X, Y = np.meshgrid(np.arange(nx), np.arange(nx), indexing="ij")
    idx = (X + nx * Y).ravel()
    I_all = [idx]
    J_all = [idx]
    V_all = [np.full(n, diag)]
    for (dx, dy) in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        Xn, Yn = X + dx, Y + dy
        valid = ((Xn >= 0) & (Xn < nx) & (Yn >= 0) & (Yn < nx)).ravel()
        jdx = (np.clip(Xn, 0, nx - 1) + nx * np.clip(Yn, 0, nx - 1)).ravel()
        I_all.append(idx[valid])
        J_all.append(jdx[valid])
        V_all.append(np.full(int(valid.sum()), off, dtype=np.float64))
    coo = MatrixCOO.from_arrays(np.concatenate(I_all), np.concatenate(J_all),
                                np.concatenate(V_all), n_rows=n, n_cols=n,
                                is_symmetric=True)
    return convert_coo_to_csr(coo)


def banded(n: int, bandwidth: int = 2, seed: int = 0,
           diag_boost: float = None) -> MatrixCSR:
    """Random banded matrix (matrix_band_klein analog); diagonally dominant
    by default so every solver/preconditioner is well-posed on it."""
    rng = np.random.default_rng(seed)
    I_all, J_all, V_all = [], [], []
    for off in range(-bandwidth, bandwidth + 1):
        m = n - abs(off)
        rows = np.arange(max(0, -off), max(0, -off) + m)
        cols = rows + off
        vals = rng.uniform(-1.0, 1.0, size=m)
        if off == 0:
            boost = diag_boost if diag_boost is not None else 2.0 * bandwidth + 1.0
            vals = vals + np.sign(vals + (vals == 0)) * boost
        I_all.append(rows)
        J_all.append(cols)
        V_all.append(vals)
    coo = MatrixCOO.from_arrays(np.concatenate(I_all), np.concatenate(J_all),
                                np.concatenate(V_all), n_rows=n, n_cols=n)
    return convert_coo_to_csr(coo)


def scattered_band(n: int, nnz_per_row: int = 8, spread: int = 400,
                   seed: int = 0) -> MatrixCSR:
    """Symmetric diagonally-dominant matrix with nonzeros SCATTERED at
    random offsets within ±spread of the diagonal — a genuinely non-stencil,
    non-banded general-sparsity test matrix: its distinct-diagonal count is
    ~2·spread (far past the DIA format's limit at low fill), so it exercises
    the general lane-ELL / gather SpMV paths the way an arbitrary reordered
    .mtx file would."""
    if spread >= n:
        # boundary reflection (rows - offs) must itself land in [0, n)
        raise ValueError(
            f"sband spread {spread} must be < n ({n}): boundary-reflected "
            "columns would fall outside the matrix")
    rng = np.random.default_rng(seed)
    k = max(1, nnz_per_row - 1)
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    offs = rng.integers(1, spread + 1, size=rows.size) * \
        rng.choice(np.array([-1, 1]), size=rows.size)
    cols = rows + offs
    out = (cols < 0) | (cols >= n)
    cols = np.where(out, rows - offs, cols)  # reflect at the boundary
    # (clipping instead would pile every boundary row's entries onto one
    # column and explode the ELL row width)
    vals = rng.uniform(-1.0, 1.0, size=rows.size)
    # symmetrize (A + A^T pattern) and add a dominant diagonal
    I = np.concatenate([rows, cols, np.arange(n, dtype=np.int64)])
    J = np.concatenate([cols, rows, np.arange(n, dtype=np.int64)])
    V = np.concatenate([vals, vals, np.full(n, 4.0 * nnz_per_row)])
    # duplicate (i, j) pairs (clipping collisions, symmetric overlaps) are
    # summed like Matrix Market duplicate handling.  C fast path: stable
    # LSD dedup-sum (the stable NumPy argsort below comparison-sorts ~2kn
    # int64 keys — the dominant cost at bench sizes on the throttled host;
    # summation order is identical, so both paths are bit-equal)
    if n < 2**31:
        from . import _native
        ded = _native.coo_dedup_csr(I.size, n, n, I, J, V)
        if ded is not None:
            row_ptr, col, val = ded
            return MatrixCSR(n, n, len(col), row_ptr, col, val)
    key = I * n + J
    order = np.argsort(key, kind="stable")
    key, I, J, V = key[order], I[order], J[order], V[order]
    first = np.concatenate([[True], key[1:] != key[:-1]])
    group = np.cumsum(first) - 1
    Vsum = np.zeros(int(group[-1]) + 1 if group.size else 0)
    np.add.at(Vsum, group, V)
    coo = MatrixCOO.from_arrays(I[first], J[first], Vsum,
                                n_rows=n, n_cols=n)
    return convert_coo_to_csr(coo)


def free_fermion_chain(n_sites: int, n_fermions: int, t: float = 1.0,
                       boundary: str = "open") -> MatrixCSR:
    """Free fermions hopping on a 1-D chain (SCAMAC 'FreeFermionChain'
    analog, dependency-free; the reference forwards such argstrings to the
    external SCAMAC library, /root/reference/sparse_matrix.hpp:560-735).

    H = -t Σ_i (c†_i c_{i+1} + h.c.) in the fixed-particle-number
    occupation basis (dimension C(n_sites, n_fermions), states ordered by
    ascending occupation bitmask).  Adjacent hops carry no Jordan-Wigner
    sign; the periodic wrap bond carries (-1)^(n_fermions-1).
    """
    from math import comb
    if not 0 < n_fermions <= n_sites:
        raise ValueError("need 0 < n_fermions <= n_sites")
    dim = comb(n_sites, n_fermions)
    if dim > (1 << 22):
        raise ValueError(
            f"FreeFermionChain basis dimension {dim} too large (> 2^22)")
    masks = _fermion_sector_masks(n_sites, n_fermions)
    src, tgt, amp = _chain_hop_table(masks, n_sites, n_fermions, t,
                                     boundary)
    rows_all = np.arange(dim, dtype=np.int64)
    # explicit (possibly zero) diagonal so solvers find a stored diagonal
    coo = MatrixCOO.from_arrays(
        np.concatenate([src, tgt, rows_all]),
        np.concatenate([tgt, src, rows_all]),
        np.concatenate([amp, amp, np.zeros(dim)]),
        n_rows=dim, n_cols=dim, is_symmetric=True)
    return convert_coo_to_csr(coo)


def _fermion_sector_masks(n_sites: int, n_fermions: int) -> np.ndarray:
    """Sorted occupation bitmasks of the fixed-particle-number sector."""
    import itertools
    from math import comb
    if not 0 < n_fermions <= n_sites:
        raise ValueError("need 0 < n_fermions <= n_sites")
    dim = comb(n_sites, n_fermions)
    masks = np.fromiter(
        (sum(1 << i for i in c)
         for c in itertools.combinations(range(n_sites), n_fermions)),
        dtype=np.int64, count=dim)
    masks.sort()
    return masks


def _chain_hop_table(masks: np.ndarray, n_sites: int, n_fermions: int,
                     t: float, boundary: str):
    """One-directional hop transitions (src, tgt, amp) for -t nearest-
    neighbor hopping on a 1-D chain in the sector `masks`.  Adjacent hops
    carry no Jordan-Wigner sign; the periodic wrap bond carries
    (-1)^(n_fermions-1).  Callers symmetrize (amp is real)."""
    bonds = [(i, i + 1, 1.0) for i in range(n_sites - 1)]
    if boundary == "periodic" and n_sites > 2:
        bonds.append((n_sites - 1, 0, (-1.0) ** (n_fermions - 1)))
    elif boundary not in ("open", "periodic"):
        raise ValueError(f"unknown boundary: {boundary}")
    rows_all = np.arange(masks.size, dtype=np.int64)
    src_l, tgt_l, amp_l = [], [], []
    for (i, j, sign) in bonds:
        bi, bj = np.int64(1 << i), np.int64(1 << j)
        movers = ((masks & bi) != 0) & ((masks & bj) == 0)   # hop i -> j
        src_l.append(rows_all[movers])
        tgt_l.append(np.searchsorted(masks, masks[movers] ^ (bi | bj)))
        amp_l.append(np.full(int(movers.sum()), -t * sign))
    return (np.concatenate(src_l), np.concatenate(tgt_l),
            np.concatenate(amp_l))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count of a non-negative int64 array."""
    x = x - ((x >> 1) & 0x5555555555555555)
    x = (x & 0x3333333333333333) + ((x >> 2) & 0x3333333333333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F0F0F0F0F
    return (x * 0x0101010101010101) >> 56


def hubbard(n_sites: int = 10, n_fermions: int = 5, t: float = 1.0,
            U: float = 1.0, ranpot: float = 0.0, seed: int = 1,
            boundary: str = "open") -> MatrixCSR:
    """1-D fermionic Hubbard chain (SCAMAC 'Hubbard' analog,
    dependency-free; the reference forwards such argstrings to the external
    SCAMAC library, /root/reference/sparse_matrix.hpp:560-735).

    H = -t Σ_{i,σ} (c†_{iσ} c_{i+1,σ} + h.c.) + U Σ_i n_{i↑} n_{i↓}
        + Σ_{i,σ} eps_i n_{iσ},   eps_i ~ U[-ranpot/2, ranpot/2]

    with ``n_fermions`` particles PER spin species.  Jordan-Wigner mode
    order is (up_0..up_{L-1}, down_0..down_{L-1}), so same-species adjacent
    hops are sign-free and the periodic wrap carries (-1)^(n_fermions-1)
    per species (pinned against a full-Fock-space oracle in
    tests/test_generators.py).  Basis: row = a·D_dn + b where a/b index the
    ascending-sorted up/down occupation bitmasks.
    """
    from math import comb
    dim_s = comb(n_sites, n_fermions)
    dim = dim_s * dim_s
    if dim > (1 << 22):
        raise ValueError(
            f"Hubbard basis dimension {dim} too large (> 2^22)")
    masks = _fermion_sector_masks(n_sites, n_fermions)
    src, tgt, amp = _chain_hop_table(masks, n_sites, n_fermions, t,
                                     boundary)
    D = np.int64(dim_s)
    rows_all = np.arange(dim, dtype=np.int64)
    other = np.arange(dim_s, dtype=np.int64)
    # up-spin hops act on the major index (same down config rides along);
    # down-spin hops act on the minor index
    I_up = (src[:, None] * D + other[None, :]).ravel()
    J_up = (tgt[:, None] * D + other[None, :]).ravel()
    V_up = np.broadcast_to(amp[:, None], (amp.size, dim_s)).ravel()
    I_dn = (other[:, None] * D + src[None, :]).ravel()
    J_dn = (other[:, None] * D + tgt[None, :]).ravel()
    V_dn = np.broadcast_to(amp[None, :], (dim_s, amp.size)).ravel()
    # diagonal: U · #doubly-occupied sites + random on-site potential
    # (same eps_i for both species — Anderson-Hubbard convention)
    rng = np.random.default_rng(seed)
    eps = rng.uniform(-ranpot / 2.0, ranpot / 2.0, size=n_sites)
    occ = ((masks[:, None] >> np.arange(n_sites)[None, :]) & 1)
    pot = occ.astype(np.float64) @ eps                     # (dim_s,)
    doublons = _popcount64(masks[:, None] & masks[None, :]).astype(
        np.float64)                                        # (dim_s, dim_s)
    diag = (U * doublons + pot[:, None] + pot[None, :]).ravel()
    coo = MatrixCOO.from_arrays(
        np.concatenate([I_up, J_up, I_dn, J_dn, rows_all]),
        np.concatenate([J_up, I_up, J_dn, I_dn, rows_all]),
        np.concatenate([V_up, V_up, V_dn, V_dn, diag]),
        n_rows=dim, n_cols=dim, is_symmetric=True)
    return convert_coo_to_csr(coo)


_GEN_RE = re.compile(r"^(scamac|hpcg|fdm|band|sband|anderson):(.*)$",
                     re.IGNORECASE)

#: SCAMAC model zoo implemented natively (the reference accepts arbitrary
#: model argstrings and forwards them to the external library)
SCAMAC_MODELS = ("Anderson", "FreeFermionChain", "Hubbard", "SpinChainXXZ")


def _split_scamac_spec(spec: str):
    """'Model,k=v,...' → (model_name_lower, [k=v parts]).  A bare parameter
    list (no leading model token) means Anderson, the historical default."""
    parts = [p for p in spec.split(",") if p]
    if parts and "=" not in parts[0]:
        return parts[0].strip().lower(), parts[1:]
    return "anderson", parts


def _parse_ffc_kwargs(spec: str) -> dict:
    _, parts = _split_scamac_spec(spec)
    kwargs = {}
    for p in parts:
        k, v = p.split("=", 1)
        k = k.strip()
        if k in ("n_sites", "n_fermions"):
            kwargs[k] = int(v)
        elif k == "t":
            kwargs[k] = float(v)
        elif k == "boundary":
            kwargs[k] = v.strip()
        else:
            raise ValueError(f"unknown FreeFermionChain parameter: {k}")
    return kwargs


def _parse_hubbard_kwargs(spec: str) -> dict:
    _, parts = _split_scamac_spec(spec)
    kwargs = {}
    for p in parts:
        k, v = p.split("=", 1)
        k = k.strip()
        if k in ("n_sites", "n_fermions", "seed"):
            kwargs[k] = int(v)
        elif k in ("t", "U", "ranpot"):
            kwargs[k] = float(v)
        elif k == "boundary":
            kwargs[k] = v.strip()
        else:
            raise ValueError(f"unknown Hubbard parameter: {k}")
    return kwargs


def scamac_matrix(spec: str) -> MatrixCSR:
    """Dispatch a 'scamac:<Model>,k=v,...' argstring to the native model
    implementations, erroring cleanly on unknown models (the reference
    would forward them to libscamac, sparse_matrix.hpp:560-735)."""
    model, _ = _split_scamac_spec(spec)
    if model == "anderson":
        return anderson(**_parse_anderson_kwargs(spec))
    if model == "freefermionchain":
        return free_fermion_chain(**_parse_ffc_kwargs(spec))
    if model == "hubbard":
        return hubbard(**_parse_hubbard_kwargs(spec))
    if model == "spinchainxxz":
        return spin_chain_xxz(**_parse_xxz_kwargs(spec))
    raise ValueError(
        f"unknown SCAMAC model {model!r}; supported models: "
        + ", ".join(SCAMAC_MODELS))


def spin_chain_xxz(n_sites: int = 16, n_up: int = 8, Jxy: float = 1.0,
                   Jz: float = 1.0, Bz: float = 0.0,
                   boundary: str = "open") -> MatrixCSR:
    """Spin-½ XXZ chain in the fixed-magnetization sector (SCAMAC
    'SpinChainXXZ' analog, dependency-free; the reference forwards such
    argstrings to the external SCAMAC library,
    /root/reference/sparse_matrix.hpp:560-735).

        H = (Jxy/2) Σ_bonds (S⁺_i S⁻_j + S⁻_i S⁺_j)
            + Jz Σ_bonds Sz_i Sz_j − Bz Σ_i Sz_i

    Basis: ascending occupation bitmasks with popcount ``n_up`` (an up
    spin = set bit, Sz eigenvalue = bit − ½), dimension C(n_sites, n_up).
    Spin flips on a bond carry NO fermionic sign (spin operators on
    different sites commute), so periodic chains need no wrap-sign —
    unlike `free_fermion_chain`.  Pinned against a dense Pauli-kron
    oracle in tests/test_generators.py.
    """
    from math import comb
    dim = comb(n_sites, n_up)
    if dim > (1 << 22):
        raise ValueError(
            f"SpinChainXXZ basis dimension {dim} too large (> 2^22)")
    masks = _fermion_sector_masks(n_sites, n_up)
    bonds = [(i, i + 1) for i in range(n_sites - 1)]
    if boundary == "periodic" and n_sites > 2:
        bonds.append((n_sites - 1, 0))
    elif boundary not in ("open", "periodic"):
        raise ValueError(f"unknown boundary: {boundary}")
    rows_all = np.arange(dim, dtype=np.int64)
    src_l, tgt_l = [], []
    for (i, j) in bonds:
        bi, bj = np.int64(1 << i), np.int64(1 << j)
        movers = ((masks & bi) != 0) & ((masks & bj) == 0)   # flip ↑↓ → ↓↑
        src_l.append(rows_all[movers])
        tgt_l.append(np.searchsorted(masks, masks[movers] ^ (bi | bj)))
    src = np.concatenate(src_l)
    tgt = np.concatenate(tgt_l)
    amp = np.full(src.size, Jxy / 2.0)
    # diagonal: Jz Σ_bonds (b_i−½)(b_j−½) − Bz Σ_i (b_i−½)
    occ = ((masks[:, None] >> np.arange(n_sites)[None, :]) & 1
           ).astype(np.float64) - 0.5                       # (dim, n_sites)
    diag = -Bz * occ.sum(axis=1)
    for (i, j) in bonds:
        diag = diag + Jz * occ[:, i] * occ[:, j]
    coo = MatrixCOO.from_arrays(
        np.concatenate([src, tgt, rows_all]),
        np.concatenate([tgt, src, rows_all]),
        np.concatenate([amp, amp, diag]),
        n_rows=dim, n_cols=dim, is_symmetric=True)
    return convert_coo_to_csr(coo)


def _parse_xxz_kwargs(spec: str) -> dict:
    _, parts = _split_scamac_spec(spec)
    kwargs = {}
    for p in parts:
        k, v = p.split("=", 1)
        k = k.strip()
        if k in ("n_sites", "n_up"):
            kwargs[k] = int(v)
        elif k in ("Jxy", "Jz", "Bz"):
            kwargs[k] = float(v)
        elif k == "boundary":
            kwargs[k] = v.strip()
        else:
            raise ValueError(f"unknown SpinChainXXZ parameter: {k}")
    return kwargs


def _parse_anderson_kwargs(spec: str) -> dict:
    """Parse 'Anderson,Lx=20,...,seed=3,boundary=open' into kwargs (shared
    with the device-side builder in dia.py)."""
    kwargs = {}
    for p in (p for p in spec.split(",") if p):
        if "=" not in p:
            if p.lower() != "anderson":
                raise ValueError(f"unsupported scamac generator: {p}")
            continue
        k, v = p.split("=", 1)
        k = k.strip()
        if k in ("Lx", "Ly", "Lz", "seed"):
            kwargs[k] = int(v)
        elif k in ("t", "ranpot"):
            kwargs[k] = float(v)
        elif k == "boundary":
            kwargs[k] = v.strip()
        else:
            raise ValueError(f"unknown Anderson parameter: {k}")
    return kwargs


def _grid_spec_separable(dims, max_leg: int = 1, max_colors: int = 32):
    """Separable grid ColorSpec: per-axis strides ≥ max_leg+1 that DIVIDE
    the dims (so the color-sorted permutation is a pure reshape/transpose —
    the blocked-trisolve eligibility condition).  None when the smallest
    admissible divisors give too many colors."""
    from .coloring import ColorSpec

    def stride(n):
        if n == 1:
            return 1
        for s in range(max_leg + 1, n):
            if n % s == 0:
                return s
        return n

    strides = tuple(stride(int(d)) for d in dims)
    n_colors = strides[0] * strides[1] * strides[2]
    if n_colors > max_colors:
        return None
    nx, ny, nz = (int(d) for d in dims)
    return ColorSpec("grid", n_colors, (nx, ny, nz) + strides)


def color_spec_for_source(source: str):
    """Structural ColorSpec for a generator source (None when unknown).

    Threaded into SolverConfig.color_spec by the CLI/bench: a separable
    grid/mod spec lets exact colored triangular solves run in blocked form
    (ops/block_trisolve.py).  Only sources whose row numbering this module
    controls (x-fastest grids / plain bands) get a spec; .mtx files and
    scattered patterns return None (greedy coloring applies there).
    """
    from .coloring import mod_color_spec
    m = _GEN_RE.match(source)
    if not m:
        return None
    kind, spec = m.group(1).lower(), m.group(2)
    try:
        if kind == "hpcg":
            dims = [int(d) for d in re.split(r"[x,]", spec) if d]
            nx = dims[0]
            ny = dims[1] if len(dims) > 1 else nx
            nz = dims[2] if len(dims) > 2 else nx
            return _grid_spec_separable((nx, ny, nz))
        if kind in ("scamac", "anderson"):
            kw = _parse_anderson_kwargs(spec)
            Lx = kw["Lx"]
            Ly = kw.get("Ly", Lx)
            Lz = kw.get("Lz", Lx)
            return _grid_spec_separable((Lx, Ly, Lz))
        if kind == "fdm":
            n = int(spec)
            return _grid_spec_separable((n, n, 1))
        if kind == "band":
            dims = [int(d) for d in re.split(r"[x,]", spec) if d]
            n = dims[0]
            bw = dims[1] if len(dims) > 1 else 2
            return mod_color_spec(list(range(1, bw + 1)), n)
    except (KeyError, ValueError):
        return None
    return None


def device_buildable(source: str) -> bool:
    """True when the spec has an on-device builder (dia.from_source_device /
    stencil_op.from_source_operator) — grid/band generators and the Anderson
    SCAMAC model; other SCAMAC models and .mtx files build on host."""
    from .dia import _GEN_RE as _DIA_RE
    m = _DIA_RE.match(source)
    if not m:
        return False
    kind, spec = m.group(1).lower(), m.group(2)
    if kind == "scamac":
        return _split_scamac_spec(spec)[0] == "anderson"
    return True


def from_source(source: str) -> MatrixCSR:
    """Resolve a CLI matrix source: generator spec or .mtx path.

    Replaces the reference's compile-time USE_SCAMAC switch
    (/root/reference/main.cpp:47-54) with a runtime prefix.
    """
    m = _GEN_RE.match(source)
    if not m:
        import os
        # 'name:spec' that is not a known generator and not an existing file
        # is almost certainly a typo'd generator name — say so instead of
        # failing with FileNotFoundError.
        if ":" in source and not os.path.exists(source):
            raise ValueError(f"unknown matrix generator: "
                             f"{source.split(':', 1)[0]!r} (in {source!r})")
        from .io import read_mtx
        return read_mtx(source)
    kind, spec = m.group(1).lower(), m.group(2)
    if kind == "anderson":
        return anderson(**_parse_anderson_kwargs(spec))
    if kind == "scamac":
        # e.g. "Anderson,Lx=20,Ly=20,Lz=20,t=1.0,ranpot=5.0,seed=3,boundary=open"
        return scamac_matrix(spec)
    if kind == "hpcg":
        dims = [int(d) for d in re.split(r"[x,]", spec) if d]
        return stencil_27pt(*dims)
    if kind == "sband":
        dims = [int(d) for d in re.split(r"[x,]", spec) if d]
        return scattered_band(*dims)
    if kind == "fdm":
        return fdm_2d(int(spec))
    if kind == "band":
        dims = [int(d) for d in re.split(r"[x,]", spec) if d]
        return banded(*dims)
    raise ValueError(f"unknown matrix source: {source}")
