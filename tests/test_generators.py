"""Generator-zoo tests.

The reference's SCAMAC glue forwards arbitrary model argstrings to the
external library (/root/reference/sparse_matrix.hpp:560-735); here the
models are native.  FreeFermionChain correctness is pinned against exact
free-fermion theory (many-body spectrum = sums of single-particle
energies), the strongest possible oracle for this model.
"""
import numpy as np
import pytest

from basic_iterative_solvers_tpu import generators


def _dense(A):
    d = np.zeros((A.n_rows, A.n_cols))
    for i in range(A.n_rows):
        for k in range(A.row_ptr[i], A.row_ptr[i + 1]):
            d[i, A.col[k]] = A.val[k]
    return d


def test_ffc_spectrum_open_chain():
    """Eigenvalues of the OBC free-fermion chain = all sums of n_fermions
    distinct single-particle energies eps_q = -2t cos(q*pi/(L+1))."""
    from itertools import combinations
    L, Nf, t = 6, 3, 1.3
    A = generators.free_fermion_chain(L, Nf, t=t)
    from math import comb
    assert A.n_rows == comb(L, Nf)
    H = _dense(A)
    np.testing.assert_allclose(H, H.T, atol=1e-14)
    eig = np.sort(np.linalg.eigvalsh(H))
    eps = -2.0 * t * np.cos(np.arange(1, L + 1) * np.pi / (L + 1))
    expected = np.sort([sum(c) for c in combinations(eps, Nf)])
    np.testing.assert_allclose(eig, expected, atol=1e-10)


def test_ffc_spectrum_periodic_chain():
    """PBC: eps_k = -2t cos(2*pi*k/L) — the Jordan-Wigner wrap-bond sign
    (-1)^(Nf-1) is exactly what makes the naive momenta correct for odd Nf
    (anti-periodic shift k+1/2 for even Nf)."""
    from itertools import combinations
    L, Nf, t = 6, 3, 1.0
    A = generators.free_fermion_chain(L, Nf, t=t, boundary="periodic")
    H = _dense(A)
    np.testing.assert_allclose(H, H.T, atol=1e-14)
    eig = np.sort(np.linalg.eigvalsh(H))
    ks = np.arange(L) if Nf % 2 == 1 else np.arange(L) + 0.5
    eps = -2.0 * t * np.cos(2.0 * np.pi * ks / L)
    expected = np.sort([sum(c) for c in combinations(eps, Nf)])
    np.testing.assert_allclose(eig, expected, atol=1e-10)


def test_ffc_from_source():
    A = generators.from_source(
        "scamac:FreeFermionChain,n_sites=8,n_fermions=2,t=2.0")
    from math import comb
    assert A.n_rows == comb(8, 2)
    # every off-diagonal entry is -t (adjacent OBC hops carry no sign)
    rows = np.repeat(np.arange(A.n_rows), A.row_nnz())
    off = rows != A.col
    assert np.all(A.val[off] == -2.0)


def test_ffc_param_validation():
    with pytest.raises(ValueError):
        generators.free_fermion_chain(4, 0)
    with pytest.raises(ValueError):
        generators.free_fermion_chain(4, 5)
    with pytest.raises(ValueError):
        generators.free_fermion_chain(4, 2, boundary="twisted")
    with pytest.raises(ValueError, match="parameter"):
        generators.from_source("scamac:FreeFermionChain,n_sites=4,bogus=1")


def test_scamac_unknown_model_clean_error():
    with pytest.raises(ValueError, match="supported models"):
        generators.from_source("scamac:Exciton,L=4")


# -- Hubbard ------------------------------------------------------------------

def _popcount(x):
    return bin(int(x)).count("1")


def _hubbard_fock_oracle(L, Nf, t, U, eps, boundary):
    """Dense Hubbard Hamiltonian built in the FULL 2L-mode Fock space with
    explicit Jordan-Wigner sign bookkeeping (modes 0..L-1 = up,
    L..2L-1 = down), projected onto the (Nf, Nf) sector in the generator's
    row order (up-major, ascending bitmasks).  Independent of every
    shortcut the generator takes (kron structure, precomputed wrap sign)."""
    from itertools import combinations
    up_masks = sorted(sum(1 << i for i in c)
                      for c in combinations(range(L), Nf))
    states = [a | (b << L) for a in up_masks for b in up_masks]
    index = {s: k for k, s in enumerate(states)}
    bonds = [(i, i + 1) for i in range(L - 1)]
    if boundary == "periodic" and L > 2:
        bonds.append((L - 1, 0))
    H = np.zeros((len(states), len(states)))
    for s in states:
        row = index[s]
        for i in range(L):
            n_up = (s >> i) & 1
            n_dn = (s >> (L + i)) & 1
            H[row, row] += U * n_up * n_dn + eps[i] * (n_up + n_dn)
        for (i, j) in bonds:
            for spin in (0, L):
                for (p, q) in ((i + spin, j + spin), (j + spin, i + spin)):
                    # -t * c†_p c_q |s>
                    if not ((s >> q) & 1) or ((s >> p) & 1):
                        continue
                    sign = (-1) ** _popcount(s & ((1 << q) - 1))
                    s1 = s ^ (1 << q)
                    sign *= (-1) ** _popcount(s1 & ((1 << p) - 1))
                    H[index[s1 | (1 << p)], row] += -t * sign
    return H


@pytest.mark.parametrize("boundary", ["open", "periodic"])
def test_hubbard_matches_fock_oracle(boundary):
    L, Nf, t, U, ranpot, seed = 4, 2, 0.9, 1.7, 1.3, 3
    A = generators.hubbard(L, Nf, t=t, U=U, ranpot=ranpot, seed=seed,
                           boundary=boundary)
    from math import comb
    assert A.n_rows == comb(L, Nf) ** 2
    H = _dense(A)
    np.testing.assert_allclose(H, H.T, atol=1e-14)
    eps = np.random.default_rng(seed).uniform(-ranpot / 2, ranpot / 2, L)
    H_ref = _hubbard_fock_oracle(L, Nf, t, U, eps, boundary)
    np.testing.assert_allclose(H, H_ref, atol=1e-12)


def test_hubbard_atomic_limit():
    """t = 0: H is diagonal with entries U·(#doubly occupied sites)."""
    A = generators.hubbard(4, 2, t=0.0, U=2.5)
    H = _dense(A)
    assert np.allclose(H, np.diag(np.diag(H)))
    vals = np.unique(np.diag(H))
    np.testing.assert_allclose(vals, [0.0, 2.5, 5.0])


def test_hubbard_from_source_and_validation():
    from math import comb
    A = generators.from_source(
        "scamac:Hubbard,n_sites=6,n_fermions=2,t=1.0,U=4.0,boundary=periodic")
    assert A.n_rows == comb(6, 2) ** 2
    with pytest.raises(ValueError, match="parameter"):
        generators.from_source("scamac:Hubbard,n_sites=4,bogus=1")
    with pytest.raises(ValueError, match="too large"):
        generators.hubbard(14, 7)


def test_hubbard_gmres_solve():
    """End-to-end: one full-cycle GMRES solve on a small Hubbard matrix
    (indefinite, so Krylov methods rather than CG)."""
    import basic_iterative_solvers_tpu as bis
    A = generators.hubbard(4, 2, t=1.0, U=2.0, ranpot=0.8, seed=5)
    cfg = bis.SolverConfig(method=bis.SolverType.GMRES,
                           restart_length=A.n_rows + 2,
                           tolerance=1e-10, max_iters=200,
                           dtype=np.float64)
    res = bis.solve(bis.preprocessing(A, cfg))
    assert res.converged
    x = np.asarray(res.x_star)
    np.testing.assert_allclose(
        _dense(A) @ x, np.full(A.n_rows, 1.0), atol=1e-7)


def test_scamac_anderson_still_default():
    """A bare parameter list (no model token) keeps meaning Anderson."""
    A = generators.from_source("scamac:Lx=4,Ly=4,Lz=4,ranpot=1.0,seed=3")
    B = generators.from_source(
        "scamac:Anderson,Lx=4,Ly=4,Lz=4,ranpot=1.0,seed=3")
    assert A.n_rows == B.n_rows == 64
    np.testing.assert_array_equal(A.val, B.val)


def test_device_buildable():
    assert generators.device_buildable("hpcg:8x8x8")
    assert generators.device_buildable("scamac:Anderson,Lx=4")
    assert not generators.device_buildable(
        "scamac:FreeFermionChain,n_sites=6,n_fermions=3")
    assert not generators.device_buildable("some/file.mtx")
    assert not generators.device_buildable("sband:100,4,10")


def test_sband_spread_validation():
    with pytest.raises(ValueError, match="spread"):
        generators.scattered_band(30, 4, 40)


def test_ffc_solves():
    """A (shifted) FreeFermionChain system solves end-to-end — the full
    pipeline accepts the new family."""
    import basic_iterative_solvers_tpu as bis
    A = generators.from_source(
        "scamac:FreeFermionChain,n_sites=8,n_fermions=4")
    # shift to diagonal dominance so CG applies (H itself is indefinite)
    diag_rows = np.repeat(np.arange(A.n_rows), A.row_nnz()) == A.col
    A.val[diag_rows] += 8.0
    cfg = bis.SolverConfig(method=bis.SolverType.CONJUGATE_GRADIENT,
                           dtype=np.float64, tolerance=1e-10,
                           harness="host")
    res = bis.solve(bis.preprocessing(A, cfg))
    assert res.converged
    assert res.final_residual_norm < res.stopping_criteria


def _xxz_pauli_oracle(n, Jxy, Jz, Bz, boundary):
    """Dense XXZ Hamiltonian built from explicit spin-½ operator krons in
    the full 2^n space (site i = bit i; within a site, index 1 = up).
    Independent of the generator's sector machinery."""
    sp = np.array([[0.0, 0.0], [1.0, 0.0]])        # S+ |down> = |up>
    sz = np.diag([-0.5, 0.5])
    eye = np.eye(2)

    def site_op(op, i):
        out = np.array([[1.0]])
        for k in range(n):                          # site 0 least significant
            out = np.kron(op if k == i else eye, out)
        return out

    bonds = [(i, i + 1) for i in range(n - 1)]
    if boundary == "periodic" and n > 2:
        bonds.append((n - 1, 0))
    H = np.zeros((2 ** n, 2 ** n))
    for (i, j) in bonds:
        Spi, Smi = site_op(sp, i), site_op(sp.T, i)
        Spj, Smj = site_op(sp, j), site_op(sp.T, j)
        H += (Jxy / 2.0) * (Spi @ Smj + Smi @ Spj)
        H += Jz * site_op(sz, i) @ site_op(sz, j)
    for i in range(n):
        H -= Bz * site_op(sz, i)
    return H


@pytest.mark.parametrize("boundary", ["open", "periodic"])
def test_xxz_matches_pauli_oracle(boundary):
    n, nup, Jxy, Jz, Bz = 6, 3, 1.3, 0.7, 0.4
    A = generators.spin_chain_xxz(n, nup, Jxy=Jxy, Jz=Jz, Bz=Bz,
                                  boundary=boundary)
    from math import comb
    assert A.n_rows == comb(n, nup)
    H = _dense(A)
    np.testing.assert_allclose(H, H.T, atol=1e-14)
    Hf = _xxz_pauli_oracle(n, Jxy, Jz, Bz, boundary)
    sel = [s for s in range(2 ** n) if _popcount(s) == nup]  # ascending =
    np.testing.assert_allclose(H, Hf[np.ix_(sel, sel)], atol=1e-12)


def test_xxz_from_source_and_validation():
    A = generators.from_source(
        "scamac:SpinChainXXZ,n_sites=8,n_up=4,Jxy=1.0,Jz=0.5,Bz=0.2")
    from math import comb
    assert A.n_rows == comb(8, 4)
    with pytest.raises(ValueError, match="SpinChainXXZ parameter"):
        generators.from_source("scamac:SpinChainXXZ,n_sites=8,bogus=1")
    with pytest.raises(ValueError, match="boundary"):
        generators.spin_chain_xxz(6, 3, boundary="moebius")
    with pytest.raises(ValueError, match="too large"):
        generators.spin_chain_xxz(48, 24)


@pytest.mark.slow
def test_xxz_solves():
    """XXZ sector matrix through the full pipeline (shifted to be SPD-ish
    via Bz? no — use GMRES, the matrix is symmetric indefinite)."""
    import basic_iterative_solvers_tpu as bis
    res = bis.solve_system(
        "scamac:SpinChainXXZ,n_sites=10,n_up=5,Jz=0.5,Bz=1.0", method="gm",
        restart_length=80, dtype=np.float64, tolerance=1e-8,
        harness="fused", max_iters=400)
    assert res.converged
