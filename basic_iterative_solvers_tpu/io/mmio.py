"""Matrix Market I/O.

Re-implementation (from behavior, not code) of the reference's bundled NIST
mmio reader + MatrixCOO::read_from_mtx
(/root/reference/utilities/mmio.cpp:1-442,
 /root/reference/sparse_matrix.hpp:225-357) with identical semantics:

* only ``matrix coordinate {real|integer|pattern} {general|symmetric}``
  accepted (sparse, square for the solver path);
* pattern matrices get all values set to 0.01
  (/root/reference/utilities/mmio.hpp:178-181);
* symmetric storage is expanded to general by mirroring off-diagonal
  entries (/root/reference/sparse_matrix.hpp:306-322);
* 1-based indices converted to 0-based;
* entries are sorted row-major.

The hot parsing loop uses np.loadtxt-style vectorized parsing rather than a
per-line scanf loop; a C++ fast path lives in csrc/ (the analog of the
reference's optional fast_matrix_market backend).
"""
from __future__ import annotations

import io as _io
import numpy as np

from ..matrix import MatrixCOO, convert_coo_to_csr, MatrixCSR, csr_to_coo

_SUPPORTED_FIELDS = ("real", "integer", "pattern")
_SUPPORTED_SYMMETRIES = ("general", "symmetric")
_PATTERN_VALUE = 0.01


class MatrixMarketError(ValueError):
    pass


def _parse_banner(line: str):
    parts = line.strip().split()
    if len(parts) != 5 or parts[0] != "%%MatrixMarket":
        raise MatrixMarketError(f"Could not process Matrix Market banner: {line!r}")
    _, obj, fmt, field, symmetry = (p.lower() for p in parts)
    if obj != "matrix" or fmt != "coordinate":
        raise MatrixMarketError(
            f"Unsupported matrix format (object={obj}, format={fmt}); "
            "only sparse 'matrix coordinate' files are supported")
    if field not in _SUPPORTED_FIELDS:
        raise MatrixMarketError(f"Unsupported field type: {field}")
    if symmetry not in _SUPPORTED_SYMMETRIES:
        raise MatrixMarketError(f"Unsupported symmetry: {symmetry}")
    return field, symmetry


def read_mtx_coo(path_or_file, require_square: bool = False) -> MatrixCOO:
    """Read a Matrix Market coordinate file into (sorted) COO."""
    if hasattr(path_or_file, "read"):
        text = path_or_file.read()
        if isinstance(text, bytes):
            text = text.decode()
    else:
        with open(path_or_file, "r") as f:
            text = f.read()

    # Banner is the first line; comments start with '%'.
    nl = text.find("\n")
    if nl < 0:
        raise MatrixMarketError("empty file")
    field, symmetry = _parse_banner(text[:nl])
    body = text[nl + 1:]

    # Strip comment lines, find the size line.
    lines_iter = _io.StringIO(body)
    size_line = None
    data_start = nl + 1
    for line in lines_iter:
        stripped = line.strip()
        data_start += len(line)
        if not stripped or stripped.startswith("%"):
            continue
        size_line = stripped
        break
    if size_line is None:
        raise MatrixMarketError("missing size line")
    sizes = size_line.split()
    if len(sizes) != 3:
        raise MatrixMarketError(f"bad size line: {size_line!r}")
    n_rows, n_cols, nnz_stored = (int(s) for s in sizes)
    if require_square and n_rows != n_cols:
        raise MatrixMarketError("Matrix must be square.")

    data_text = text[data_start:]
    from .. import _native
    parsed = None
    if nnz_stored and _native.available():
        try:
            parsed = _native.parse_triplets(data_text, nnz_stored,
                                            with_value=(field != "pattern"),
                                            pattern_value=_PATTERN_VALUE)
        except ValueError as e:
            raise MatrixMarketError(str(e))
    if parsed is not None:
        I = parsed[0].astype(np.int64)
        J = parsed[1].astype(np.int64)
        V = parsed[2]
    elif field == "pattern":
        arr = np.loadtxt(_io.StringIO(data_text), dtype=np.int64, ndmin=2,
                         comments="%") if nnz_stored else np.zeros((0, 2), np.int64)
        if arr.size and arr.shape[1] != 2:
            raise MatrixMarketError("pattern entries must have 2 fields")
        I = arr[:, 0].astype(np.int64) - 1
        J = arr[:, 1].astype(np.int64) - 1
        V = np.full(arr.shape[0], _PATTERN_VALUE, dtype=np.float64)
    else:
        arr = np.loadtxt(_io.StringIO(data_text), dtype=np.float64, ndmin=2,
                         comments="%") if nnz_stored else np.zeros((0, 3))
        if arr.size and arr.shape[1] != 3:
            raise MatrixMarketError("coordinate entries must have 3 fields")
        I = arr[:, 0].astype(np.int64) - 1
        J = arr[:, 1].astype(np.int64) - 1
        V = arr[:, 2].astype(np.float64)
    if I.shape[0] != nnz_stored:
        raise MatrixMarketError(
            f"expected {nnz_stored} entries, found {I.shape[0]}")

    if symmetry == "symmetric":
        off = I != J
        I = np.concatenate([I, J[off]])
        J = np.concatenate([J, I[: nnz_stored][off]])
        V = np.concatenate([V, V[: nnz_stored][off]])

    coo = MatrixCOO.from_arrays(I, J, V, n_rows=n_rows, n_cols=n_cols,
                                is_symmetric=(symmetry == "symmetric"))
    return coo.sort()


def read_mtx(path_or_file, require_square: bool = True) -> MatrixCSR:
    """Read a .mtx file straight to CSR (the reference's read→convert
    pipeline, /root/reference/main.cpp:47-58)."""
    return convert_coo_to_csr(read_mtx_coo(path_or_file, require_square))


def write_mtx(path, mat, comment: str = "") -> None:
    """Write CSR/COO as 'matrix coordinate real general', mirroring
    MatrixCOO::write_to_mtx (/root/reference/sparse_matrix.hpp:204-223).
    Vectorized via np.savetxt (no per-entry Python loop)."""
    coo = csr_to_coo(mat) if isinstance(mat, MatrixCSR) else mat.sort()
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        if comment:
            for line in comment.splitlines():
                f.write(f"% {line}\n")
        f.write(f"{coo.n_rows} {coo.n_cols} {coo.nnz}\n")
        np.savetxt(f, np.column_stack([coo.I + 1, coo.J + 1, coo.values]),
                   fmt=("%d", "%d", "%.17g"))
