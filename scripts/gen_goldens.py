#!/usr/bin/env python3
"""Generate golden residual histories from the reference C++ solver.

Builds DanecLacey/basic_iterative_solvers (mounted read-only at
/root/reference) directly with g++ (its CMake needs network for CPM), runs
it single-threaded on the two in-tree fixture matrices for a battery of
method x preconditioner cases, parses the printed residual table
(postprocessing.hpp:8-30 format), and writes tests/goldens/reference_histories.json.

The parity tests (tests/test_reference_parity.py) pin this framework's
per-iteration residual histories against these goldens — the "replicate
residual-norm-per-iteration histories" north star from BASELINE.md.
"""
import json
import pathlib
import re
import subprocess
import sys
import tempfile

REF = "/root/reference"
DEFINES = ("-DMAX_ITERS=1000 -DTOL=1e-14 -DGMRES_RESTART_LEN=10 "
           "-DRES_CHECK_LEN=1 -DINIT_X_VAL=0.1 -DB_VAL=1.0 "
           "-DPRECOND_OUTER_ITERS=1 -DPRECOND_INNER_ITERS=0 "
           "-DILU0_PIVOT_TOLERANCE=1e-8 -DILU0_PIVOT_REPLACEMENT=1e-4").split()

MATRICES = {
    "fdm16": f"{REF}/data/matrices/FDM-2d-16.mtx",
    "klein": f"{REF}/data/matrices/matrix_band_klein.mtx",
}

# (case_name, matrix, method_flag, extra_args)
CASES = [
    ("fdm16_j", "fdm16", "-j", []),
    ("fdm16_gs", "fdm16", "-gs", []),
    ("fdm16_sgs", "fdm16", "-sgs", []),
    ("fdm16_cg", "fdm16", "-cg", []),
    ("fdm16_cg_j", "fdm16", "-cg", ["-p", "j"]),
    ("fdm16_cg_gs", "fdm16", "-cg", ["-p", "gs"]),
    ("fdm16_cg_sgs", "fdm16", "-cg", ["-p", "sgs"]),
    ("fdm16_cg_2st", "fdm16", "-cg", ["-p", "2st"]),
    ("fdm16_cg_s2st", "fdm16", "-cg", ["-p", "s2st"]),
    ("fdm16_bi", "fdm16", "-bi", []),
    ("fdm16_bi_j", "fdm16", "-bi", ["-p", "j"]),
    ("fdm16_bi_sgs", "fdm16", "-bi", ["-p", "sgs"]),
    ("fdm16_bi_bgs", "fdm16", "-bi", ["-p", "bgs"]),
    ("fdm16_gs_precond_cg", "fdm16", "-cg", ["-p", "gs"]),
    ("fdm16_gm_rl50", "fdm16", "-gm", ["-rl", "50"]),
    ("fdm16_gm_j_rl10", "fdm16", "-gm", ["-p", "j"]),   # ~19 restarts
    ("fdm16_gm_j_rl50", "fdm16", "-gm", ["-p", "j", "-rl", "50"]),
    ("fdm16_cg_j_scale", "fdm16", "-cg", ["-p", "j", "-scale", "1"]),
    ("klein_bi_j", "klein", "-bi", ["-p", "j"]),
    ("klein_gm_rl50", "klein", "-gm", ["-rl", "50"]),
    ("klein_gs", "klein", "-gs", []),
]

_RES_RE = re.compile(r"\|\|A\*x_(\d+) - b\|\|_2 = ([0-9.eE+-]+)")
_CONV_RE = re.compile(r"converged in: (\d+) iterations")
_NOCONV_RE = re.compile(r"did not converge after (\d+)")
_STOP_RE = re.compile(r'is: ([0-9.eE+-]+)\s*$', re.MULTILINE)


def build(tmp: pathlib.Path) -> pathlib.Path:
    exe = tmp / "ref_solver"
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fopenmp", "-std=c++17", *DEFINES,
         f"{REF}/main.cpp", f"{REF}/utilities/mmio.cpp", "-o", str(exe)],
        check=True, capture_output=True)
    return exe


def run_case(exe, matrix_path, method, extra):
    out = subprocess.run(
        [str(exe), matrix_path, method, *extra], check=True,
        capture_output=True, text=True,
        env={"OMP_NUM_THREADS": "1", "PATH": "/usr/bin:/bin"}).stdout
    norms = [float(m.group(2)) for m in _RES_RE.finditer(out)]
    conv = _CONV_RE.search(out)
    noconv = _NOCONV_RE.search(out)
    iters = int(conv.group(1)) if conv else (int(noconv.group(1))
                                             if noconv else None)
    return {"norms": norms, "converged": conv is not None,
            "iterations": iters}


def build_variant(tmp: pathlib.Path, inner: int = None,
                  outer: int = None) -> pathlib.Path:
    """Reference built with PRECOND_INNER/OUTER_ITERS overridden (CMake-time
    knobs; our framework makes them runtime config fields)."""
    exe = tmp / f"ref_solver_i{inner}_o{outer}"
    defines = list(DEFINES)
    if inner is not None:
        defines = [d if not d.startswith("-DPRECOND_INNER_ITERS")
                   else f"-DPRECOND_INNER_ITERS={inner}" for d in defines]
    if outer is not None:
        defines = [d if not d.startswith("-DPRECOND_OUTER_ITERS")
                   else f"-DPRECOND_OUTER_ITERS={outer}" for d in defines]
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fopenmp", "-std=c++17", *defines,
         f"{REF}/main.cpp", f"{REF}/utilities/mmio.cpp", "-o", str(exe)],
        check=True, capture_output=True)
    return exe


#: cases run against a PRECOND_OUTER_ITERS=2 build (precond composition)
OUTER2_CASES = [
    ("fdm16_bi_j_outer2", "fdm16", "-bi", ["-p", "j"]),
    ("fdm16_bi_sgs_outer2", "fdm16", "-bi", ["-p", "sgs"]),
]

#: cases run against the PRECOND_INNER_ITERS=2 build (Richardson sweeps)
INNER2_CASES = [
    ("fdm16_cg_2st_inner2", "fdm16", "-cg", ["-p", "2st"]),
    ("fdm16_cg_s2st_inner2", "fdm16", "-cg", ["-p", "s2st"]),
    ("fdm16_bi_s2st_inner2", "fdm16", "-bi", ["-p", "s2st"]),
]


#: Anderson-model cases: the reference's own generator needs the external
#: SCAMAC library (unavailable offline), so OUR generator writes the matrix
#: to .mtx and the reference binary consumes the file — validating the
#: generator and the solve together.
ANDERSON_SPEC = "scamac:Anderson,Lx=10,Ly=10,Lz=10,ranpot=6.0,seed=3"
ANDERSON_CASES = [
    ("anderson_cg_j", "-cg", ["-p", "j"]),
    ("anderson_bi_j", "-bi", ["-p", "j"]),
    ("anderson_gs", "-gs", []),
]


def main():
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="refgold_"))
    exe = build(tmp)
    goldens = {"_defaults": {"tol": 1e-14, "max_iters": 1000,
                             "init_x_val": 0.1, "b_val": 1.0,
                             "res_check_len": 1}}
    for name, mkey, method, extra in CASES:
        r = run_case(exe, MATRICES[mkey], method, extra)
        r["matrix"] = MATRICES[mkey]
        r["method"] = method
        r["extra"] = extra
        goldens[name] = r
        print(f"{name}: {len(r['norms'])} samples, converged={r['converged']} "
              f"in {r['iterations']}", file=sys.stderr)
    exe3 = build_variant(tmp, outer=2)
    for name, mkey, method, extra in OUTER2_CASES:
        r = run_case(exe3, MATRICES[mkey], method, extra)
        r["matrix"] = MATRICES[mkey]
        r["method"] = method
        r["extra"] = extra
        r["precond_outer_iters"] = 2
        goldens[name] = r
        print(f"{name}: {len(r['norms'])} samples, converged={r['converged']} "
              f"in {r['iterations']}", file=sys.stderr)
    exe2 = build_variant(tmp, inner=2)
    for name, mkey, method, extra in INNER2_CASES:
        r = run_case(exe2, MATRICES[mkey], method, extra)
        r["matrix"] = MATRICES[mkey]
        r["method"] = method
        r["extra"] = extra
        r["precond_inner_iters"] = 2
        goldens[name] = r
        print(f"{name}: {len(r['norms'])} samples, converged={r['converged']} "
              f"in {r['iterations']}", file=sys.stderr)
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from basic_iterative_solvers_tpu import generators, write_mtx
    mtx = tmp / "anderson.mtx"
    write_mtx(str(mtx), generators.from_source(ANDERSON_SPEC))
    for name, method, extra in ANDERSON_CASES:
        r = run_case(exe, str(mtx), method, extra)
        r["matrix"] = ANDERSON_SPEC     # parity test regenerates, not reads
        r["method"] = method
        r["extra"] = extra
        goldens[name] = r
        print(f"{name}: {len(r['norms'])} samples, converged={r['converged']} "
              f"in {r['iterations']}", file=sys.stderr)

    out = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
    out.mkdir(parents=True, exist_ok=True)
    (out / "reference_histories.json").write_text(
        json.dumps(goldens, indent=1))
    print(f"wrote {out / 'reference_histories.json'}", file=sys.stderr)


if __name__ == "__main__":
    main()
