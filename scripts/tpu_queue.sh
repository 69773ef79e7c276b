#!/bin/bash
# TPU validation queue — run when the axon tunnel returns after an outage.
# Each step amortizes compiles through the persistent cache; results land
# in /tmp/tpu_queue/ so partial progress survives another outage.
#
#   bash scripts/tpu_queue.sh            # everything
#   bash scripts/tpu_queue.sh ab         # just the GMRES orthog A/B
#   bash scripts/tpu_queue.sh bench      # just the full bench table
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_queue
mkdir -p "$OUT"
STEP="${1:-all}"

if [ "$STEP" = "ab" ] || [ "$STEP" = "all" ]; then
  # GMRES fused-orthogonalization A/B at the benchmark shape (rl=50,
  # hpcg:128^3, bf16 basis).  If fused wins materially, flip the bench
  # default --orthog to fused and refresh README/CLAUDE notes.
  for o in lowsync fused; do
    echo "=== gmres orthog=$o ===" | tee -a "$OUT/ab.log"
    timeout 3000 python bench.py --method gmres --orthog "$o" \
      --backend-wait-mins 20 2>>"$OUT/ab.log" | tee -a "$OUT/ab.log"
    echo "=== pgmres orthog=$o ===" | tee -a "$OUT/ab.log"
    timeout 3000 python bench.py --method pgmres --orthog "$o" \
      --backend-wait-mins 5 2>>"$OUT/ab.log" | tee -a "$OUT/ab.log"
  done
fi

if [ "$STEP" = "pipe" ] || [ "$STEP" = "all" ]; then
  # Pipelined-CG single-chip overhead check (expected: slower than classic
  # on one chip — document the measured delta).
  echo "=== cg classic vs pipelined (single chip) ===" | tee -a "$OUT/pipe.log"
  timeout 3000 python bench.py --method cg --backend-wait-mins 20 \
    2>>"$OUT/pipe.log" | tee -a "$OUT/pipe.log"
  timeout 3000 python -m basic_iterative_solvers_tpu hpcg:128x128x128 -cg \
    --cg-flavor pipelined --tol 0 --max-iters 400 2>&1 \
    | grep -E "solve|iteration" | tee -a "$OUT/pipe.log"
fi

if [ "$STEP" = "mg" ] || [ "$STEP" = "all" ]; then
  # Multigrid validation: pcg row with -p mg (per-iteration V-cycle rate)
  # and the CLI convergence path at the benchmark shape.  The full bench
  # step below also emits the pcg_mg + cg_mg_refine (time-to-solution)
  # rows — this step exists to get an early read on iteration counts.
  echo "=== pcg precond=mg ===" | tee -a "$OUT/mg.log"
  timeout 3000 python bench.py --method pcg --precond mg \
    --backend-wait-mins 20 2>>"$OUT/mg.log" | tee -a "$OUT/mg.log"
  echo "=== cli cg -p mg tol 1e-8 ===" | tee -a "$OUT/mg.log"
  timeout 3000 python -m basic_iterative_solvers_tpu hpcg:128x128x128 -cg \
    -p mg --tol 1e-8 --max-iters 100 2>&1 \
    | grep -E "converged|residual|solve|total" | tee -a "$OUT/mg.log"
fi

if [ "$STEP" = "itertimes" ] || [ "$STEP" = "all" ]; then
  # Measured on-device per-iteration walls via xprof segmentation
  # (utils/xprof.py): GMRES should show its within-cycle cost growth like
  # the reference's time-per-iteration figure.
  echo "=== gmres --iter-times (xprof walls) ===" | tee -a "$OUT/itertimes.log"
  timeout 2000 python -m basic_iterative_solvers_tpu hpcg:64x64x64 -gm \
    -rl 30 -p j --tol 1e-8 --max-iters 90 --iter-times 2>&1 \
    | tail -50 | tee -a "$OUT/itertimes.log"
fi

if [ "$STEP" = "stream" ] || [ "$STEP" = "all" ]; then
  # Forced windowed-vs-ring stencil SpMV A/B at the capacity shape
  # (BIS_STENCIL_STREAM=0/1; routing is always-windowed by default after
  # the 2026-08-18 verdict — the ring lost ~3% everywhere).  Also smoke
  # the 256^3 row and re-check 128^3 is UNCHANGED (windowed path).
  for s in 0 1; do
    echo "=== cg@384 stream=$s ===" | tee -a "$OUT/stream.log"
    BIS_STENCIL_STREAM=$s timeout 3000 python bench.py --method cg \
      --matrix hpcg:384x384x384 --iters 150 --no-capacity-row \
      --no-general-row --backend-wait-mins 20 2>>"$OUT/stream.log" \
      | tee -a "$OUT/stream.log"
  done
  echo "=== cg@256 stream=auto ===" | tee -a "$OUT/stream.log"
  timeout 3000 python bench.py --method cg --matrix hpcg:256x256x256 \
    --iters 300 --no-capacity-row --no-general-row \
    --backend-wait-mins 20 2>>"$OUT/stream.log" | tee -a "$OUT/stream.log"
fi

if [ "$STEP" = "bench" ] || [ "$STEP" = "all" ]; then
  echo "=== full bench ===" | tee -a "$OUT/bench.log"
  timeout 5400 python bench.py --backend-wait-mins 20 \
    2>>"$OUT/bench.log" | tee -a "$OUT/bench.log"
fi

echo "queue done; results in $OUT"
