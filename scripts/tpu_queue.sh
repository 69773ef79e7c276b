#!/bin/bash
# TPU validation queue — run when the axon tunnel returns after an outage.
# Each step amortizes compiles through the persistent cache; results land
# in /tmp/tpu_queue/ so partial progress survives another outage.
#
#   bash scripts/tpu_queue.sh            # everything (round-4 pending set)
#   bash scripts/tpu_queue.sh gs         # just the blocked-GS method rows
#   bash scripts/tpu_queue.sh mg         # just the multigrid rows
#   bash scripts/tpu_queue.sh psolvers   # pgmres/pbicgstab (const-SGS M)
#   bash scripts/tpu_queue.sh itertimes  # xprof per-iteration walls check
#   bash scripts/tpu_queue.sh bench      # the full headline table
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_queue
mkdir -p "$OUT"
STEP="${1:-all}"

if [ "$STEP" = "mega" ] || [ "$STEP" = "all" ]; then
  # Mega-kernel A/B: single-call VMEM-resident const trisolve vs the
  # per-level calls.  THIS RUNS FIRST — it validates that Mosaic accepts
  # the lax.switch + VMEM-scratch form on real hardware; if the mega rows
  # fail, flip the BIS_SB_MEGA default to 0 before the full table.
  for m in 0 1; do
    echo "=== pcg BIS_SB_MEGA=$m ===" | tee -a "$OUT/mega.log"
    BIS_SB_MEGA=$m timeout 3000 python bench.py --method pcg \
      --backend-wait-mins 20 2>>"$OUT/mega.log" | tee -a "$OUT/mega.log"
  done
fi

if [ "$STEP" = "gs" ] || [ "$STEP" = "all" ]; then
  # Forward-GS method through the const-mode blocked trisolve (sgs and
  # pcg already measured: 0.450 ms/iter each, 2026-08-19).
  echo "=== gs (blocked residual form) ===" | tee -a "$OUT/gs.log"
  timeout 3000 python bench.py --method gs --backend-wait-mins 20 \
    2>>"$OUT/gs.log" | tee -a "$OUT/gs.log"
fi

if [ "$STEP" = "mg" ] || [ "$STEP" = "all" ]; then
  # Multigrid after the tensor-product (MXU) transfer rebuild + the
  # breakdown_stall guard: rate row must NOT be NaN-tainted and should
  # drop well below the 4.68 ms/iter of BENCH_r03 (target <= 2.5).
  echo "=== pcg precond=mg (MXU transfers, stall guard) ===" \
    | tee -a "$OUT/mg.log"
  timeout 3000 python bench.py --method pcg --precond mg \
    --backend-wait-mins 20 2>>"$OUT/mg.log" | tee -a "$OUT/mg.log"
  echo "=== cli cg -p mg tol 1e-8 (iteration count sanity) ===" \
    | tee -a "$OUT/mg.log"
  timeout 3000 python -m basic_iterative_solvers_tpu hpcg:128x128x128 -cg \
    -p mg --tol 1e-8 --max-iters 100 2>&1 \
    | grep -E "converged|residual|solve|total" | tee -a "$OUT/mg.log"
fi

if [ "$STEP" = "psolvers" ] || [ "$STEP" = "all" ]; then
  # pgmres / pbicgstab with the const-mode SGS apply (analytic device
  # route): r03 readings were 0.979 (fused orthog) and 1.302.
  echo "=== pgmres (const SGS) ===" | tee -a "$OUT/psolvers.log"
  timeout 3000 python bench.py --method pgmres --backend-wait-mins 20 \
    2>>"$OUT/psolvers.log" | tee -a "$OUT/psolvers.log"
  echo "=== pbicgstab (const SGS) ===" | tee -a "$OUT/psolvers.log"
  timeout 3000 python bench.py --method pbicgstab --backend-wait-mins 5 \
    2>>"$OUT/psolvers.log" | tee -a "$OUT/psolvers.log"
fi

if [ "$STEP" = "itertimes" ] || [ "$STEP" = "all" ]; then
  # Measured on-device per-iteration walls via xprof segmentation of the
  # FUSED loop (utils/xprof.py).  VERDICT r3 item 5: the r3 reading was
  # 18.2 ms/iter vs 0.82 steady state (20x distortion) — diagnose whether
  # profiling the axon device inflates per-op walls, and how much.
  echo "=== gmres --iter-times (xprof walls) ===" | tee -a "$OUT/itertimes.log"
  timeout 2000 python -m basic_iterative_solvers_tpu hpcg:64x64x64 -gm \
    -rl 30 -p j --tol 1e-8 --max-iters 90 --iter-times 2>&1 \
    | grep -E "iter|time|ms" | tail -30 | tee -a "$OUT/itertimes.log"
fi

if [ "$STEP" = "bench" ] || [ "$STEP" = "all" ]; then
  echo "=== full bench table ===" | tee -a "$OUT/bench.log"
  timeout 9000 python bench.py --backend-wait-mins 20 \
    2>>"$OUT/bench.log" | tee -a "$OUT/bench.log"
fi
