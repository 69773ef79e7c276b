#!/bin/bash
# TPU validation queue — run when the axon tunnel returns after an outage.
# Each step amortizes compiles through the persistent cache and SKIPS
# ITSELF once its success marker is in its log, so the watcher can re-run
# the whole queue after every tunnel flap and only missing steps execute.
#
#   bash scripts/tpu_queue.sh            # everything (round-4 pending set)
#   bash scripts/tpu_queue.sh mega|gs|mg|psolvers|itertimes|bench
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_queue
mkdir -p "$OUT"
STEP="${1:-all}"

want() { [ "$STEP" = "$1" ] || [ "$STEP" = "all" ]; }
have() { [ -f "$OUT/$2" ] && grep -q "$1" "$OUT/$2"; }

if want mega; then
  # Mega-kernel A/B: single-call VMEM-resident const trisolve vs the
  # per-level calls.  Runs FIRST — validates Mosaic accepts the
  # lax.switch + VMEM-scratch form on real hardware; if the mega row
  # fails, flip the BIS_SB_MEGA default to 0 before the full table.
  if ! have 'MEGA0_OK' mega.log; then
    echo "=== pcg BIS_SB_MEGA=0 ===" | tee -a "$OUT/mega.log"
    BIS_SB_MEGA=0 timeout 2400 python bench.py --method pcg \
      --backend-wait-mins 10 2>>"$OUT/mega.log" | tee -a "$OUT/mega.log" \
      && echo MEGA0_OK >> "$OUT/mega.log"
  fi
  if ! have 'MEGA1_OK' mega.log; then
    echo "=== pcg BIS_SB_MEGA=1 ===" | tee -a "$OUT/mega.log"
    BIS_SB_MEGA=1 timeout 2400 python bench.py --method pcg \
      --backend-wait-mins 10 2>>"$OUT/mega.log" | tee -a "$OUT/mega.log" \
      && echo MEGA1_OK >> "$OUT/mega.log"
  fi
fi

if want gs && ! have 'gs_ms_per_iter' gs.log; then
  # Forward-GS method through the const-mode blocked trisolve (sgs and
  # pcg already measured: 0.450 ms/iter each, 2026-08-19).
  echo "=== gs (blocked residual form) ===" | tee -a "$OUT/gs.log"
  timeout 2400 python bench.py --method gs --backend-wait-mins 10 \
    2>>"$OUT/gs.log" | tee -a "$OUT/gs.log"
fi

if want mg; then
  # Multigrid after the tensor-product (MXU) transfer rebuild + the
  # breakdown_stall guard: rate row must NOT be NaN-tainted and should
  # drop well below the 4.68 ms/iter of BENCH_r03 (target <= 2.5).
  if ! have 'pcg_mg_ms_per_iter\|pcg_ms_per_iter' mg.log; then
    echo "=== pcg precond=mg (MXU transfers, stall guard) ===" \
      | tee -a "$OUT/mg.log"
    timeout 2400 python bench.py --method pcg --precond mg \
      --backend-wait-mins 10 2>>"$OUT/mg.log" | tee -a "$OUT/mg.log"
  fi
  if ! have 'converged' mg.log; then
    echo "=== cli cg -p mg tol 1e-8 (iteration count sanity) ===" \
      | tee -a "$OUT/mg.log"
    timeout 2400 python -m basic_iterative_solvers_tpu hpcg:128x128x128 \
      -cg -p mg --tol 1e-8 --max-iters 100 2>&1 \
      | grep -E "converged|residual|solve|total" | tee -a "$OUT/mg.log"
  fi
fi

if want psolvers; then
  # pgmres / pbicgstab with the const-mode SGS apply (analytic device
  # route): r03 readings were 0.979 (fused orthog) and 1.302.
  if ! have 'pgmres_ms_per_iter' psolvers.log; then
    echo "=== pgmres (const SGS) ===" | tee -a "$OUT/psolvers.log"
    timeout 2400 python bench.py --method pgmres --backend-wait-mins 10 \
      2>>"$OUT/psolvers.log" | tee -a "$OUT/psolvers.log"
  fi
  if ! have 'pbicgstab_ms_per_iter' psolvers.log; then
    echo "=== pbicgstab (const SGS) ===" | tee -a "$OUT/psolvers.log"
    timeout 2400 python bench.py --method pbicgstab --backend-wait-mins 5 \
      2>>"$OUT/psolvers.log" | tee -a "$OUT/psolvers.log"
  fi
fi

if want itertimes && ! have 'ITERTIMES_DONE' itertimes.log; then
  # Measured on-device per-iteration walls via xprof segmentation of the
  # FUSED loop (utils/xprof.py).  VERDICT r3 item 5: the r3 reading was
  # 18.2 ms/iter vs 0.82 steady state (20x distortion) — diagnose whether
  # profiling the axon device inflates per-op walls, and by how much.
  echo "=== gmres --iter-times (xprof walls) ===" | tee -a "$OUT/itertimes.log"
  timeout 2000 python -m basic_iterative_solvers_tpu hpcg:64x64x64 -gm \
    -rl 30 -p j --tol 1e-8 --max-iters 90 --iter-times 2>&1 \
    | tail -40 | tee -a "$OUT/itertimes.log" \
    && echo ITERTIMES_DONE >> "$OUT/itertimes.log"
fi

if want bench && ! have '"metric": "bench_table"\|"metric":"bench_table"' bench.log; then
  echo "=== full bench table ===" | tee -a "$OUT/bench.log"
  timeout 9000 python bench.py --backend-wait-mins 10 \
    2>>"$OUT/bench.log" | tee -a "$OUT/bench.log"
fi
