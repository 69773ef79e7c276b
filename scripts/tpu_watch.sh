#!/bin/bash
# Poll the axon tunnel; whenever it answers, (re)run the TPU validation
# queue.  Queue steps self-skip once their success marker is logged, so
# tunnel flaps mid-queue just mean another lap.  Stops when the full
# bench table has landed (or /tmp/tpu_queue/STOP exists).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_queue
mkdir -p "$OUT"
while true; do
  [ -f "$OUT/STOP" ] && { date -u +"%F %T STOP file — exiting" >> "$OUT/watch.log"; break; }
  if grep -q '"metric": *"bench_table"' "$OUT/bench.log" 2>/dev/null; then
    date -u +"%F %T bench table complete — exiting" >> "$OUT/watch.log"
    break
  fi
  date -u +"%F %T probe" >> "$OUT/watch.log"
  if timeout -k 30 300 python - <<'PY' >> "$OUT/watch.log" 2>&1
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((256, 256))
print("alive", float((x @ x)[0, 0]))
PY
  then
    date -u +"%F %T TPU UP — running queue" >> "$OUT/watch.log"
    bash scripts/tpu_queue.sh all >> "$OUT/watch.log" 2>&1
    date -u +"%F %T queue lap finished" >> "$OUT/watch.log"
  fi
  sleep 240
done
