#!/bin/bash
# Poll the axon tunnel; when it answers, run the TPU validation queue.
# Runs inside tmux so it survives the session's tool timeouts.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_queue
mkdir -p "$OUT"
while true; do
  date -u +"%F %T probe" >> "$OUT/watch.log"
  if timeout 300 python - <<'PY' >> "$OUT/watch.log" 2>&1
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((256, 256))
print("alive", float((x @ x)[0, 0]))
PY
  then
    date -u +"%F %T TPU UP — running queue" >> "$OUT/watch.log"
    bash scripts/tpu_queue.sh all >> "$OUT/watch.log" 2>&1
    date -u +"%F %T queue finished" >> "$OUT/watch.log"
    break
  fi
  sleep 240
done
