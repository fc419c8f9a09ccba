#!/bin/bash
# Wait for the TPU to be healthy, then run the given command once.
# Usage: bench/tpu_run.sh <cmd...>
cd /root/repo
for i in $(seq 1 30); do
  if timeout 60 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,128)).sum()))" >/dev/null 2>&1; then
    echo "[tpu_run] healthy after $i probe(s)"
    break
  fi
  sleep 20
done
exec "$@"
